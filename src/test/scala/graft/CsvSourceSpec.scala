package graft

import graft.sources.CsvSource
import java.nio.file.Files

/** CSV scan semantics from the reference (SURVEY.md §2.1 S1/S2, §5.3):
  * inferSchema typing, ragged all-string reads, and junk→null casting.
  */
class CsvSourceSpec extends SparkSpecBase {

  private def writeCsv(lines: String*): String = {
    val f = Files.createTempFile("graft", ".csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("inferred read types clean numeric columns, junk forces string") {
    val p = writeCsv("age,name", "18,ann", "25,bob")
    val df = CsvSource.inferred(spark, p)
    assert(df.schema("age").dataType.typeName == "integer")

    val dirty = writeCsv("age,name", "18,ann", "*x#,bob")
    val df2 = CsvSource.inferred(spark, dirty)
    assert(df2.schema("age").dataType.typeName == "string") // junk ⇒ string col
  }

  test("castDirtyToDouble nulls junk like the reference's cast, na.drop removes") {
    val p = writeCsv("age,bmi", "18,20.5", "*x#,21.0", "30,NULL", "40,22.1")
    val cleaned = CsvSource.castDirtyToDouble(
      CsvSource.inferred(spark, p), Seq("age", "bmi")).na.drop()
    // rows 2 (junk age) and 3 (NULL bmi) dropped → 2 survivors
    assert(cleaned.count() == 2)
  }

  test("allString read keeps everything string; ragged header gets _cN cols") {
    val p = writeCsv("v1,v2,,,", "ham,hello there,,,", "spam,win money,,,")
    val df = CsvSource.allString(spark, p)
    assert(df.columns.toSeq == Seq("v1", "v2", "_c2", "_c3", "_c4"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.select("v1", "v2").count() == 2)
  }
}
