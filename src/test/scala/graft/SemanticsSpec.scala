package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the reference-semantics corner cases from SURVEY.md §7.3's risk
  * register: StringIndexer tie order, Bucketizer boundary inclusivity,
  * and session-window gap boundaries.
  */
class SemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Writes a documents-shaped parquet dir so the registered queries can
    * run against literal fixtures.
    */
  private def docsDir(rows: (Long, String, String)*): String = {
    val dir = Files.createTempDirectory("sem").toString
    rows.map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q25 string indexer: frequency desc, ties broken by label asc (A8)") {
    // freq: b:2, c:2, a:1 → idx: b=0 (tie b<c), c=1, a=2
    val d = docsDir((1, "x", "b"), (2, "x", "b"), (3, "x", "c"), (4, "x", "c"), (5, "x", "a"))
    val got = SparkEntry.queries("q25_string_indexer")(spark, d)
      .select("lang", "idx").as[(String, Long)].collect().toSeq
    assert(got == Seq(("b", 0L), ("c", 1L), ("a", 2L)))
  }

  test("bucketize ladder is left-closed: boundary value falls in the UPPER bucket") {
    // q32's ladder: bucket 2 = [2500, 5000)
    val rows = Seq(2499.99, 2500.0, 4999.99, 5000.0).toDF("c_acctbal")
    val got = rows.withColumn("b",
        when(col("c_acctbal") < 0, 0L).when(col("c_acctbal") < 2500, 1L)
          .when(col("c_acctbal") < 5000, 2L).when(col("c_acctbal") < 7500, 3L)
          .otherwise(4L))
      .select("b").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 2L, 3L))
  }

  test("session window: events exactly gap-apart MERGE (inclusive window end)") {
    import graft.streaming.EventStream.Event
    import java.sql.Timestamp
    def ev(min: Int, sec: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val df = Seq(
      Event(1, ev(0), 1, 1.0),
      Event(2, ev(30), 1, 1.0),       // exactly 30:00 later → merges
      Event(3, ev(59), 1, 1.0),       // 29:00 later → merges
      Event(4, ev(30), 2, 1.0),
      Event(5, ev(0), 3, 1.0), Event(6, ev(30, 1), 3, 1.0)) // 30:01 → new
      .toDF()
    val n = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    assert(n == 4) // user1: one session; user2: one; user3: two
  }

  test("q33 exact dedup on a fixture with real duplicates") {
    val d = docsDir((10, "same text", "en"), (11, "same text", "en"), (12, "other", "en"))
    val got = SparkEntry.queries("q33_dedup_exact")(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L), (12L, 1L)))
  }

  test("q34 minhash flags near-identical docs on a fixture") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 28).map(i => s"w$i") ++ Seq("x", "y")).mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val d = docsDir((1, base, "en"), (2, nearDup, "en"), (3, other, "en"))
    val pairs = SparkEntry.queries("q34_minhash_pairs")(spark, d)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("Observation collects pipeline metrics in the SAME pass as the action") {
    // the pipeline-health idiom for 100-TB jobs: row counts and
    // validation sums ride along the real query as accumulator-backed
    // observed metrics — no second scan, unlike a separate .agg() pass
    val obs = org.apache.spark.sql.Observation("gate")
    val out = spark.range(1000)
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(when(col("id") % 100 === 0, 1).otherwise(0)).as("centuries"))
      .where(col("id") % 2 === 0)
    assert(out.count() == 500)
    val m = obs.get
    // observed BEFORE the filter: metrics see every scanned row
    assert(m("rows_seen") == 1000L && m("centuries") == 10L, s"got $m")
  }

  test("q197 PSI alarms on fully disjoint norm bins (smoothing regression)") {
    // base vectors (vec_id 0-7, one norm bin) and delta vectors (8-9, a
    // FAR bin): zero shared bins. The pre-fix inner-join PSI returned
    // n_bins=0 / psi NULL here — silence at maximum drift; the smoothed
    // version must report both bins, both one-sided, and a LARGE psi.
    val dir = Files.createTempDirectory("psi").toString
    def vec(scale: Float): Seq[Float] = Seq.fill(4)(scale)
    ((0L to 7L).map(i => (i, vec(0.5f), 0)) ++
      Seq((8L, vec(4.5f), 1), (9L, vec(4.5f), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val row = SparkEntry.queries("q197_embedding_drift")(spark, dir).head()
    val (nBins, oneSided) = (row.getLong(0), row.getLong(1))
    val psi = row.getDouble(4)
    assert(nBins == 2 && oneSided == 2, s"bins=$nBins oneSided=$oneSided")
    assert(!psi.isNaN && psi > 1.0, s"psi=$psi must alarm loudly on disjoint bins")
  }

  test("q192 confidence quantizes by floor at an exact grid boundary") {
    // 320 orders all contain brand A; 10 of them also brand B →
    // conf(B→A appears as pair(A,B)/supp(A)) = 10/320 = 0.03125 EXACTLY.
    // floor bp must give 312 (round's half-up would give 313 — the
    // engine-specific tie the q144/q180 rule exists to avoid).
    val dir = Files.createTempDirectory("basket").toString
    Seq((1L, "Brand#A"), (2L, "Brand#B")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val li = (1L to 320L).map(ok => (ok, 1L)) ++ (1L to 10L).map(ok => (ok, 2L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q192_brand_basket")(spark, dir)
      .select("ba", "bb", "supp", "conf_bp", "lift_pm")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // conf_bp = floor(10 * 10000 / 320) = 312; lift = 10*320/(320*10) = 1
    assert(out == Seq(("Brand#A", "Brand#B", 10L, 312L, 1000L)), s"got $out")
  }
}
