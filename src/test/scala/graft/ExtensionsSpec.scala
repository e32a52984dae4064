package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wires the native expressions into a
  * SparkSessionExtensions instance without error; the live-SQL
  * resolution check runs in graft.Smoke's own JVM (EXT_COSINE_OK) —
  * building a second extension-bearing session inside the shared test
  * JVM would race the suite-wide singleton.
  */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions applies its injections cleanly") {
    val ext = new SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }
}
