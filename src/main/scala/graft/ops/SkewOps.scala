package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation. AQE handles skewed
  * JOINS automatically in Spark 4; skewed AGGREGATION keys still benefit
  * from manual salting when a handful of keys dominate (the partial agg
  * spreads each hot key over `salts` reducers before the tiny final agg).
  * Results are identical to the direct aggregation — the oracle for the
  * salted query is plain SQL.
  */
object SkewOps {

  /** groupBy(key).agg(sum(value), count(*)) executed as salt-partial →
    * final. The salt is derived from a unique column so it is
    * deterministic (no rand()).
    */
  def saltedSumCount(
      df: DataFrame, key: Seq[String], saltSource: Column,
      valueCol: String, salts: Int): DataFrame = {
    val keyed = df.withColumn("salt", pmod(hash(saltSource), lit(salts)))
    val partial = keyed
      .groupBy((key.map(col) :+ col("salt")): _*)
      .agg(sum(col(valueCol)).as("ps"), count(lit(1)).as("pc"))
    partial
      .groupBy(key.map(col): _*)
      .agg(sum(col("ps")).as("total"), sum(col("pc")).cast("long").as("cnt"))
  }

  /** Salted replicated join: the manual skew-join pattern for when a few
    * hot fact keys would overwhelm one reducer. The fact side gets a
    * deterministic salt from a unique column; the (small) build side is
    * replicated once per salt; the join key becomes (key, salt), so a hot
    * key's rows spread over `salts` tasks. Result set is identical to the
    * plain join — the oracle is unsalted SQL.
    */
  def saltedJoin(
      fact: DataFrame, build: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
