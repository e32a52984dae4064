package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over plain `array<float>` columns (the oracle-
  * checkable analog of MLlib's VectorUDT layer — SURVEY.md §1.4 design rule).
  *
  * Everything is a sequential left fold (`aggregate`), which matches
  * DuckDB's `list_sum` evaluation order, so doubles are bit-identical on
  * both sides of the oracle compare. Stays in codegen — no UDFs.
  */
object VectorOps {

  /** Dot product with explicit float→double widening per element. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, v) => s + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** L1 norm — also the denominator for the reference's Normalizer(p=1)
    * (reference: TfIdfCalculator.java:120-124).
    */
  def l1norm(a: Column): Column =
    aggregate(a, lit(0.0), (s, v) => s + abs(v.cast("double")))

  def cosine(a: Column, aNorm: Column, b: Column, bNorm: Column): Column =
    dot(a, b) / (aNorm * bNorm)

  /** Sign-random-projection LSH bucket using the first `bits` axis-aligned
    * hyperplanes: bit i set when component i is positive. The scale path
    * for ANN — an equi-join on this bucket replaces the O(n²) cross join.
    */
  def srpBucket(a: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(a, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
}
