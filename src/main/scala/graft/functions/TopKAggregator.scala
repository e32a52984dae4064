package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (§2.13 surface): per-group top-k by score with a
  * bounded buffer — the partial-aggregation alternative to
  * `row_number().over(window)` when groups are huge: each map task keeps
  * at most k rows per group, so the shuffle carries k·groups rows instead
  * of the full table, and no per-partition sort of all rows happens.
  *
  * Ordering: score desc, then id asc (deterministic ties).
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)
  case class Buf(items: Seq[Scored])

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {
      private def trim(s: Seq[Scored]): Seq[Scored] =
        s.sortBy(x => (-x.score, x.id)).take(k)
      override def zero: Buf = Buf(Nil)
      override def reduce(b: Buf, a: Scored): Buf = Buf(trim(b.items :+ a))
      override def merge(x: Buf, y: Buf): Buf = Buf(trim(x.items ++ y.items))
      override def finish(r: Buf): Seq[Scored] = r.items
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
