package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a broadcast filter: the
  * executor-side `mightContainLong` call compiles straight into the
  * enclosing whole-stage-codegen span, so a bloom pre-filter ahead of a
  * semi-join costs one inlined virtual call per row instead of a UDF
  * boundary (encoder round-trip + closure dispatch) that splits the scan's
  * codegen stage in two.
  *
  * Only the broadcast HANDLE is serialized into tasks; executors resolve
  * the shared filter block locally. False positives are expected — the
  * caller removes them with the exact join (JoinOps.bloomSemiJoin).
  *
  * Preference order (b) of the build brief: a custom Expression where the
  * built-in surface has no public equivalent (Spark's own
  * BloomFilterMightContain is internal to runtime row-level filtering).
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integral key, got ${t.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bloomBc.value

  override def nullSafeEval(k: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the broadcast handle as a codegen reference object, then
    // resolve it ONCE into a mutable-state field — per row the probe is a
    // plain field read + mightContainLong, not a Broadcast.value() call
    // (assertValid + soft-ref dereference) in the hot loop
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[BloomFilter]].getName)
    val filterCls = classOf[BloomFilter].getName
    val filterField = ctx.addMutableState(filterCls, "bloomFilter",
      v => s"$v = ($filterCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = $filterField.mightContainLong((long) $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
