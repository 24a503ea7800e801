package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public sketch
  * API), carried serialized inside the expression so it ships to executors
  * with the task binary — no driver round-trips per row.
  *
  * Exists for [[graft.operators.Joins.bloomPrefilteredJoin]]: probing a
  * compact sketch of the small side's join keys lets the big side drop
  * non-joining rows BEFORE its shuffle exchange. Spark's own runtime
  * bloom filter (InjectRuntimeFilter) makes the same move automatically,
  * but only when both sides are visible to one optimizer run — a filter
  * built from a frame computed earlier (a previous pipeline stage, another
  * job, a checkpoint) needs this explicit form.
  *
  * The input is the XXH64 of the join key (LongType): the filter is built
  * over the same hash, so put/probe agree by construction for any key
  * type. False positives only ADD candidate rows, which the exact join
  * then drops — the composed operator's result is identical to the plain
  * join for every fpp. Null hashes return null, which `filter(...)`
  * drops — matching inner-join semantics for null keys.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain probes a long key hash, got ${child.dataType.simpleString}")

  /** Deserialized once per executor instance, not per row; transient so
    * only the compact byte form travels with the serialized expression. */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
