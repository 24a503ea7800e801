package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashed character-bigram bucket counts: one pass over the
  * string, counting each consecutive code-point pair into bucket
  * (cp₁·31 + cp₂) mod `buckets` — the feature extraction of the
  * fastText-style hashed-n-gram language-ID gate (x119).
  *
  * Exists for the [[RollingHash]] reason: per-character work has no
  * linear-time built-in composition (`substr(s, i, 1)` seeks from the
  * start — O(n²) per document — and `split(s, "")` pays the regex engine
  * per character). The oracle replays the identical arithmetic
  * positionally (`ascii(substr(s,i,1))·31 + ascii(substr(s,i+1,1))`) —
  * integer counts, so the replay is exact; the fold steps Unicode code
  * points so both engines agree beyond ASCII too.
  */
case class CharBigramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0, "at least one bucket")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_bigram_buckets requires a string input, " +
          s"got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharBigramBuckets.count(input.asInstanceOf[UTF8String], buckets))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CharBigramBuckets.count($c, $buckets))")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramBuckets = copy(child = newChild)

  override def prettyName: String = "char_bigram_buckets"
}

object CharBigramBuckets {
  /** Static hot loop, called from both interpreted eval and generated
    * code. Steps by code point (see [[RollingHash.hash]]). */
  def count(s: UTF8String, buckets: Int): Array[Long] = {
    val str = s.toString
    val out = new Array[Long](buckets)
    val n = str.length
    if (n == 0) return out
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      if (prev >= 0) out(((prev * 31 + cp) % buckets + buckets) % buckets) += 1
      prev = cp
      i += Character.charCount(cp)
    }
    out
  }
}
