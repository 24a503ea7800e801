package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 60-bit md5 hash: the value of the first 15 hex characters of
  * `md5(s)` as a long — bit-identical to the composed form
  * `conv(substring(md5(s),1,15),16,10)` that every dedup/curation key in
  * the engine is defined by (and that the DuckDB oracles replay as
  * `('0x' || substr(md5(s),1,15))::BIGINT`).
  *
  * Exists because the composed form materializes a 32-char hex UTF8String
  * per hash, substrings it, then re-parses digits through `conv` — three
  * allocation-bearing expression nodes on the hottest path in the engine
  * (every shingle of every document in x4/x12/x16/x18, every id in the
  * curation suite). This expression goes digest-bytes → long directly: the
  * first 7 digest bytes big-endian, then the high nibble of byte 7, which
  * is exactly what base-16-parsing the first 15 hex chars yields.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash60 requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)

  override def prettyName: String = "md5_hash60"
}

object Md5Hash60 {

  /** MessageDigest is not thread-safe and allocation is not free — one
    * instance per executor thread, reset by digest() itself. */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static hot path, called from both interpreted eval and generated code.
    * digest(0..6) big-endian (= hex chars 1-14) then the high nibble of
    * digest(7) (= hex char 15). */
  def hash(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (d(i) & 0xFFL)
      i += 1
    }
    (h << 4) | ((d(7) & 0xF0L) >>> 4)
  }
}
