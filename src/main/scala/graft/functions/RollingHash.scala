package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Rabin-Karp rolling hash: h ← (h·31 + char) mod P over the
  * whole string, left to right; empty/null-safe; any length.
  *
  * Exists because no composition of built-ins folds per character in
  * linear time: `split(text, "")` pays the regex engine per character
  * (~µs each — seconds per million chars) and `substr(text, i, 1)` seeks
  * from the start (O(n²) per document). This expression is a tight loop —
  * ~ns per character.
  *
  * The fold iterates Unicode CODE POINTS, matching the declared-equivalent
  * HOF fold ([[graft.operators.TextOps.rollingHash]], Spark
  * `ascii(substr(s,i,1))`) and the DuckDB oracle (`ascii(substr(s,i,1))`)
  * for ALL inputs, including surrogate pairs (emoji) — a UTF-16-unit fold
  * would silently diverge on non-BMP text.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val P: Long = 1000000007L

  /** Static hot loop, called from both interpreted eval and generated code.
    * Steps by code point, not UTF-16 unit — see class doc. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
