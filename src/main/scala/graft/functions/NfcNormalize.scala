package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (java.text.Normalizer) — the
  * canonical-composition pass a multilingual corpus needs BEFORE any
  * byte-level dedup key: "café" typed with a precomposed é (U+00E9) and
  * with a combining acute (e + U+0301) are byte-DIFFERENT but canonically
  * the SAME text, so un-normalized fingerprints keep both copies and
  * un-normalized shingles never match across the variants. NFC is the
  * W3C-recommended interchange form and is idempotent (spec-pinned);
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm, so
  * oracles replay the normalization exactly.
  *
  * Fast path: Normalizer.isNormalized is O(n) with no allocation and
  * true for virtually all real text (ASCII is always NFC) — the full
  * normalize pass runs only on the rows that actually need composing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static hot path for interpreted eval and generated code. Returns the
    * input UNCHANGED (no copy) when already normalized — the overwhelming
    * common case. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
