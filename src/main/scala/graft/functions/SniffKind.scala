package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd magic-byte media classifier — the SQL surface of
  * [[graft.operators.Multimodal.sniffKind]] (the pl21/pl22 triage
  * funnels' first stage), so a SQL user triages a crawl's unlabeled
  * binary columns without leaving the query layer:
  *
  *   SELECT sniff_kind(payload) AS kind, count(*) FROM media GROUP BY 1
  *
  * Classifies by LEADING BYTES only — the carried Content-Type lies in
  * real crawls: `flac` (the fLaC marker), `mp3` (ID3v2 or an MPEG sync
  * word), `h264` (an Annex-B start code), else `unknown`. Pure per-row
  * projection, stays inside whole-stage codegen. */
case class SniffKind(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sniff_kind requires a binary input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    SniffKind.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SniffKind.sniff($c)")

  override protected def withNewChildInternal(newChild: Expression): SniffKind =
    copy(child = newChild)

  override def prettyName: String = "sniff_kind"
}

object SniffKind {
  /** Static hot path for interpreted eval and generated code — delegates
    * to the operator-layer classifier so SQL and the Dataset funnels can
    * never drift. */
  def sniff(payload: Array[Byte]): UTF8String =
    UTF8String.fromString(graft.operators.Multimodal.sniffKind(payload))
}
