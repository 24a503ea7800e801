package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Md5Hash60, RollingHash}

/** Session extensions for the engine's custom expressions — the documented
  * public registration path (`spark.sql.extensions=graft.plans.
  * GraftExtensions` or `builder.withExtensions(new GraftExtensions)`).
  * Registers SQL surface for expressions the DataFrame layer reaches via
  * [[graft.operators.VectorOps]]:
  *
  *   SELECT dot_product(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_hash takes exactly 1 argument")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes exactly 1 argument")
        graft.functions.NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_hash60 takes exactly 1 argument")
        Md5Hash60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sniff_kind"),
      new ExpressionInfo(classOf[graft.functions.SniffKind].getName, "sniff_kind"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "sniff_kind takes exactly 1 argument")
        graft.functions.SniffKind(children.head)
      }))
    // Rewrite HOF dot-product folds (aggregate∘zip_with) into the codegen'd
    // expression — see DotProductRewrite for the soundness argument.
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // Opt-in (spark.graft.topk.rewrite=true): rewrite discarded-rank
    // row_number top-k windows into the native bounded-heap operator —
    // see NativeTopKRewrite for the soundness + memory argument. The
    // strategy below plans the node it (and the DataFrame API) produces.
    ext.injectOptimizerRule(_ => NativeTopKRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKey.TopKStrategy)
  }
}
