package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite the ubiquitous window top-k pattern
  *
  *   SELECT <cols without rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) AS rn ...)
  *   WHERE rn <= k
  *
  * into the native bounded-heap operator ([[TopKPerKey.TopKPerKeyNode]]):
  * partial heap → one exchange of ≤ k rows per (key × partition) → final
  * heap, no sort anywhere. Spark's own InferWindowGroupLimit only
  * PRE-FILTERS below the Window (it must still locally sort and then
  * evaluate row_number); this rewrite removes the Window entirely, which
  * is sound precisely when the rank column is discarded by the enclosing
  * projection — the only thing the query keeps is the per-key top-k SET,
  * which the heap computes without ranking. Under order ties the window
  * form's own choice of survivors is nondeterministic (partition-order
  * dependent), and the heap's choice is within the same envelope; with a
  * total order (the engine's own queries tie-break by id) the sets are
  * identical.
  *
  * OPT-IN (`spark.graft.topk.rewrite=true`): a blanket rewrite cannot
  * know key cardinality, and the heap operator trades the window form's
  * spill-to-disk for bounded-memory speed. Its memory is fully accounted
  * ([[org.apache.spark.graftbridge.TrackedTaskMemory]]) so an over-budget
  * rewrite fails its task with a clear message rather than the executor —
  * but the safe default is to leave plan selection to the caller
  * ([[TopKPerKey.topKPerKeyAuto]] measures; this rule trusts).
  *
  * Matched shapes: rank predicate `rn <= k` / `rn < k` / `rn = 1` (both
  * operand orders); an InferWindowGroupLimit prefilter already inserted
  * below the Window is seen through and dropped (the heap subsumes it).
  */
object NativeTopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.rewrite"

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = {
    object RankRef { def unapply(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(rank)
      case _ => false
    }}
    cond match {
      case LessThanOrEqual(RankRef(), Literal(k: Int, _)) => Some(k)
      case LessThan(RankRef(), Literal(k: Int, _)) => Some(k - 1)
      case EqualTo(RankRef(), Literal(k: Int, _)) if k == 1 => Some(1)
      case EqualTo(Literal(k: Int, _), RankRef()) if k == 1 => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, _), RankRef()) => Some(k)
      case GreaterThan(Literal(k: Int, _), RankRef()) => Some(k - 1)
      case _ => None
    }
  }

  /** The Window's real input, looking through a WindowGroupLimit that
    * InferWindowGroupLimit may already have inserted (the heap operator
    * subsumes that prefilter) — but ONLY when the limit's partition/order
    * spec matches the window being rewritten and its limit is not tighter
    * than k: today InferWindowGroupLimit inserts the node for exactly this
    * window, but a future rule-ordering change could park a different
    * window shape's prefilter here, and silently dropping THAT would relax
    * a filter the query depends on (round-9 advice). A mismatched limit is
    * kept in place — the heap on top of it is still correct, merely
    * conservative. */
  private def realChild(child: LogicalPlan, partitionSpec: Seq[Expression],
                        orderSpec: Seq[SortOrder], k: Int): LogicalPlan =
    child match {
      case WindowGroupLimit(ps, os, _, limit, grandchild)
          if ps.length == partitionSpec.length &&
            ps.zip(partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
            os.length == orderSpec.length &&
            os.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } &&
            limit >= k =>
        grandchild
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transform {
      case Project(projList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
              partitionSpec, orderSpec, child, _)))
          if orderSpec.nonEmpty && partitionSpec.nonEmpty &&
            partitionSpec.forall(!_.foldable) &&
            limitOf(cond, alias.toAttribute).exists(_ > 0) &&
            !projList.exists(_.references.contains(alias.toAttribute)) =>
        val k = limitOf(cond, alias.toAttribute).get
        Project(projList,
          TopKPerKey.TopKPerKeyNode(partitionSpec, orderSpec, k,
            realChild(child, partitionSpec, orderSpec, k)))
    }
}
