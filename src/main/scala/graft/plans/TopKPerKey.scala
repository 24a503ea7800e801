package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Per-key bounded-heap top-k — a whole custom operator (LogicalPlan +
  * SparkStrategy + SparkPlan), the tier the build brief reserves for
  * semantics the built-in operators cannot express EFFICIENTLY: the
  * window form `row_number().over(partitionBy(keys).orderBy(ord)) <= k`
  * fully SORTS every key group (Exchange → Sort → Window → Filter) just
  * to discard all but k rows, while this operator keeps a k-bounded heap
  * per key — O(n log k) with NO sort — and runs a map-side partial pass
  * before the exchange, so at most k rows per (key × input partition)
  * ever cross the shuffle. Same two-phase shape as partial aggregation,
  * applied to top-k.
  *
  * Correctness: a row in a key's global top-k is in that key's top-k of
  * its own input partition (the partial pass can never evict a global
  * winner), so partial → shuffle → final is exact. The retained SET is
  * unique (and thus deterministic) when the sort order is TOTAL — callers
  * should end the order with a unique tiebreak column, exactly as they
  * would for a reproducible window rank.
  *
  * Memory contract: each task holds at most (distinct keys in its
  * partition) × k row copies — the operator does not spill; it targets
  * the quota-cap/top-k-per-group shapes where k is small. The final pass
  * is bounded by k × (keys hashed to the task); a skewed KEY is no
  * problem (its group never materializes — the heap absorbs it), only
  * pathological key CARDINALITY × k approaches hash-aggregate territory,
  * which spills where this does not. Callers of [[topKPerKey]] own that
  * bound: use it only where keys × k is structurally small (a quota cap
  * over sources/languages, per-query rank over a bounded query set).
  * When the key cardinality is data-dependent — a crawl's `domain`
  * column, a user id — call [[topKPerKeyAuto]], which measures the
  * cardinality and routes oversized inputs to the sort-based window
  * form, which spills where the heap cannot.
  *
  * The heap's bytes are ACCOUNTED: every retained row reserves its size
  * against the task's execution-memory pool
  * ([[org.apache.spark.graftbridge.TrackedTaskMemory]]), so co-scheduled
  * spillable consumers are pressured to spill first, task metrics report
  * the operator's true peak, and pool exhaustion fails the task with a
  * clear message — never the executor with an untraceable heap OOM.
  */
object TopKPerKey {

  /** Logical node: top `k` rows per `keys` group under `order`. Output =
    * child output (a filter-like operator, no new columns). */
  case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, "k must be positive")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Plans the logical node as partial (pre-shuffle) + final exec. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, order, k, child) =>
        val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
        TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
      case _ => Nil
    }
  }

  /** Physical bounded-heap top-k. `partial = true` runs on whatever
    * distribution the child has (map-side); `partial = false` demands
    * clustering by `keys`, which EnsureRequirements satisfies with one
    * hash exchange — of the already-k-bounded survivors. */
  case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                            k: Int, partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    /** Estimated JVM overhead per retained row beyond its UnsafeRow bytes
      * (HashMap entry / PriorityQueue slot / object headers). */
    private val RowOverheadBytes = 64L

    override protected def doExecute(): RDD[InternalRow] = {
      val keyExprs = keys
      val sortOrder = order
      val limit = k
      val childOutput = child.output
      val opLabel = s"TopKPerKey(k=$k, partial=$partial)"
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val ordering = GenerateOrdering.generate(sortOrder, childOutput)
        // Every byte the heap map retains is accounted against the task's
        // execution-memory pool (TrackedTaskMemory): spillable consumers
        // see the pressure, task metrics report the peak, and exhaustion
        // fails THIS task with a clear message instead of the executor
        // with a heap OOM. None outside a task (driver-side test plans).
        val mem = org.apache.spark.graftbridge.TrackedTaskMemory.forCurrentTask()
        // peek() = the WORST retained row (reverse ordering), so a full
        // heap admits a new row iff it beats the current worst.
        val worstFirst: java.util.Comparator[InternalRow] = ordering.reverse
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = toUnsafe(iter.next())
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](
              math.max(1, math.min(limit, 16)), worstFirst)
            val keyCopy = key.copy()
            mem.foreach(_.reserve(
              keyCopy.getSizeInBytes + RowOverheadBytes, opLabel))
            heaps.put(keyCopy, heap)
          }
          if (heap.size < limit) {
            val copy = row.copy()
            mem.foreach(_.reserve(copy.getSizeInBytes + RowOverheadBytes, opLabel))
            heap.offer(copy)
          } else if (ordering.compare(row, heap.peek()) < 0) {
            val evicted = heap.poll().asInstanceOf[UnsafeRow]
            val copy = row.copy()
            mem.foreach { m =>
              m.release(evicted.getSizeInBytes + RowOverheadBytes)
              m.reserve(copy.getSizeInBytes + RowOverheadBytes, opLabel)
            }
            heap.offer(copy)
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  /** DataFrame API: top `k` rows per `keyCols` group, "top" = first under
    * `orderCols` (wrap with `.desc`/`.asc` as usual; bare columns sort
    * ascending). End `orderCols` with a unique tiebreak for a
    * deterministic result set. Registers the planner strategy on the
    * frame's session idempotently.
    *
    * Column-to-Catalyst note: Spark 4 Columns carry LAZY ColumnNode
    * wrappers that only the analyzer materializes for nodes it knows, so
    * the resolved `SortOrder`s are extracted from a throwaway analyzed
    * `df.sort(orderCols)` plan (its Sort node holds exactly the resolved
    * order against exactly the analyzed child this node wraps). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                 k: Int): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.registerStrategy(spark, TopKStrategy)
    val (order, child) = PlanBridge.analyzed(df.sort(orderCols: _*)) match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected a Sort node from df.sort, got: ${other.getClass}")
    }
    val keys = keyCols.map { n =>
      child.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"key column $n not in ${child.output.map(_.name).mkString(", ")}"))
    }
    PlanBridge.ofRows(spark, TopKPerKeyNode(keys, order, k, child))
  }

  /** Per-task row budget for the final heap pass used by
    * [[topKPerKeyAuto]]: with keys hash-clustered across
    * `spark.sql.shuffle.partitions` final tasks, a task holds
    * ~(distinct keys ÷ tasks) × k row copies. 4M UnsafeRow copies plus
    * PriorityQueue boxing is a few hundred MB — inside a normal executor
    * budget, but the far edge of what an unspillable operator should
    * hold; beyond it the sort-based window form (which spills to disk)
    * is the safer plan even though it is slower. */
  val DefaultMaxHeapRowsPerTask: Long = 4L * 1000 * 1000

  /** [[topKPerKey]] with the memory contract ENFORCED rather than assumed:
    * estimates the key cardinality with one `approx_count_distinct` pass
    * over the key columns (an eager action at build time — HLL partial
    * aggregation, column-pruned, never reads the payload columns) and
    * routes to the equivalent `row_number()` window form when estimated
    * keys × k per final task would exceed `maxHeapRowsPerTask`. The
    * window form sorts — and therefore spills — so it degrades to disk
    * where the heap operator would exhaust task memory. Both branches
    * select the identical row set under a total `orderCols` (end with a
    * unique tiebreak, as for [[topKPerKey]]). The HLL estimate carries
    * ~5% relative error; the default budget leaves far more headroom
    * than that. */
  def topKPerKeyAuto(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                     k: Int,
                     maxHeapRowsPerTask: Long = DefaultMaxHeapRowsPerTask): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.functions.{approx_count_distinct, col, row_number, struct}
    val estKeys = df.select(
        approx_count_distinct(struct(keyCols.map(col): _*), rsd = 0.05))
      .head().getLong(0)
    val finalTasks = math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val perTaskRows = estKeys.toDouble * k / finalTasks
    if (perTaskRows <= maxHeapRowsPerTask.toDouble)
      topKPerKey(df, keyCols, orderCols, k)
    else {
      val rk = "__graft_topk_rk"
      require(!df.columns.contains(rk), s"column $rk already present")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      df.withColumn(rk, row_number().over(w)).filter(col(rk) <= k).drop(rk)
    }
  }
}
