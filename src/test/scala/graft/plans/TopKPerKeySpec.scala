package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The custom per-key bounded-heap top-k operator: row-identical to the
  * window row_number form under a total order, correct physical shape
  * (no per-group sort, one exchange, partial pass below it), edge cases. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }

  test("property: topKPerKey selects the same rows as the window row_number form") {
    val gen = Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 6), Gen.choose(0L, 30L))))
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, s"g$g", v) }
        .toDF("id", "g", "v")
      val native = TopKPerKey.topKPerKey(df, Seq("g"),
          Seq(desc("v"), col("id")), 3)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val window = windowTopK(df, 3)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      native == window
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("k >= group size keeps whole groups; empty input yields empty output") {
    val df = Seq((1L, "a", 5L), (2L, "a", 3L), (3L, "b", 9L)).toDF("id", "g", "v")
    val all = TopKPerKey.topKPerKey(df, Seq("g"), Seq(desc("v"), col("id")), 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all === Seq(1L, 2L, 3L))
    val empty = TopKPerKey.topKPerKey(df.filter(col("id") < 0), Seq("g"),
      Seq(desc("v"), col("id")), 2)
    assert(empty.count() === 0)
  }

  test("physical plan: partial below ONE exchange, final above, no sort") {
    val df = (1L to 200L).map(i => (i, s"g${i % 7}", i % 13)).toDF("id", "g", "v")
    val topk = TopKPerKey.topKPerKey(df, Seq("g"), Seq(desc("v"), col("id")), 2)
    val plan = PlanNodes.finalPlan(topk)
    val nodes = PlanNodes.allNodes(plan)
    val execs = nodes.collect { case t: TopKPerKey.TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true),
      s"expected partial + final exec pair in:\n$plan")
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) === 1)
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      s"bounded-heap top-k must not sort:\n$plan")
    // the partial pass bounds what crosses the exchange: k rows per
    // (key x input partition) is the most the shuffle can ever carry
    val out = topk.collect()
    assert(out.length === 14) // 7 groups x k=2
  }

  test("auto form: high-cardinality key routes to the spilling window form, " +
      "small key stays on the native heap, both select identical rows") {
    // 5k distinct keys x k=2 with a 1-row-per-task budget forces the
    // fallback; the default budget keeps the native operator.
    val df = (1L to 10000L).map(i => (i, s"g${i % 5000}", i % 17)).toDF("id", "g", "v")
    val guarded = TopKPerKey.topKPerKeyAuto(df, Seq("g"),
      Seq(desc("v"), col("id")), 2, maxHeapRowsPerTask = 1L)
    val guardedNodes = PlanNodes.allNodes(PlanNodes.finalPlan(guarded))
    assert(!guardedNodes.exists(_.isInstanceOf[TopKPerKey.TopKPerKeyExec]),
      "over-budget input must not plan the unspillable heap operator")
    assert(guardedNodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "over-budget input must take the sort-based window form (it spills)")

    val native = TopKPerKey.topKPerKeyAuto(df, Seq("g"), Seq(desc("v"), col("id")), 2)
    assert(PlanNodes.allNodes(PlanNodes.finalPlan(native))
      .exists(_.isInstanceOf[TopKPerKey.TopKPerKeyExec]),
      "in-budget input must keep the bounded-heap operator")

    val a = guarded.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = native.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.length === 10000) // k=2 x 5000 groups, every group size 2
  }

  test("heap bytes are accounted as execution memory (peakExecutionMemory > 0)") {
    // The tracked consumer reserves every retained row against the task
    // pool; Spark folds consumer usage into the task's peakExecutionMemory
    // metric, so a nonzero peak on the top-k stages proves the operator's
    // memory is visible to the memory manager (not silent JVM heap).
    val peaks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) peaks.accumulateAndGet(m.peakExecutionMemory, Math.max)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = (1L to 20000L).map(i => (i, s"g${i % 50}", i % 997))
        .toDF("id", "g", "v").repartition(8)
      val n = TopKPerKey.topKPerKey(df, Seq("g"),
        Seq(desc("v"), col("id")), 20).count()
      assert(n === 1000) // 50 groups x k=20
      // listener bus is async — poll briefly for the metric to land
      val deadline = System.nanoTime() + 10e9.toLong
      while (peaks.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(peaks.get() > 0,
        "top-k tasks must report accounted execution memory")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ascending order and multi-column keys work") {
    val df = Seq(
      (1L, "a", "x", 5L), (2L, "a", "x", 3L), (3L, "a", "y", 9L),
      (4L, "b", "x", 1L), (5L, "a", "x", 4L)
    ).toDF("id", "g1", "g2", "v")
    val out = TopKPerKey.topKPerKey(df, Seq("g1", "g2"),
        Seq(col("v"), col("id")), 1)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(2L, 3L, 4L)) // min v per (g1, g2)
  }
}
