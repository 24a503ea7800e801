package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch ([[graft.functions.KmvSketch]] /
  * [[Aggregations.kmvSketch]]) and BIGINT-ppm PageRank
  * ([[Graph.pageRankPpm]]). */
class SketchGraphSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def sketchOf(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    values.toDF("h").repartition(parts)
      .agg(Aggregations.kmvSketch(col("h"), k).as("sk"))
      .select(explode(col("sk")).as("h")).as[Long].collect().toSeq
  }

  test("kmv sketch is the k smallest distinct values, ascending, " +
       "independent of row order and partitioning") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextLong() & ((1L << 60) - 1))
    val expected = values.distinct.sorted.take(256)
    assert(sketchOf(values, 256, 1) == expected)
    assert(sketchOf(rnd.shuffle(values), 256, 16) == expected)
  }

  test("kmv sketch below k distinct values IS the distinct set (exact)") {
    val values = Seq(9L, 3L, 9L, 1L, 3L, 7L)
    assert(sketchOf(values, 256, 4) == Seq(1L, 3L, 7L, 9L))
  }

  test("kmv merge is lossless: merged shard sketches == corpus sketch") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy overlap between shards on purpose — merge must dedup
    val values = Seq.fill(8000)(rnd.nextInt(3000).toLong * 7919)
    val whole = sketchOf(values, 128, 8)
    val merged = values.zipWithIndex.map { case (v, i) => (i % 5, v) }
      .toDF("shard", "h")
      .groupBy("shard").agg(Aggregations.kmvSketch(col("h"), 128).as("sk"))
      .select(explode(col("sk")).as("h"))
      .agg(Aggregations.kmvSketch(col("h"), 128).as("sk"))
      .select(explode(col("sk")).as("h")).as[Long].collect().toSeq
    assert(merged == whole)
  }

  test("kmv estimate lands within 15% of truth at k=256, n=20000") {
    import spark.implicits._
    val k = 256
    val est = (0 until 20000).map(i => s"key_$i").toDF("s")
      .select(TextOps.md5Hash60(col("s")).as("h"))
      .agg(Aggregations.kmvSketch(col("h"), k).as("sk"))
      .select(Aggregations.kmvEstimate(col("sk"), k).as("est"))
      .as[Long].head()
    assert(math.abs(est - 20000L) < 3000, s"estimate $est too far from 20000")
  }

  test("kmv aggregate serialization round-trips the buffer") {
    val agg = graft.functions.KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = agg.createAggregationBuffer()
    Seq(42L, 7L, 99L, 7L).foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.asScala.toSeq == buf.asScala.toSeq)
  }

  test("log-histogram percentiles: bucket bounds always contain the true " +
       "rank statistic, with bounded relative width") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // heavy-tailed positive values across 5 decades
    val df = Seq.fill(4000)(math.exp(rnd.nextGaussian() * 2.5)).toDF("value")
    val rows = Aggregations.logHistogramPercentiles(df, "value",
      Seq(10, 50, 90, 99)).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (lo, hi, exact) = (r.getAs[Long]("bucket_lo"),
        r.getAs[Long]("bucket_hi"), r.getAs[Long]("exact_micro"))
      assert(lo <= exact && exact <= hi,
        s"p${r.getAs[Long]("p")}: $exact outside [$lo, $hi]")
      // γ = 2^(1/8): bucket width ≤ ~9% of its lower bound (plus the
      // tiny-value buckets where the 4-bit mantissa hasn't kicked in)
      assert(hi - lo <= lo / 8 + 1, s"bucket [$lo, $hi] too wide")
    }
  }

  /** The recurrence on plain Maps — an independent driver-side image of
    * [[Graph.pageRankPpm]] to pin the distributed form against. */
  private def pageRankLocal(nodes: Seq[Long], edges: Seq[(Long, Long)],
                            iters: Int,
                            dampPpm: Long = 850000L): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inc = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v ->
        ((1000000L - dampPpm) +
          (dampPpm * inc.getOrElse(v, 0L)) / 1000000L)).toMap
    }
    r
  }

  test("pageRankPpm matches the integer recurrence on a hand graph, " +
       "including zero-indegree floor nodes") {
    import spark.implicits._
    // 0↔1 endorse each other, 2 endorses both, 3 is isolated
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L), (2L, 1L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val got = Graph.pageRankPpm(
        nodes.toDF("id"), edges.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == pageRankLocal(nodes, edges, 4))
    // isolated and source-only nodes sit exactly on the damping floor
    assert(got(3L) == 150000L)
    assert(got(2L) == 150000L)
    // mutually-endorsing hub pair accumulated mass above initial
    assert(got(0L) > 1000000L && got(1L) > got(2L))
  }

  test("pageRankPpm threads a non-default damping through operator, local " +
       "model, and oracle CTE alike (round-13 advice: no constant drift)") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L), (2L, 1L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val damp = 600000L
    val got = Graph.pageRankPpm(
        nodes.toDF("id"), edges.toDF("src", "dst"), 4, dampPpm = damp)
      .as[(Long, Long)].collect().toMap
    assert(got == pageRankLocal(nodes, edges, 4, damp))
    assert(got(3L) == 1000000L - damp) // floor follows the parameter
    // the oracle CTE generator emits the SAME parameterized constants
    val cte = graft.queries.VectorQueries.pageRankIterCtes(2, damp)
    assert(cte.contains(s"${1000000L - damp} + ($damp * COALESCE"))
    assert(!cte.contains("850000"))
  }

  test("pageRankPpm is partitioning-invariant (integer sums don't reorder)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val nodes = (0L until 200L)
    val edges = Seq.fill(900)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    def run(parts: Int, compact: Boolean): Map[Long, Long] =
      Graph.pageRankPpm(
        nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), 6, compact = compact)
      .as[(Long, Long)].collect().toMap
    assert(run(1, compact = false) == run(13, compact = false))
    // the compact (broadcast/localCheckpoint) regime is plan shape only —
    // bit-identical ranks
    assert(run(13, compact = true) == run(1, compact = false))
  }
}
