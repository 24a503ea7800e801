package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total",...,"queries":{...}}.
  *
  * Measurement rules (round-2 verdict "What's wrong #1"):
  *  - a WARMUP pass runs every query once unmeasured, so JVM/codegen/
  *    classloading warmup does not land on the first measured query;
  *  - queries materialize through the `noop` datasource writer — every
  *    column expression is computed (a bare count() lets Catalyst prune
  *    unreferenced projections such as date_format/sha256 columns);
  *  - per-query errors PROPAGATE: a broken query aborts the bench with a
  *    nonzero exit instead of being recorded as a fast timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    def materialize(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] query $name failed: ${e.getMessage}")
        throw e
      }

    val names = SparkEntry.queries.keys.toSeq.sorted

    /** Between passes: drop persisted frames and GC so the ContextCleaner
      * reclaims the previous pass's shuffle files and broadcasts.
      * clearCache matters for honesty, not just memory: operators that
      * persist() (near-dup signature frames) are deduped by canonicalized
      * plan in the CacheManager, so without it the measured passes would
      * read the WARMUP pass's cache instead of executing the pipeline —
      * each measured pass must pay its own build-and-use cost. */
    def reclaim(): Unit = {
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(500)
    }

    names.foreach(materialize) // warmup: full pass, unmeasured
    reclaim()

    // Two measured passes, keep the per-query minimum: sink round-trip
    // queries do real filesystem IO, and min-of-2 suppresses that noise
    // without hiding systematic regressions.
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      materialize(name)
      (System.nanoTime() - t0) / 1e9
    }
    val pass1 = names.map(n => n -> timed(n)).toMap
    reclaim()
    val results = names.map(n => n -> math.min(pass1(n), timed(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Regression guardrail: compare against the checked-in expectation
    // snapshot (only meaningful at its own scale factor) and fail loudly on
    // a >2× per-query regression — round-over-round perf claims are
    // enforced here, not reconstructed from old logs.
    val atExpectedSf = sfDir.endsWith("sf0.1")
    val regressions = if (atExpectedSf) results.collect {
      case (n, v) if BenchExpectations.secondsAtSf01.get(n).exists(e =>
        v > math.max(e * BenchExpectations.RegressionFactor,
          BenchExpectations.NoiseFloorSec)) =>
        val e = BenchExpectations.secondsAtSf01(n)
        s"""{"query":"$n","expected":$e,"measured":$v}"""
    } else Nil
    val regs = regressions.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"regressions":$regs,"sf":"$sfDir"}""")
    spark.stop()
    if (regressions.nonEmpty) {
      System.err.println(s"[bench] ${regressions.size} per-query regression(s) > " +
        s"${BenchExpectations.RegressionFactor}x vs BenchExpectations")
      sys.exit(1)
    }
  }
}
