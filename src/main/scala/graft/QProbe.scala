package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-JOB attribution probe (optimization rounds): runs named
  * queries exactly as Bench does (warmup pass, then a timed pass through
  * the noop sink) with a listener that records every Spark job's wall
  * time and call site, then prints the timed pass's job ledger sorted by
  * cost. A 10s query that is 40 jobs of 250ms is an orchestration
  * problem; one 8s job is a compute problem — this tells them apart,
  * which DIAG-mode byte counters cannot. Driver-side gaps (planning,
  * collect decode, file IO between jobs) show up as the difference
  * between the job-time sum and the wall clock, printed last.
  * Usage: runMain graft.QProbe <query> [query ...] [--sf <dir>]
  * Not part of the library surface. */
object QProbe {
  private final case class Job(id: Int, site: String, var ms: Long = -1,
                               start: Long = System.nanoTime())

  def main(args: Array[String]): Unit = {
    val sfDir = {
      val i = args.indexOf("--sf")
      if (i >= 0) args(i + 1) else "/root/testdata/sf0.1"
    }
    val names = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.indexOf("--sf") >= 0 && a == args(args.indexOf("--sf") + 1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          // SQL-triggered jobs carry no callSite property; the action's
          // identity lives in the RDD-derived stage names (e.g. "collect
          // at VectorOps.scala:233", "parquet at LayoutSink.scala:40").
          val names = js.stageInfos.map(_.name).distinct
          val site = (Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .toSeq ++ Seq(s"${js.stageInfos.size}st " +
              names.takeRight(2).mkString(" | "))).mkString("; ")
          jobs.put(js.jobId, Job(js.jobId, site))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.ms = (System.nanoTime() - j.start) / 1000000
      }
    })

    def materialize(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      GraftCache.release(blocking = true)
      BenchHygiene.sweep(spark)
    }

    names.foreach { name =>
      materialize(name) // warmup: codegen + JIT, off the ledger
      jobs.clear()
      recording = true
      val t0 = System.nanoTime()
      materialize(name)
      val wallMs = (System.nanoTime() - t0) / 1000000
      recording = false
      Thread.sleep(300) // listener bus drain
      import scala.jdk.CollectionConverters._
      val ledger = jobs.values.asScala.toSeq.sortBy(-_.ms)
      val jobSum = ledger.map(_.ms.max(0L)).sum
      println(s"=== $name  wall=${wallMs}ms  jobs=${ledger.size}  " +
        s"jobSum=${jobSum}ms  driverGap=${wallMs - jobSum}ms ===")
      ledger.take(200).foreach(j => println(f"  ${j.ms}%6dms  job=${j.id}%-4d ${j.site}"))
    }
    spark.stop()
  }
}
