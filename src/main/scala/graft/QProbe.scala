package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** Dev-only per-ACTION attribution probe (optimization rounds): runs named
  * queries exactly as Bench does (warmup pass, then a timed pass through
  * the noop sink) while aggregating every Spark job's wall time onto its
  * SQL EXECUTION (jobs carry `spark.sql.execution.id`, including the
  * broadcast-exchange jobs submitted from the thread pool, which plain
  * stage names cannot attribute), then prints the timed pass's execution
  * ledger sorted by cost with each execution's call site. A 10s query
  * that is 40 executions of 250ms is an orchestration problem; one 8s
  * execution is a compute problem. Driver-side gaps (planning, collect
  * decode, file IO between jobs) show up as wall − jobSum, printed per
  * query. Usage: runMain graft.QProbe <query> [query ...] [--sf <dir>]
  * Not part of the library surface. */
object QProbe {
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

    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val execMs = new java.util.concurrent.ConcurrentHashMap[Long, java.util.concurrent.atomic.AtomicLong]()
    val execJobs = new java.util.concurrent.ConcurrentHashMap[Long, java.util.concurrent.atomic.AtomicLong]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          execDesc.put(e.executionId, e.description.linesIterator
            .find(_.trim.nonEmpty).getOrElse("?").take(120))
        case _ =>
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val eid = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(_.toLongOption).getOrElse(-1L)
          jobStart.put(js.jobId, (eid, System.nanoTime()))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStart.get(je.jobId)
        if (s != null) {
          val (eid, t0) = s
          execMs.computeIfAbsent(eid,
            _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet((System.nanoTime() - t0) / 1000000)
          execJobs.computeIfAbsent(eid,
            _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
        }
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
      jobStart.clear(); execMs.clear(); execJobs.clear()
      recording = true
      val t0 = System.nanoTime()
      materialize(name)
      val wallMs = (System.nanoTime() - t0) / 1000000
      recording = false
      Thread.sleep(300) // listener bus drain
      import scala.jdk.CollectionConverters._
      val ledger = execMs.asScala.toSeq.map { case (eid, ms) =>
        (ms.get, execJobs.get(eid).get, execDesc.getOrDefault(eid, "?"), eid)
      }.sortBy(-_._1)
      val jobSum = ledger.map(_._1).sum
      println(s"=== $name  wall=${wallMs}ms  execs=${ledger.size}  " +
        s"jobSum=${jobSum}ms  driverGap=${wallMs - jobSum}ms ===")
      ledger.take(60).foreach { case (ms, nj, desc, eid) =>
        println(f"  $ms%6dms ($nj%2d jobs) exec=$eid%-4d $desc")
      }
    }
    spark.stop()
  }
}
