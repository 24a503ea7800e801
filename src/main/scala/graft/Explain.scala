package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan (and optionally run)
  * any declared query. Usage:
  *   runMain graft.Explain <queryName> [sfDir] [--run]
  * With no query name, lists all declared queries.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    if (args.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    } else {
      val name = args(0)
      val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
                  else "/root/testdata/sf0.001"
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"=== $name @ $sfDir ===")
      df.explain("formatted")
      if (args.contains("--run")) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
