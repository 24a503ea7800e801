package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hierarchical-tree sinks (SURVEY.md §2.1 S9-S10).
  *
  * The reference writes two tree shapes to the Firebase Realtime Database:
  *  - per-path nodes `brands/{brand_id}/records/{cycle}/pac/{democrat,
  *    republican}` (pac_snowflake_realtime.py:117-126,150-221), and
  *  - one whole keyed tree `issues/{id} → record`, a single atomic `set()`
  *    with read-back count verification (index_align_to_firebase.py:223-259).
  *
  * Spark-first realization: the nested node is a `struct`/`map` column
  * (SURVEY.md §2.8), serialized with `to_json`. Per-path writes stay fully
  * distributed (one row per path, native JSON writer). The whole-tree write
  * is inherently a single JSON object — rows are STREAMED TO THE DRIVER
  * (`toLocalIterator`, constant memory, never a bulk collect) which writes
  * the one file. A driver-side write is the honest cost of the reference's
  * atomic single-object `set()` contract and is fine for its small keyed
  * trees; at scale the driver's network bandwidth becomes the bottleneck,
  * so anything 100 TB-sized belongs in the distributed per-path sink.
  */
object TreeSink {

  /** The realtime pipeline's nested node: `{cycle: {"pac": {democrat,
    * republican}}}` (pac_snowflake_realtime.py:121-126) as a map column. */
  def pacNode(democrat: Column, republican: Column): Column =
    map(lit("pac"), struct(democrat.as("democrat"), republican.as("republican")))

  /** S10: one row per tree path. `pathCols` are concatenated with '/' into
    * the node path; `node` is the nested value. Output is NDJSON rows
    * `{path, value}` — each row an independent RTDB `set(path, value)`, so
    * the write parallelizes over paths. */
  def preparePaths(df: DataFrame, pathCols: Seq[Column], node: Column): DataFrame =
    df.select(
      concat_ws("/", pathCols.map(_.cast("string")): _*).as("path"),
      to_json(node).as("value"))

  def writePerPath(paths: DataFrame, outPath: String): Unit =
    paths.write.mode(SaveMode.Overwrite).json(outPath)

  /** S9: whole keyed tree `{id → record}` as ONE JSON object (the
    * reference's atomic `set('issues', dict)`). JSON serialization happens
    * distributed; the serialized rows then stream through the DRIVER via
    * `toLocalIterator` — constant memory, but driver-bandwidth-bound, which
    * the single-object contract makes unavoidable. The id column is
    * EXCLUDED from the record payload once it becomes the map key (P18,
    * index_align_to_firebase.py:198-203). */
  def writeWholeTree(df: DataFrame, idCol: String, outFile: String): Unit = {
    val recCols = df.columns.filterNot(_ == idCol)
    val keyed = df.select(
      col(idCol).cast("string").as("__id"),
      to_json(struct(recCols.map(col).toIndexedSeq: _*)).as("__rec"))
    val path = new org.apache.hadoop.fs.Path(outFile)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    // toLocalIterator streams partition-by-partition in partition order —
    // the to_json work above stays parallel, only the final byte stream is
    // driver-sequential.
    val rows = keyed.toLocalIterator()
    val out = fs.create(path, true)
    try {
      out.write('{')
      var first = true
      while (rows.hasNext) {
        val r = rows.next()
        if (!first) out.write(',')
        first = false
        out.write(jsonKey(r.getString(0)).getBytes("UTF-8"))
        out.write(':')
        out.write(r.getString(1).getBytes("UTF-8"))
      }
      out.write('}')
    } finally out.close()
  }

  private def jsonKey(s: String): String = JsonEscape(s)

  /** S9 read-back verification (index_align_to_firebase.py:249-251): parse
    * the tree back into (id, record-json) rows for count/checksum assertions.
    */
  def readWholeTree(spark: SparkSession, file: String): DataFrame =
    spark.read.text(file)
      .select(explode(from_json(col("value"),
        org.apache.spark.sql.types.DataTypes.createMapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("id", "rec")))
}
