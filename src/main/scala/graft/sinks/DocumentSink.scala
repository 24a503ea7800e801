package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Document sinks (SURVEY.md §2.1 S6-S8, S11).
  *
  * The reference delivers rows as keyed documents `{collection, document_id,
  * data}` to Firestore — per-document `set()` loops
  * (pac_data_processor.py:263-276) and batched `db.batch()` commits with a
  * dry-run preview and a ≥ 0.8 success criterion
  * (pac_snowflake_pipeline.py:163-207,292-312,316-329,365).
  *
  * Spark-first realization: documents are a DataFrame with columns
  * (collection, document_id, data-as-JSON); the write path is either the
  * native collection-partitioned JSON writer (S7 — scales to any size, one
  * file per task per collection) or a `foreachPartition` batched writer (S8 —
  * the shape a real doc-store client needs: executor-side batching, bounded
  * batch memory, per-record success accounting via accumulators, no driver
  * collect).
  */
object DocumentSink {

  /** Shape a frame into document records: one row → one document.
    * `data` is the full row serialized as JSON (to_dict ≡ to_json(struct)),
    * pac_data_processor.py:113-118. */
  def prepare(df: DataFrame, collection: Column, documentId: Column): DataFrame =
    df.select(
      collection.as("collection"),
      documentId.cast("string").as("document_id"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("data"))

  /** S7: per-document sink — collection-partitioned JSON, one line per
    * document. Fully parallel: every executor writes its own files under
    * `collection=<name>/`; no batching state. */
  def write(records: DataFrame, path: String): Unit =
    records.write.mode(SaveMode.Overwrite).partitionBy("collection").json(path)

  /** Pluggable batch transport (the `db.batch().commit()` seam). Returns the
    * number of records successfully committed from the batch. Implementations
    * must be Serializable — instantiated on executors. */
  trait BatchWriter extends Serializable {
    def commit(batch: Seq[(String, String, String)]): Int
  }

  /** Local-filesystem batch transport. File names are
    * `batch-<writerId>-<stageId>-<partition>-<batchIndex>.json`:
    *  - writerId is fixed at (driver-side) construction, so distinct
    *    writer instances — e.g. separate pipeline runs — never collide;
    *  - stageId distinguishes invocations sharing one writer instance
    *    (each foreachBatch micro-batch runs as its own stage);
    *  - (partition, batchIndex) is deterministic WITHIN a task attempt, so
    *    a retry or losing speculative attempt overwrites its own earlier
    *    files instead of duplicating documents (commit idempotency).
    * Stands in for a doc-store client. */
  final class LocalJsonBatchWriter(dir: String) extends BatchWriter {
    private val writerId = java.util.UUID.randomUUID().toString.take(8)
    // Deserialized fresh per task, so the counter restarts per partition
    // attempt — retries regenerate the same file names.
    private var batchIndex = -1
    def commit(batch: Seq[(String, String, String)]): Int = {
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val stage = tc.stageId()
      batchIndex += 1
      Files.createDirectories(Paths.get(dir))
      val out = Paths.get(dir, f"batch-$writerId-$stage%05d-$pid%05d-$batchIndex%05d.json")
      val sb = new StringBuilder
      batch.foreach { case (c, id, data) =>
        sb.append(s"""{"collection":${q(c)},"document_id":${q(id)},"data":${q(data)}}""")
          .append('\n')
      }
      Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      batch.size
    }
    private def q(s: String): String = JsonEscape(s)
  }

  /** Outcome of a batched upload (pac_snowflake_pipeline.py:361-365). */
  final case class UploadReport(total: Long, succeeded: Long) {
    def ratio: Double = if (total == 0) 1.0 else succeeded.toDouble / total
    /** The reference's pass criterion: ≥ 80 % of records uploaded. */
    def ok: Boolean = ratio >= 0.8
  }

  /** S8: batched sink — executor-side batching with per-record success
    * accounting. Each partition buffers `batchSize` records and commits them
    * through the writer; a failed commit is counted (warn-and-continue,
    * pac_snowflake_pipeline.py:335-346), never fail-fast. Memory per task is
    * bounded by batchSize; no driver-side data movement.
    * `interBatchPauseMs` reproduces the reference's politeness pause between
    * batch commits (0.1 s sleep, pac_snowflake_pipeline.py:358-360) — per
    * task, for rate-limited document stores; 0 disables. */
  def writeBatched(records: DataFrame, writer: BatchWriter,
                   batchSize: Int = 1000,
                   interBatchPauseMs: Long = 0L): UploadReport = {
    val spark = records.sparkSession
    val total = spark.sparkContext.longAccumulator("docs_total")
    val succeeded = spark.sparkContext.longAccumulator("docs_succeeded")
    records.select("collection", "document_id", "data").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        var first = true
        rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
          .grouped(batchSize).foreach { batch =>
            if (!first && interBatchPauseMs > 0) Thread.sleep(interBatchPauseMs)
            first = false
            total.add(batch.size)
            try succeeded.add(writer.commit(batch))
            catch { case scala.util.control.NonFatal(e) =>
              // warn-and-continue (pac_snowflake_pipeline.py:335-346) — but
              // never silently: the loss must be visible in executor logs.
              System.err.println(
                s"[DocumentSink] batch of ${batch.size} failed in partition " +
                  s"${org.apache.spark.TaskContext.getPartitionId()}: ${e.getMessage}")
            }
          }
    }
    UploadReport(total.value, succeeded.value)
  }

  /** S11: dry-run — preview the first n documents instead of writing
    * (every reference sink has this flag, pac_data_processor.py:227-239).
    * `order` makes the preview deterministic (the reference previews
    * insertion order). */
  def dryRun(records: DataFrame, order: Seq[Column], n: Int = 5): DataFrame =
    records.orderBy(order: _*).limit(n)
}
