package graft.sinks

import org.apache.spark.sql.SparkSession

/** The TABLE TIER's nightly maintenance loop (round-17 verdict #5) — the
  * pieces exist separately ([[MorTable.compact]], [[BloomSkipIndex.update]],
  * [[LayoutSink.appendExactlyOnceManifest]]); this is the production
  * composition a 100 TB deployment actually schedules:
  *
  *  1. TRIGGER — compact only when the tombstone backlog crosses a
  *     threshold (merge batches since the last fold). Unconditional
  *     nightly compaction rewrites the whole table every night whether
  *     one row or a billion changed; the threshold makes maintenance
  *     cost proportional to merge activity.
  *  2. FOLD — [[MorTable.compact]]: tombstones folded into a fresh
  *     range-laid base, read-side anti-join cost reset to zero.
  *  3. INDEX REFRESH — [[BloomSkipIndex.update]] over the folded data
  *     dir: drops rows for the files compaction removed, folds the new
  *     base files, so point lookups keep pruning. (Between maintenance
  *     windows, lookups stay CORRECT without the refresh —
  *     [[MorTable.lookupThroughIndex]] always reads unindexed files —
  *     the refresh restores the pruning, not the correctness.)
  *  4. PUBLISH — the folded state exported as a manifest-committed
  *     immutable snapshot ([[LayoutSink.appendExactlyOnceManifest]],
  *     batch id = the fold's max sequence): downstream consumers read a
  *     frozen, exactly-once-committed table while the MOR side keeps
  *     merging; a replayed maintenance run (same backlog → same batch
  *     id) short-circuits at the manifest instead of double-publishing.
  *
  * Crash points: each stage is individually crash-safe by its own
  * contract (compact's two-rename swap + re-stamped sequences, the skip
  * index's repairPublish, the manifest's create-if-absent seal), and the
  * stages are ordered so a crash between any two leaves a table that the
  * NEXT maintenance run (or next read) repairs: post-compact/pre-refresh
  * lookups read extra files but stay exact; post-refresh/pre-publish
  * just re-publishes on retry.
  */
object TableMaintenance {

  /** One maintenance pass over a [[MorTable]] at `dir`. Returns true iff
    * the backlog met `minTombstoneBatches` and the fold+refresh+publish
    * ran; false = nothing to do (the cheap no-op a nightly scheduler
    * calls unconditionally). `snapshotDir`, when set, receives the
    * manifest-committed export of the folded state. */
  def maintain(spark: SparkSession, dir: String, keyCol: String,
               indexDir: String, snapshotDir: Option[String],
               minTombstoneBatches: Int): Boolean = {
    require(minTombstoneBatches >= 1, "threshold must be at least one batch")
    if (tombstoneBatches(spark, dir) < minTombstoneBatches) return false
    // max folded sequence BEFORE compact clears it — the publish batch id
    val maxSeq = spark.read.parquet(s"$dir/data")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("__seq")).cast("long"))
      .head().getLong(0)
    MorTable.compact(spark, dir, keyCol)
    BloomSkipIndex.update(spark, s"$dir/data", keyCol, indexDir)
    snapshotDir.foreach { snap =>
      LayoutSink.appendExactlyOnceManifest(
        MorTable.read(spark, dir, keyCol), snap, maxSeq): Unit
    }
    true
  }

  /** The merge backlog: distinct tombstone sequence directories since
    * the last fold — a pure LISTING of `deletes/` (metadata-sized),
    * never a data read, so the no-op path costs one directory list. */
  def tombstoneBatches(spark: SparkSession, dir: String): Int = {
    val delPath = new org.apache.hadoop.fs.Path(s"$dir/deletes")
    val fs = delPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delPath)) 0
    else fs.listStatus(delPath)
      .count(st => st.isDirectory && st.getPath.getName.startsWith("__seq="))
  }
}
