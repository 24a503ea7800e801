package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read keyed table — the Iceberg/Delta MOR shape for the TABLE
  * tier, closing the asymmetry with the index tier (which already
  * tombstones: `deletePqCodes`, the band index's delete files): a merge
  * writes (a) one key-delete file masking every base row it replaces or
  * removes and (b) the new/updated rows as an appended data file, both
  * stamped with a monotonically increasing sequence number, and the READ
  * folds them — a data row survives iff no delete with a STRICTLY HIGHER
  * sequence carries its key (an upsert's own tombstone shares its
  * sequence, so it masks every older version but never its own row).
  *
  * The 100 TB point: [[graft.operators.Merge.applyChanges]] (the eager
  * form, j5) is one full-outer join that REWRITES the whole table per
  * merge — O(|table|) bytes moved for an O(|changeset|) change. MOR
  * writes O(|changeset|) bytes and leaves every base file untouched
  * (spec-pinned), paying instead one anti-join per read that
  * [[compact]] periodically folds away — the classic write-amplification
  * vs read-amplification trade, chosen per table by merge:read ratio.
  *
  * Layout: `data/` holds the range-laid base (seq 0, disjoint key ranges
  * per file — selective key predicates prune whole files by parquet
  * min/max) plus one appended file set per merge (appends are not
  * range-laid; pruning degrades gracefully on them until compaction
  * re-lays, exactly the index tier's append-then-compact lifecycle).
  * `deletes/` holds skinny (key, __seq) tombstone files — changeset-
  * sized, never table-sized.
  */
object MorTable {

  private val SeqCol = "__seq"

  /** Write the initial snapshot as the sequence-0 base, range-laid on
    * `keyCol` so every data file covers a disjoint key range. */
  def writeBase(df: DataFrame, dir: String, keyCol: String,
                numFiles: Int = 16): Unit = {
    require(!df.columns.contains(SeqCol),
      s"column name $SeqCol is reserved by MorTable")
    LayoutSink.writeRangeLayout(df.withColumn(SeqCol, lit(0L)),
      keyCol, numFiles, s"$dir/data")
  }

  /** Apply a keyed changeset — the same contract as
    * [[graft.operators.Merge.applyChanges]] (op "U" upserts, "D"
    * deletes, one op per key) — WITHOUT touching any existing file:
    * every changed key tombstones at `seq` (masking all older versions
    * of that key at read), and the upsert rows append as new data files
    * at the same `seq` (surviving their own tombstone by the
    * strictly-higher rule). `seq` must increase across merges on the
    * same table; replaying a merge at the same seq is NOT idempotent —
    * route replay-prone callers through a batch-id commit layer
    * ([[LayoutSink.appendExactlyOnce]]'s contract). */
  def merge(changes: DataFrame, dir: String, keyCol: String, opCol: String,
            seq: Long): Unit = {
    require(seq >= 1L, "merge sequence numbers start at 1 (base is 0)")
    val spark = changes.sparkSession
    changes.select(col(keyCol), lit(seq).as(SeqCol))
      .write.mode(SaveMode.Append).parquet(s"$dir/deletes")
    // column order pinned to the stored schema: parquet readers take the
    // first footer's ordering, so an append with permuted columns would
    // corrupt the fold
    val dataCols = spark.read.parquet(s"$dir/data").columns
    changes.filter(col(opCol) =!= "D").drop(opCol)
      .withColumn(SeqCol, lit(seq))
      .select(dataCols.map(col).toIndexedSeq: _*)
      .write.mode(SaveMode.Append).parquet(s"$dir/data")
  }

  /** The folded current state: scan ∪ anti-join on the tombstones. ONE
    * equi anti-join on the key with the sequence comparison riding the
    * join condition — the delete side is changeset-sized, so AQE
    * broadcasts it onto the data scan and the base files' key pruning
    * (and any pushed predicate the caller adds above) is untouched. */
  def read(spark: SparkSession, dir: String, keyCol: String): DataFrame = {
    val data = spark.read.parquet(s"$dir/data")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/deletes")
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deletes")))
      return data.drop(SeqCol) // freshly compacted / never merged
    val dels = spark.read.parquet(s"$dir/deletes")
      .select(col(keyCol).as("__del_key"), col(SeqCol).as("__del_seq"))
    data.join(dels,
        data(keyCol) === col("__del_key") && col("__del_seq") > data(SeqCol),
        "left_anti")
      .drop(SeqCol)
  }

  /** Fold the tombstones into a fresh sequence-0 range-laid base and
    * clear them — the maintenance pass that caps read-side anti-join
    * cost (the table twin of the index tier's code compaction). The
    * swap is write-new → rename-old-out → rename-new-in → delete-old,
    * the same same-filesystem rename discipline as the rest of the sink
    * tier (see [[LayoutSink.appendExactlyOnce]]'s S3 caveat — a
    * rename-less store needs a manifest commit instead). */
  def compact(spark: SparkSession, dir: String, keyCol: String,
              numFiles: Int = 16): Unit = {
    val folded = read(spark, dir, keyCol)
    val conf = spark.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(base, "_compact_tmp")
    fs.delete(tmp, true): Unit
    LayoutSink.writeRangeLayout(folded.withColumn(SeqCol, lit(0L)),
      keyCol, numFiles, tmp.toString)
    val data = new org.apache.hadoop.fs.Path(base, "data")
    val old = new org.apache.hadoop.fs.Path(base, "_data_old")
    fs.delete(old, true): Unit
    if (!fs.rename(data, old))
      throw new java.io.IOException(s"rename $data -> $old returned false")
    if (!fs.rename(tmp, data)) {
      // roll back so the table is never left without a data dir
      fs.rename(old, data): Unit
      throw new java.io.IOException(s"rename $tmp -> $data returned false")
    }
    fs.delete(old, true): Unit
    fs.delete(new org.apache.hadoop.fs.Path(base, "deletes"), true): Unit
  }
}
