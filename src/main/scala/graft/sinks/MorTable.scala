package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read keyed table — the Iceberg/Delta MOR shape for the TABLE
  * tier, closing the asymmetry with the index tier (which already
  * tombstones: `deletePqCodes`, the band index's delete files): a merge
  * writes (a) one key-delete file set masking every base row it replaces
  * or removes and (b) the new/updated rows as appended data files, both
  * under a sequence-numbered PARTITION DIRECTORY (`__seq=N/` — Spark's
  * partition discovery derives the sequence column from the path), and
  * the READ folds them — a data row survives iff no delete with a
  * STRICTLY HIGHER sequence carries its key (an upsert's own tombstone
  * shares its sequence, so it masks every older version but never its
  * own row).
  *
  * The 100 TB point: [[graft.operators.Merge.applyChanges]] (the eager
  * form, j5) is one full-outer join that REWRITES the whole table per
  * merge — O(|table|) bytes moved for an O(|changeset|) change. MOR
  * writes O(|changeset|) bytes and leaves every base file untouched
  * (spec-pinned), paying instead one anti-join per read that
  * [[compact]] periodically folds away — the classic write-amplification
  * vs read-amplification trade, chosen per table by merge:read ratio.
  *
  * Commit discipline: each merge's sequence directories are written with
  * OVERWRITE, so replaying a failed merge at the same seq CONVERGES
  * (the foreachBatch retry model) instead of duplicating rows. Data
  * lands BEFORE tombstones: a crash between the two leaves transient
  * DUPLICATE visibility (old + new version of the upserted keys) until
  * the retry completes — recoverable and loud in any keyed consumer —
  * never silent row loss (tombstones-first would transiently DELETE
  * every upserted key). Sequences must increase across the table's
  * whole lifetime, including across compactions: [[compact]] re-stamps
  * the folded base at the maximum folded sequence, so stale tombstones
  * (all ≤ that sequence) mask nothing if a crash leaves them behind —
  * every crash point of the swap is either the old state, a loudly
  * missing data directory (the one-rename window), or the correct
  * folded state.
  *
  * Layout: `data/__seq=0/` holds the range-laid base (disjoint key
  * ranges per file — selective key predicates prune whole files by
  * parquet min/max); each merge adds `data/__seq=N/` (appends are not
  * range-laid; pruning degrades gracefully on them until compaction
  * re-lays, exactly the index tier's append-then-compact lifecycle) and
  * skinny `deletes/__seq=N/` (key) tombstones — changeset-sized, never
  * table-sized.
  */
object MorTable {

  private val SeqCol = "__seq"

  /** The table's CURRENT schema lives in a one-file sidecar
    * (`_schema/schema.json`), not in parquet footers — the Delta/Iceberg
    * schema-in-log move, for two reasons at once. (1) EVOLUTION: after
    * an additive merge the directory holds files of two physical widths;
    * single-footer inference returns whichever file it sampled (a later
    * merge pinned against an OLD footer would silently drop the new
    * column), and `mergeSchema` reads every footer — a distributed job
    * per read on a million-file table. The sidecar answers in one tiny
    * read. (2) NULL BACKFILL: pinning the widened schema on the reader
    * makes parquet fill the old files' missing columns with null — the
    * read-time backfill contract — with zero rewriting. Updated
    * atomically (temp + rename); readers pin either the pre- or
    * post-evolution schema, both of which read every file correctly
    * (a narrower schema ignores the new column; a wider one backfills).
    * Tables written before the sidecar existed fall back to footer
    * inference, preserving their behavior. */
  private val SchemaDir = "_schema"

  private def writeSchemaSidecar(spark: SparkSession, dir: String,
                                 schema: org.apache.spark.sql.types.StructType): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir, SchemaDir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(d): Unit
    val tmp = new org.apache.hadoop.fs.Path(d, ".schema.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(d, "schema.json")
    fs.delete(dst, false): Unit
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"schema sidecar publish failed: $tmp -> $dst")
  }

  private def readSchemaSidecar(spark: SparkSession, dir: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$SchemaDir/schema.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json =
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** The schema merges pin against and reads backfill to: the sidecar,
    * or (pre-sidecar tables) one sampled footer. */
  private def storedSchema(spark: SparkSession, dir: String)
      : org.apache.spark.sql.types.StructType =
    readSchemaSidecar(spark, dir).getOrElse(
      spark.read.parquet(s"$dir/data").drop(SeqCol).schema)

  /** Write the initial snapshot as the sequence-0 base, range-laid on
    * `keyCol` so every data file covers a disjoint key range. */
  def writeBase(df: DataFrame, dir: String, keyCol: String,
                numFiles: Int = 16): Unit = {
    require(!df.columns.contains(SeqCol),
      s"column name $SeqCol is reserved by MorTable")
    LayoutSink.writeRangeLayout(df, keyCol, numFiles, s"$dir/data/$SeqCol=0")
    writeSchemaSidecar(df.sparkSession, dir, df.schema)
  }

  /** Apply a keyed changeset — the same contract as
    * [[graft.operators.Merge.applyChanges]] (op "U" upserts, "D"
    * deletes, one op per key) — WITHOUT touching any existing file:
    * the upsert rows land as `data/__seq=N/` and every changed key
    * tombstones at `deletes/__seq=N/` (masking all older versions at
    * read; the upserts survive their own tombstone by the
    * strictly-higher rule). Both directories are OVERWRITE-written, so
    * retrying a failed merge at the same seq converges. `seq` must
    * exceed every sequence the table has ever carried (see the class
    * doc; [[compact]] re-stamps the base at the folded maximum).
    *
    * ADDITIVE SCHEMA EVOLUTION: a changeset may carry columns the table
    * has never seen — a real CDC feed evolves. New columns append to
    * the stored schema (this merge's files carry them physically; every
    * OLDER file null-backfills at read through the widened sidecar,
    * zero bytes rewritten; [[compact]] materializes the width), and the
    * sidecar publishes the widened schema AFTER this merge's data lands
    * (either crash order reads correctly — see [[SchemaDir]]). Columns
    * may never be DROPPED by a changeset: a missing stored column fails
    * loudly (a silently null-filled column is how a misconfigured
    * upstream eats a table). Existing columns COERCE to the stored type
    * (the ANSI cast below — an incompatible feed fails at write time,
    * never corrupts the directory). */
  def merge(changes: DataFrame, dir: String, keyCol: String, opCol: String,
            seq: Long): Unit = {
    require(seq >= 1L, "merge sequence numbers start at 1 (base is 0)")
    val spark = changes.sparkSession
    // data BEFORE tombstones — see the class doc's commit discipline.
    // Column order AND types pinned to the stored schema: parquet
    // readers take the first footer's ordering, and a physically wider
    // append (e.g. a change feed that decoded keys as long against an
    // int base) would fail every later read of the mixed directory —
    // the cast aligns at write time, where a narrowing ANSI cast fails
    // loudly instead of corrupting.
    val dataSchema = storedSchema(spark, dir)
    val changeCols = changes.columns.filterNot(_ == opCol)
    val missing = dataSchema.fieldNames.filterNot(changeCols.contains)
    require(missing.isEmpty,
      s"changeset must carry every stored column (evolution is additive " +
        s"only): missing ${missing.mkString(", ")}")
    val newCols = changeCols.filterNot(dataSchema.fieldNames.contains)
    require(!newCols.contains(SeqCol), s"column name $SeqCol is reserved")
    val aligned =
      dataSchema.map(f => col(f.name).cast(f.dataType).as(f.name)) ++
        newCols.map(col(_))
    changes.filter(col(opCol) =!= "D").drop(opCol)
      .select(aligned.toIndexedSeq: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/data/$SeqCol=$seq")
    if (newCols.nonEmpty) {
      val widened = newCols.foldLeft(dataSchema)((acc, n) =>
        acc.add(changes.schema(n)))
      writeSchemaSidecar(spark, dir, widened)
    }
    changes
      .select(col(keyCol).cast(dataSchema(keyCol).dataType).as(keyCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/deletes/$SeqCol=$seq")
  }

  /** The folded current state: scan ∪ anti-join on the tombstones. ONE
    * equi anti-join on the key with the sequence comparison riding the
    * join condition — the delete side is changeset-sized, so AQE
    * broadcasts it onto the data scan, and the base files' key pruning
    * (and any pushed predicate the caller adds above) is untouched. */
  def read(spark: SparkSession, dir: String, keyCol: String): DataFrame =
    foldTombstones(spark, dir, readData(spark, dir, None), keyCol)

  /** The data scan, schema pinned from the sidecar: files older than an
    * additive evolution null-backfill their missing columns right in
    * the parquet reader (no footer scans, no rewrite); pre-sidecar
    * tables keep their footer-inferred behavior. `files` narrows the
    * scan to a selected file subset (the skip-index point-lookup path)
    * with `basePath` pinned so the `__seq=N` path component still
    * derives the sequence column. */
  private def readData(spark: SparkSession, dir: String,
                       files: Option[Seq[String]]): DataFrame = {
    val reader = readSchemaSidecar(spark, dir) match {
      case Some(sc) => spark.read
        .schema(sc.add(SeqCol, org.apache.spark.sql.types.LongType))
      case None => spark.read
    }
    files match {
      case Some(fs) =>
        reader.option("basePath", s"$dir/data").parquet(fs: _*)
      case None => reader.parquet(s"$dir/data")
    }
  }

  /** The fold every MOR read shares: a data row survives iff no delete
    * with a strictly higher sequence carries its key (class doc). */
  private def foldTombstones(spark: SparkSession, dir: String,
                             data: DataFrame, keyCol: String): DataFrame = {
    val delPath = new org.apache.hadoop.fs.Path(s"$dir/deletes")
    val fs = delPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delPath))
      return data.drop(SeqCol) // freshly compacted / never merged
    // a crashed FIRST merge can leave deletes/ holding a seq dir with no
    // part files yet (data lands before tombstones, and Overwrite
    // creates the directory before writing) — zero parquet files cannot
    // infer a schema, and the documented crash window must read as
    // transient duplicates, not as an unreadable table
    val hasParts = {
      val it = fs.listFiles(delPath, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    if (!hasParts) return data.drop(SeqCol)
    val dels = spark.read.parquet(s"$dir/deletes")
      .select(col(keyCol).as("__del_key"), col(SeqCol).as("__del_seq"))
    data.join(dels,
        data(keyCol) === col("__del_key") && col("__del_seq") > data(SeqCol),
        "left_anti")
      .drop(SeqCol)
  }

  /** FOLDED point lookup through a [[BloomSkipIndex]] sidecar — the
    * 100 TB answer to "fetch these keys from a table that merges all
    * day": the indexed base files prune through the Bloom probe (the
    * sidecar covers whatever files existed at its last refresh), every
    * file the index has NOT yet seen is read too (between maintenance
    * windows those are the newest merges — CHANGESET-sized, the same
    * rows a log-structured store's memtable check pays), and the
    * tombstone fold + exact key predicate run on that union — so the
    * result equals `read(...).filter(key IN ...)` at every point of the
    * merge/maintain lifecycle, while touching ~|keys| base files + the
    * un-indexed tail instead of the whole table. Index staleness is
    * harmless in BOTH directions: files the index has not seen are
    * always included, and index rows whose file no longer exists (a
    * compaction ran, the refresh has not) are dropped against the live
    * listing — the removed files' rows were folded into new files,
    * which are unindexed and therefore read. Selection stays
    * exact-per-file, so the lookup never returns a wrong row. */
  def lookupThroughIndex(spark: SparkSession, dir: String, keyCol: String,
                         indexDir: String, keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "empty key set")
    val dataDir = s"$dir/data"
    val live = BloomSkipIndex.listDataFiles(spark, dataDir)
    val liveCanon = live.map(BloomSkipIndex.canonicalPath).toSet
    val surviving = BloomSkipIndex.matchingFiles(spark, indexDir, keys)
      .filter(f => liveCanon(BloomSkipIndex.canonicalPath(f)))
    val indexed = spark.read.parquet(indexDir).select("file").collect()
      .map(r => BloomSkipIndex.canonicalPath(r.getString(0))).toSet
    val unindexed = live
      .filterNot(f => indexed(BloomSkipIndex.canonicalPath(f)))
    val files = (surviving ++ unindexed).distinct
    val folded =
      if (files.isEmpty) {
        val schema = readData(spark, dir, None).drop(SeqCol).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else
        foldTombstones(spark, dir, readData(spark, dir, Some(files)), keyCol)
    folded.filter(col(keyCol).isin(keys: _*))
  }

  /** Fold the tombstones into a fresh range-laid base and clear them —
    * the maintenance pass that caps read-side anti-join cost (the table
    * twin of the index tier's code compaction). The folded base is
    * re-stamped at the MAXIMUM folded sequence, which makes every crash
    * point of the swap safe (class doc): any stale tombstone a crash
    * leaves behind is ≤ that sequence and masks nothing. Single
    * maintainer at a time, like [[LayoutSink.compact]]. */
  def compact(spark: SparkSession, dir: String, keyCol: String,
              numFiles: Int = 16): Unit = {
    val data = spark.read.parquet(s"$dir/data")
    val maxSeq = data.agg(max(col(SeqCol)).cast("long")).head().getLong(0)
    val folded = read(spark, dir, keyCol)
    val conf = spark.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(base, "_compact_tmp")
    fs.delete(tmp, true): Unit
    LayoutSink.writeRangeLayout(folded, keyCol, numFiles,
      new org.apache.hadoop.fs.Path(tmp, s"$SeqCol=$maxSeq").toString)
    val dataDir = new org.apache.hadoop.fs.Path(base, "data")
    val old = new org.apache.hadoop.fs.Path(base, "_data_old")
    fs.delete(old, true): Unit
    if (!fs.rename(dataDir, old))
      throw new java.io.IOException(s"rename $dataDir -> $old returned false")
    if (!fs.rename(tmp, dataDir)) {
      // roll back so the table is never left without a data dir; the
      // tombstones are still in place, so the rolled-back state is the
      // exact pre-compaction table
      fs.rename(old, dataDir): Unit
      throw new java.io.IOException(s"rename $tmp -> $dataDir returned false")
    }
    fs.delete(old, true): Unit
    // pure cleanup: every tombstone is ≤ maxSeq and the folded rows sit
    // AT maxSeq, so leftovers mask nothing if this delete never runs
    fs.delete(new org.apache.hadoop.fs.Path(base, "deletes"), true): Unit
  }
}
