package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Per-FILE Bloom-filter skipping index over a parquet table — the
  * point-lookup sidecar Delta/Iceberg keep in their transaction logs
  * (engine extension; the reference's per-document upsert path
  * `pac_data_processor.py:263-276` re-reads its whole sink collection to
  * find one key, which is the anti-pattern this index retires at scale).
  *
  * Shape: ONE scan of the table folds each file's key hashes into an
  * nBits Bloom filter ([[graft.functions.BloomSketch]] — native typed
  * aggregate, no UDF), stored as a sidecar of (file, words, n_bits,
  * n_probes) rows — one row per data file, KILOBYTES per 100 GB of data.
  * A point lookup probes the sidecar (nFiles rows, never the table),
  * collects only the SURVIVING file names, and reads just those files
  * with the exact predicate re-applied — so the result is EXACT,
  * invariant to the filter's false-positive rate, and therefore
  * oracle-checkable against a plain filter on the source table.
  *
  * Why this beats footer min/max at 100 TB: parquet footers prune too,
  * but a reader must OPEN every footer to know — a million-file table
  * pays a million metadata round trips per lookup on an object store.
  * The sidecar answers the same question from ONE small parquet read,
  * and unlike min/max it keeps pruning when the key does not correlate
  * with the file layout, as long as each key lands in FEW files (the
  * clustered/point-lookup regime; for a key scattered uniformly across
  * every file no skipping index can help, and the filter honestly
  * selects every file).
  *
  * Geometry (n_bits, n_probes) RIDES WITH THE ARTIFACT and is validated
  * on every probe — a parameter/artifact mismatch fails loudly instead
  * of routing probes to wrong bit positions (the sharded-Bloom lesson:
  * a wrong-geometry probe is a silent false negative, the one error
  * class a Bloom consumer cannot detect downstream).
  *
  * Maintenance is O(|new files|): [[update]] diffs the table's file
  * listing against the indexed rows and folds ONLY unindexed files —
  * the append-then-maintain lifecycle shared with the band index and
  * the IVF-PQ codes. Compaction/rewrite of the table invalidates
  * removed files' rows; [[update]] also drops rows whose file no longer
  * exists, so a rebuild after compact touches exactly the new files. */
object BloomSkipIndex {

  /** Key hash shared by build and probe: the codegen'd builtin
    * `xxhash64` (FP-invariance makes oracle-replayable hashing
    * unnecessary — [[Bloom.sketch]] scaladoc). The key is canonicalized
    * to LONG first: Spark's hash functions are type-dependent (the same
    * numeric value hashes differently as int vs long), and the probe
    * side hashes Long literals — without the cast, an int-typed key
    * column would silently false-negative EVERY probe, the one error
    * class a Bloom consumer cannot detect downstream. */
  private def keyHash(c: org.apache.spark.sql.Column) =
    xxhash64(c.cast("long"))

  /** Canonical FULL-path form for diffing the stored `input_file_name()`
    * strings against the Hadoop listing: both are URI renderings of the
    * same path but spell scheme/encoding differently (`file:///x` vs
    * `file:/x`, percent-encoded vs raw). Decoding to the URI's path
    * component unifies them while keeping the partition directories —
    * basenames alone are NOT unique across a partitionBy layout (one job
    * emits identically-named part files into every partition dir), so a
    * basename diff can both strand stale rows and silently skip live
    * files. Falls back to the raw string only if URI parsing fails. */
  private[sinks] def canonicalPath(s: String): String =
    try {
      val p = new java.net.URI(s).getPath
      if (p == null || p.isEmpty) s else p
    } catch { case _: java.net.URISyntaxException => s }

  /** Build the sidecar in ONE table scan. Overwrites any prior index. */
  def write(spark: SparkSession, tablePath: String, keyCol: String,
            nBits: Int, nProbes: Int, indexDir: String): Unit = {
    spark.read.parquet(tablePath)
      .select(input_file_name().as("file"), keyHash(col(keyCol)).as("__h"))
      .groupBy("file")
      .agg(Bloom.sketch(col("__h"), nBits, nProbes).as("words"))
      .withColumn("n_bits", lit(nBits))
      .withColumn("n_probes", lit(nProbes))
      .coalesce(1) // one row per data file — metadata-sized by construction
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Fold files that appeared since the last build/update into the index
    * and drop rows for files that no longer exist — O(|changed files|)
    * data read, never a full table re-scan. Geometry comes from the
    * stored artifact (single-geometry invariant enforced). */
  def update(spark: SparkSession, tablePath: String, keyCol: String,
             indexDir: String): Unit = {
    repairPublish(spark, indexDir)
    val idx = spark.read.parquet(indexDir)
    val (nBits, nProbes) = geometry(idx)
    // diff on canonicalized FULL paths (partition dirs included): the
    // index stores input_file_name()'s URI rendering, the listing yields
    // Hadoop's — two spellings of one path must not read as distinct
    // files, and two partition dirs' identically-named part files must
    // not read as one (see canonicalPath)
    val indexedFiles = idx.select("file").collect().map(_.getString(0))
    val indexedCanon = indexedFiles.map(canonicalPath).toSet
    val live = listDataFiles(spark, tablePath)
    val liveCanon = live.map(canonicalPath).toSet
    val fresh = live.filterNot(f => indexedCanon(canonicalPath(f)))
    // survivors selected by the EXACT stored strings (driver-decided from
    // the canonical diff; the sidecar is metadata-sized so the broadcast
    // keep-list is too) — no column-side path parsing to get wrong
    val keep = indexedFiles.filter(s => liveCanon(canonicalPath(s))).toSeq
    val keptRows = idx.join(
      broadcast(spark.createDataFrame(keep.map(Tuple1(_))).toDF("file")), Seq("file"))
    val freshRows =
      if (fresh.isEmpty) None
      else Some(spark.read.parquet(fresh: _*)
        .select(input_file_name().as("file"), keyHash(col(keyCol)).as("__h"))
        .groupBy("file")
        .agg(Bloom.sketch(col("__h"), nBits, nProbes).as("words"))
        .withColumn("n_bits", lit(nBits))
        .withColumn("n_probes", lit(nProbes)))
    val next = freshRows.fold(keptRows)(keptRows.unionByName(_))
    // the sidecar is tiny — publish the rewrite with the two-rename swap
    // (MorTable.compact's discipline): stage, move the old dir aside,
    // move the stage in, then drop the old. An in-process rename failure
    // ROLLS BACK below; a hard crash between the two renames leaves the
    // index dir missing with a COMPLETE _next (written before any
    // rename) and a COMPLETE _old beside it — repairPublish() at the
    // next entry point renames one back (preferring _next, the newer
    // state), so recovery is automatic, not manual. Never
    // delete-before-replace (whose crash window loses the index
    // outright).
    val tmp = new org.apache.hadoop.fs.Path(indexDir + "_next")
    next.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(indexDir + "_old")
    fs.delete(old, true): Unit
    if (!fs.rename(p, old))
      throw new java.io.IOException(
        s"rename $indexDir -> $old returned false; index unchanged")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p): Unit // roll back — never leave the index missing
      throw new java.io.IOException(
        s"rename $tmp -> $indexDir returned false; old index restored")
    }
    fs.delete(old, true): Unit
  }

  /** Self-repair for a hard crash inside [[update]]'s two-rename publish:
    * if the index dir is missing but a staged `_next` (complete — fully
    * written before either rename starts) or the set-aside `_old` exists,
    * rename it back into place. Prefer `_next`: a crash between the two
    * renames means the new index was already durable, so repair completes
    * the publish rather than rewinding it. Called on entry to every
    * reader/maintainer so recovery needs no operator action. */
  private def repairPublish(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      val next = new org.apache.hadoop.fs.Path(indexDir + "_next")
      val old = new org.apache.hadoop.fs.Path(indexDir + "_old")
      if (fs.exists(next)) {
        if (!fs.rename(next, p))
          throw new java.io.IOException(s"repair rename $next -> $indexDir failed")
        fs.delete(old, true): Unit
      } else if (fs.exists(old)) {
        if (!fs.rename(old, p))
          throw new java.io.IOException(s"repair rename $old -> $indexDir failed")
      }
    }
  }

  /** The data files the index's probes can select — the same set a
    * plain `spark.read.parquet(tablePath)` would scan: RECURSIVE, so a
    * partitioned layout (dir/part=x/…) diffs against the same files
    * [[write]] indexed (a top-level-only listing would see zero files
    * there and [[update]] would commit an EMPTY sidecar over a good
    * one), and `_`/`.`-prefixed path components are skipped at EVERY
    * level exactly like Spark's file index (staging dirs, markers). */
  private[sinks] def listDataFiles(spark: SparkSession,
                            tablePath: String): Array[String] = {
    val dir = new org.apache.hadoop.fs.Path(tablePath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val root = dir.toUri.getPath
    val out = Array.newBuilder[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root)
      // Spark's hidden rule EXEMPTS name=value components: a partition
      // dir like __seq=1 is data, not metadata — treating it hidden made
      // update() see zero live files over a MOR data dir and overwrite a
      // good sidecar with an empty one
      val hidden = rel.split('/').exists(c =>
        (c.startsWith("_") || c.startsWith(".")) && !c.contains("="))
      if (st.isFile && !hidden) out += st.getPath.toUri.toString
    }
    out.result()
  }

  /** The artifact's single (n_bits, n_probes) pair; mixed geometries or
    * an empty index fail loudly — see the object scaladoc. */
  private def geometry(idx: DataFrame): (Int, Int) = {
    val gs = idx.select("n_bits", "n_probes").distinct().collect()
    require(gs.length == 1,
      s"bloom skip index must carry exactly one geometry, found ${gs.length}")
    (gs(0).getInt(0), gs(0).getInt(1))
  }

  /** The files that MIGHT contain any of `keys` — the probe runs in
    * Spark over the sidecar rows (the filter words never collect to the
    * driver; only the surviving FILE NAMES do, which is bounded by the
    * listing the read needs anyway). Exposed for spec-level audits of
    * the no-false-negative contract. */
  def matchingFiles(spark: SparkSession, indexDir: String,
                    keys: Seq[Long]): Seq[String] = {
    require(keys.nonEmpty, "empty key set")
    repairPublish(spark, indexDir)
    val idx = spark.read.parquet(indexDir)
    val (nBits, nProbes) = geometry(idx)
    val hit = keys
      .map(k => Bloom.mightContain(col("words"), keyHash(lit(k)), nBits, nProbes))
      .reduce(_ || _)
    idx.filter(hit).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Exact point lookup THROUGH the index: probe → read only surviving
    * files (schema pinned from the table so pruning cannot change it;
    * `basePath` pinned so a partitioned layout's path-derived columns
    * survive the file-level selection instead of reading back null) →
    * exact IN filter. Zero surviving files short-circuits to an empty
    * frame without touching the table's data. */
  def lookup(spark: SparkSession, tablePath: String, indexDir: String,
             keyCol: String, keys: Seq[Long]): DataFrame = {
    val schema = spark.read.parquet(tablePath).schema
    val files = matchingFiles(spark, indexDir, keys)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.option("basePath", tablePath).schema(schema)
        .parquet(files: _*)
        .filter(col(keyCol).isin(keys: _*))
  }
}
