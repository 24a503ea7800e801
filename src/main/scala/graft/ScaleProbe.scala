package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe: blows the sf0.1 testdata up by an integer factor
  * (fresh ids per copy; document tokens namespaced per copy so the
  * near-dup screens see a 10× corpus, not 10 exact replicas of one) and
  * times selected queries at BOTH scales, printing the wall-clock
  * scaling ratio per query. The asymptotic claims the suite makes
  * (routed ANN touches ~nprobe/k of the corpus, incremental CC touches
  * the batch, screens are index-bounded) predict sub-linear-to-linear
  * ratios; a super-linear ratio is a scale bug this harness exists to
  * catch before a cluster does. Not part of the library surface.
  *
  * Usage: runMain graft.ScaleProbe [factor] [query ...]
  * Embedding copies keep their float values (pair-distance COST is
  * value-independent); document copies prefix every token with a
  * per-copy tag, so cross-copy Jaccard is 0 and the pair structure
  * scales like a real corpus (per-copy vocabulary, same doc lengths).
  */
object ScaleProbe {
  val SrcDir = "/root/testdata/sf0.1"

  val DefaultQueries: Seq[String] = Seq(
    "x72_ivfpq_topk", "x74_pq_append", "x75_ivfpq_indexed",
    "x76_pq_routed_knn", "x77_ivfpq_append", "x78_ivfpq_residual",
    "x80_routed_recall", "x81_ivfpq_compact", "x82_residual_recall",
    "x48_incremental_clusters", "pl8_nightly_ingest",
    // round-13 additions: the clustered recall pair, the residual
    // routed stored serve, and the drift-gated refresh pipeline
    "x86_clustered_recall", "x87_residual_routed_knn",
    "pl12_index_refresh",
    // second pass: the residual append lifecycle (corpus-proportional;
    // the graph gates x89/x91 are fixed-size by design and the KMV
    // gates are sub-second, so none of those probe)
    "x90_ivfpq_residual_append",
    // round-14 additions: the sliding-window dedup (window volume and
    // the flagged-interval fan-out both corpus-proportional) and the two
    // BPE gates (iterative window passes + corpus-wide pair counts —
    // shuffle-heaviest of the text tier); x98/x99 bloom gates are
    // sub-second serve paths and don't probe
    "x97_substring_dedup", "x100_bpe_merges", "x101_bpe_apply",
    "x102_self_repetition", "x104_span_corruption",
    // round-15 additions: the local-state BPE serve and its sampled-
    // training twin (corpus-proportional apply passes), the pl8 funnel
    // with its new Bloom front door is already listed, the indexed
    // hard-negative serve (codes-scan-proportional), and the bit-level
    // bloom lifecycle gate (history-proportional build + screen)
    "x105_bpe_apply_local", "x106_bpe_sampled",
    "x107_hard_negatives_indexed", "x109_hard_negatives_routed",
    "pl14_bloom_rotate",
    // round-16 additions: the sharded bloom lifecycle (history-
    // proportional per-shard build + routed screen), the batched BPE
    // trainer (same scans as serial at 1/N the iterations), and the
    // training-pair export funnel (routed mining + CC split + pack)
    "x110_sharded_bloom_rotate", "x111_bpe_batched", "pl15_training_pairs",
    "x112_adaptive_nprobe", "x113_hard_positive_recall",
    "x114_adaptive_nprobe_refresh",
    // round-17 additions: the OPQ lifecycle (fit + rotated index build
    // are corpus-proportional; the append is batch-proportional), the
    // post-maintenance adaptive-nprobe serve, the trained lang-ID fit
    // and the unigram tokenizer serve (corpus-proportional scans), the
    // lang-routed curation funnel, the AVI demux (payload-proportional
    // chunk walk), and the bloom skip index build+lookup (build is
    // table-proportional, the lookup must stay file-pruned); s22 is
    // metadata-sized and x116 is a double-fit measurement gate — no
    // probe value
    "x115_opq_serve", "x117_adaptive_nprobe_lifecycle",
    "x119_langid_train", "x121_unigram_apply", "x122_opq_append",
    "x123_avi_demux", "x125_warc_gzip", "pl16_multilingual_curation",
    "pl17_warc_ingest", "s21_bloom_skip",
    // round-18 additions: the filtered routed serve + its recall grid
    // (codes-scan- and grid-proportional), the OPQ delete→compact→refit
    // lifecycle (fit + two curve fits corpus-proportional), the evolved
    // MOR merge/compact pair and the nightly maintenance funnel
    // (changeset-proportional merges, fold-proportional compaction),
    // the WARC record demux (payload-proportional member+record walk),
    // and both byte-fallback tokenizer serves (corpus-proportional
    // apply passes over the decorated corpus)
    "x126_filtered_knn", "x128_filtered_knn_recall", "x129_opq_lifecycle",
    "j12_mor_evolve", "j13_mor_evolve_compact", "pl18_table_maintenance",
    "x127_warc_records", "x130_unigram_byte_fallback",
    "x131_bpe_byte_fallback", "x132_filtered_adaptive_serve",
    "s23_warc_file_scan", "x133_kn_perplexity", "pl19_crawl_to_shards",
    // the FLAC roundtrip is corpus-proportional (encode+decode per doc
    // inside the scan partition); the Delta export's commits are
    // slice-proportional and its delete O(|affected files|); the
    // lakehouse publish is base-proportional at bootstrap then
    // changeset-proportional per incremental merge commit
    "x134_flac_roundtrip", "s24_delta_export", "pl20_lakehouse_publish",
    // stats skipping reads O(matching files) behind the log's min/max
    // (the pruning decision itself is O(live files) metadata); OPTIMIZE
    // is rewrite-proportional in the compacted bytes
    "s25_delta_stats_skip", "s26_delta_optimize",
    // the change feed is changeset-proportional: pre/post images come
    // from key-affected files only, inserts/deletes from the changeset;
    // the z-order rewrite is data-proportional once (like OPTIMIZE), and
    // pl23's loop is changeset- plus rewrite-proportional
    "j15_delta_cdf", "s27_delta_zorder", "pl23_delta_maintenance",
    // the MP3 and H.264 walks are payload-proportional inside the scan
    // partition, as is the whole triage funnel above them
    "x135_mp3_framing", "x136_h264_nalu", "pl21_media_triage",
    "pl22_crawl_media_triage",
    // the evolved export merge is changeset-proportional plus the
    // key-affected file rewrites
    "j14_delta_evolve", "x137_flac_stereo")

  def main(args: Array[String]): Unit = {
    // "[factor] [query ...]": the factor is optional even when queries
    // are passed — a leading non-numeric arg is a query name.
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val rest = if (args.headOption.exists(_.toIntOption.isDefined))
      args.drop(1).toSeq else args.toSeq
    val names = if (rest.nonEmpty) rest else DefaultQueries
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_scale_sf0.1x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: driver heap cannot be set here — the JVM is already
      // running. build.sbt's forked `run` sets -Xmx (SPARK_DRIVER_MEM,
      // default 8g), which is what actually governs the 10x blow-up.
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)

    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      println(s"building ${factor}x blow-up at $outDir ...")
      blowUpEmbeddings(spark, factor, outDir)
      blowUpDocuments(spark, factor, outDir)
    }
    // lineitem joined the probe corpus in round 17 (s21); build it even
    // into a pre-round-17 blow-up dir
    if (!new java.io.File(s"$outDir/lineitem.parquet").exists())
      blowUpLineitem(spark, factor, outDir)
    // customer joined in round 18 (the MOR evolution/maintenance gates);
    // its modular changesets scale with the copies, so merges stay
    // changeset-proportional under the probe
    if (!new java.io.File(s"$outDir/customer.parquet").exists())
      blowUpCustomer(spark, factor, outDir)
    // orders joined in round 18 (the s24 Delta export commits slices of it)
    if (!new java.io.File(s"$outDir/orders.parquet").exists())
      blowUpOrders(spark, factor, outDir)
    println(f"${"query"}%-26s ${"sf0.1"}%9s ${s"sf0.1x$factor"}%9s  ratio")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def timed(dir: String): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        GraftCache.release(blocking = true)
        sec
      }
      try {
        timed(SrcDir) // warmup (JVM/codegen) on the small scale
        val base = timed(SrcDir)
        val big = timed(outDir)
        println(f"$name%-26s $base%8.2fs $big%8.2fs  ${big / base}%5.1fx")
      } catch {
        case e: Exception =>
          println(f"$name%-26s ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  /** factor copies with disjoint id ranges: copy i shifts ids by
    * i × (max_id + 1). Vector values are kept — ANN cost per candidate
    * pair is value-independent, and the quantizer chains only care
    * about row count. */
  private def blowUpEmbeddings(spark: SparkSession, factor: Int,
                               outDir: String): Unit = {
    val e = spark.read.parquet(s"$SrcDir/embeddings.parquet")
    val offset = e.agg(max("vec_id")).head.getLong(0) + 1
    val rest = e.columns.filterNot(_ == "vec_id").map(col).toSeq
    (0 until factor).map { i =>
      e.select((col("vec_id") + lit(i * offset)).as("vec_id") +: rest: _*)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** factor copies with disjoint ORDER key ranges (copy i shifts
    * l_orderkey like the embedding ids) — s21's bloom skip index then
    * faces a genuinely 10×-larger table and key domain. */
  private def blowUpLineitem(spark: SparkSession, factor: Int,
                             outDir: String): Unit = {
    val l = spark.read.parquet(s"$SrcDir/lineitem.parquet")
    val offset = l.agg(max("l_orderkey")).head.getLong(0) + 1
    val rest = l.columns.filterNot(_ == "l_orderkey").map(col).toSeq
    (0 until factor).map { i =>
      l.select((col("l_orderkey") + lit(i * offset)).as("l_orderkey") +: rest: _*)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  /** factor copies with disjoint c_custkey ranges (copy i shifts by
    * i × (max_key + 1) — far below the +10M insert-key shift the MOR
    * changesets use, so no collision at any probe factor). */
  private def blowUpCustomer(spark: SparkSession, factor: Int,
                             outDir: String): Unit = {
    val c = spark.read.parquet(s"$SrcDir/customer.parquet")
    val offset = c.agg(max("c_custkey")).head.getLong(0) + 1
    val rest = c.columns.filterNot(_ == "c_custkey").map(col).toSeq
    (0 until factor).map { i =>
      c.select((col("c_custkey") + lit(i * offset)).as("c_custkey") +: rest: _*)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
  }

  private def blowUpOrders(spark: SparkSession, factor: Int,
                           outDir: String): Unit = {
    val o = spark.read.parquet(s"$SrcDir/orders.parquet")
    val offset = o.agg(max("o_orderkey")).head.getLong(0) + 1
    val rest = o.columns.filterNot(_ == "o_orderkey").map(col).toSeq
    (0 until factor).map { i =>
      o.select((col("o_orderkey") + lit(i * offset)).as("o_orderkey") +: rest: _*)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }

  /** factor copies with disjoint ids AND per-copy token namespaces
    * (every word prefixed `c<i>`), so copies are NOT near-duplicates of
    * each other: the LSH/banding screens face a genuinely 10×-larger
    * pair problem instead of 45 guaranteed exact-dup pairs per
    * document. Copy 0 is the original corpus verbatim. */
  private def blowUpDocuments(spark: SparkSession, factor: Int,
                              outDir: String): Unit = {
    val d = spark.read.parquet(s"$SrcDir/documents.parquet")
    val offset = d.agg(max("doc_id")).head.getLong(0) + 1
    (0 until factor).map { i =>
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\p{Alnum}+)", s"c$i$$1")
      d.withColumn("doc_id", col("doc_id") + lit(i * offset))
        .withColumn("text", text)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }
}
