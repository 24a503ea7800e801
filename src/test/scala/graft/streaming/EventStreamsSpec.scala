package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structured Streaming smoke: the streaming transforms must reproduce
  * their batch twins' results when fed the same files (SURVEY.md §2.9). */
class EventStreamsSpec extends SparkSpec {

  /** The file-stream source requires a directory; stage the events parquet
    * file into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** TEST-HARNESS streaming screen: each micro-batch runs the same
    * broadcast band join as batch query x39 against the static indexed
    * corpus and COLLECTS flagged pairs into a driver buffer for the
    * equivalence assertion below. Lives in test sources on purpose
    * (round-11 verdict): the unbounded driver buffer is the wrong shape
    * for production — the shippable screen is
    * [[EventStreams.screenArrivalsIndexed]], which reads the materialized
    * band index and appends flagged pairs to a parquet log with no driver
    * accumulation. */
  private def screenArrivalsToBuffer(
      arrivals: org.apache.spark.sql.DataFrame,
      indexed: org.apache.spark.sql.DataFrame,
      threshold: Double,
      checkpointDir: String,
      hits: scala.collection.mutable.Buffer[(Long, Long, Double)])
    : org.apache.spark.sql.streaming.StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val pairs = graft.operators.TextOps
          .minhashNearDupsAgainst(batch, indexed, "doc_id", "text", threshold)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        graft.GraftCache.release()
        hits.synchronized { hits ++= pairs }
        ()
      }
      .start()

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling counts equal the batch window aggregation") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.tumblingCounts(stream), "w1_stream", "complete")
    val streamed = spark.table("w1_stream")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = graft.queries.WindowQueries.queries("w1_tumbling_window")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming dedup on event_id passes distinct events through") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.dedupEvents(stream)
      .select("event_id", "user_id", "event_type"), "dedup_stream", "append")
    val n = spark.table("dedup_stream").count()
    val distinctIds = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .events.select(countDistinct(col("event_id"))).head.getLong(0)
    assert(n === distinctIds)
  }

  test("foreachBatch document sink delivers each event exactly once") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val reports = scala.collection.mutable.Buffer.empty[graft.sinks.DocumentSink.UploadReport]
    val q = EventStreams.streamToDocumentSink(
      EventStreams.readEvents(spark, eventsDir),
      new graft.sinks.DocumentSink.LocalJsonBatchWriter(outDir),
      checkpointDir = java.nio.file.Files.createTempDirectory("graft-ckpt-sink").toString,
      batchSize = 128, reports = reports)
    q.processAllAvailable()
    q.stop()
    val delivered = spark.read.json(outDir)
    val expected = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .events.select(countDistinct(col("event_id"))).head.getLong(0)
    assert(delivered.count() === expected)
    assert(delivered.select("document_id").distinct().count() === expected)
    assert(reports.nonEmpty && reports.forall(_.ok))
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    import org.apache.spark.sql.functions._
    // Stage events as TWO files so maxFilesPerTrigger=1 forces two
    // micro-batches — the state must carry between them.
    val dir = java.nio.file.Files.createTempDirectory("graft-events-2batch").toString
    val batchEvents = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    // Split at the file's NATIVE schema (no pinned ts type — see
    // Tables.normalizeEventTs) and normalize the stream the same way the
    // production reader does.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/a")
    raw.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/b")
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(dir))
    val q = EventStreams.runningUserTotals(stream).toDF().writeStream
      .format("memory").queryName("running_totals").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt-state").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    // final state per user = the row with the highest running count
    val finalState = spark.table("running_totals")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("v_total"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.v_total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = batchEvents
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("value"), lit(0.0))).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finalState.keySet === expected.keySet)
    finalState.foreach { case (uid, (n, v)) =>
      assert(n === expected(uid)._1, s"user $uid count")
      assert(math.abs(v - expected(uid)._2) < 1e-6, s"user $uid total")
    }
  }

  test("stream-stream attribution join matches the batch join") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.attributionJoin(stream), "attr_stream", "append")
    val streamed = spark.table("attr_stream")
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    val batchEvents = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val batch = EventStreams.attributionJoin(batchEvents)
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming session windows produce per-user sessions") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.sessionCounts(stream), "w3_stream", "complete")
    val sessions = spark.table("w3_stream")
    assert(sessions.count() > 0)
    // every (user, session) is unique
    assert(sessions.count() ===
      sessions.select("user_id", "session_start").distinct().count())
  }

  test("stateful operators are state-store-invariant: the RocksDB provider " +
       "(the 100 TB-state production store) reproduces every result") {
    // Round-13 verdict task 7: the maintainers run on the default
    // HDFS-backed store in every other spec; at production state sizes
    // RocksDB is the provider, so nothing may depend on default-store
    // semantics. One pass over every state-store-backed operator FAMILY —
    // windowed agg, watermarked dedup, session windows, stream-stream
    // join, flatMapGroupsWithState — each compared to its batch twin or
    // its default-store run.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val steps = Seq("view", "click", "purchase")
    def funnelFinal(table: String): Map[Int, Long] =
      spark.table(table).groupBy("user_id").agg(max("stage").as("stage"))
        .groupBy("stage").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // default-store reference for the session/funnel shapes
    runToMemory(EventStreams.sessionCounts(
      EventStreams.readEvents(spark, eventsDir)), "w3_default_ref", "complete")
    runToMemory(EventStreams.funnelProgress(
        EventStreams.readEvents(spark, eventsDir), steps).toDF(),
      "funnel_default_ref", "update")
    val sessionsRef = spark.table("w3_default_ref")
      .orderBy("user_id", "session_start").collect().toSeq
    val funnelRef = funnelFinal("funnel_default_ref")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEvents(spark, eventsDir)
      // windowed aggregation state — equals the ORACLE-GATED batch twin
      runToMemory(EventStreams.tumblingCounts(stream), "w1_rocks", "complete")
      assert(spark.table("w1_rocks")
        .orderBy("window_start", "event_type").collect().toSeq ===
        graft.queries.WindowQueries.queries("w1_tumbling_window")(
          spark, "/root/testdata/sf0.001").collect().toSeq)
      // watermark-bounded dedup state
      runToMemory(EventStreams.dedupEventsBounded(stream)
        .select("event_id"), "dedup_rocks", "append")
      assert(spark.table("dedup_rocks").count() ===
        graft.sources.Tables(spark, "/root/testdata/sf0.001").events.count())
      // session-window state — identical sessions to the default store
      runToMemory(EventStreams.sessionCounts(stream), "w3_rocks", "complete")
      assert(spark.table("w3_rocks")
        .orderBy("user_id", "session_start").collect().toSeq === sessionsRef)
      // stream-stream join state — equals the batch join
      runToMemory(EventStreams.attributionJoin(stream), "attr_rocks", "append")
      assert(spark.table("attr_rocks")
        .orderBy("user_id", "click_id", "purchase_id").collect().toSeq ===
        EventStreams.attributionJoin(
            graft.sources.Tables(spark, "/root/testdata/sf0.001").events)
          .orderBy("user_id", "click_id", "purchase_id").collect().toSeq)
      // flatMapGroupsWithState (funnel machine) — same final stages as the
      // default store
      runToMemory(EventStreams.funnelProgress(stream, steps).toDF(),
        "funnel_rocks", "update")
      assert(funnelFinal("funnel_rocks") === funnelRef)
      assert(funnelRef.values.sum > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming corpus intake (quality gate + exact dedup) equals batch") {
    // Stage the corpus as TWO parquet files: with maxFilesPerTrigger=1 the
    // stream runs two micro-batches, so the keyed dedup state must carry
    // across triggers — one file would make state restore dead code here.
    val docsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-docs-split")
      graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
        .repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-docs-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      assert(parts.length == 2)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"docs_$i.parquet"))
      }
      dir.toString
    }
    val stream = EventStreams.readDocuments(spark, docsDir)
    runToMemory(EventStreams.curateDocuments(stream), "curate_stream", "append")
    // Compare the surviving CONTENT set (fp, n_tokens), not row identities:
    // when two docs share a fingerprint, keep-which-row under
    // dropDuplicates is nondeterministic in batch, deterministic-by-arrival
    // in streaming — the dedup contract is about the set of contents kept.
    def contents(df: org.apache.spark.sql.DataFrame) =
      df.select("fp", "n_tokens").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val streamed = contents(spark.table("curate_stream"))
    val batch = contents(EventStreams.curateDocuments(
      graft.sources.Tables(spark, "/root/testdata/sf0.001").documents))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the state-BOUNDED form: within one run (every arrival far inside
    // the horizon) it must keep exactly the same content set while its
    // dedup state stays watermark-reclaimable
    runToMemory(EventStreams.curateDocumentsBounded(
        EventStreams.readDocuments(spark, docsDir), "1 hour"),
      "curate_stream_bounded", "append")
    assert(contents(spark.table("curate_stream_bounded")) === batch)
  }

  test("streaming incremental near-dup screen equals the batch screen") {
    // Arriving docs (doc_id % 10 == 0) staged as TWO files → two
    // micro-batches; each is screened against the static indexed corpus
    // with the same broadcast band join as batch query x39.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val indexed = t.documents.filter(col("doc_id") % 10 =!= 0)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-arrivals-split")
      t.documents.filter(col("doc_id") % 10 === 0)
        .repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-arrivals-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      assert(parts.length == 2)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val hits = scala.collection.mutable.Buffer.empty[(Long, Long, Double)]
    val q = screenArrivalsToBuffer(
      EventStreams.readDocuments(spark, arrivalsDir), indexed, 0.8,
      java.nio.file.Files.createTempDirectory("graft-ckpt-screen").toString,
      hits)
    q.processAllAvailable()
    q.stop()
    val batch = graft.operators.TextOps.minhashNearDupsAgainst(
        t.documents.filter(col("doc_id") % 10 === 0), indexed,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(hits.nonEmpty)
    assert(hits.toSet === batch)
  }

  test("indexed streaming screen: parquet-sink pairs equal the batch screen") {
    // The production form: corpus band signatures MATERIALIZED once, each
    // micro-batch screened against the stored index, flagged pairs
    // appended to a parquet log — no driver-side accumulation.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val indexed = t.documents.filter(col("doc_id") % 10 =!= 0)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-band-index").toString
    graft.operators.TextOps.writeBandIndex(indexed, "doc_id", "text", idxDir)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-arr2-split")
      t.documents.filter(col("doc_id") % 10 === 0)
        .repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-arr2-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft-screen-log").toString
    val q = EventStreams.screenArrivalsIndexed(
      EventStreams.readDocuments(spark, arrivalsDir),
      spark.read.parquet(idxDir), indexed, 0.8,
      java.nio.file.Files.createTempDirectory("graft-ckpt-screen2").toString,
      outDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("id_new"), r.getAs[Long]("id_idx"),
        r.getAs[Double]("jaccard"))).toSet
    val batch = graft.operators.TextOps.minhashNearDupsAgainst(
        t.documents.filter(col("doc_id") % 10 === 0), indexed,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("semantic streaming screen: parquet-sink top-k equals batch ADC over the stored index") {
    // The ANN sibling of the indexed screen: PQ index materialized from
    // the standing base, each micro-batch of arriving vectors ADC-ranked
    // against the stored codes, per-arrival top-k logged — no corpus
    // vectors read, no driver accumulation.
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val cbs = graft.operators.VectorOps.pqCodebooks(
      base, "vec_id", "embedding", 64, 4, 8, 1)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString
    graft.operators.VectorOps.writePqIndex(base, "vec_id", "embedding", cbs, idxDir)
    val arrivals = e.filter(col("vec_id") % 10 === 0)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-sem-split")
      arrivals.repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-sem-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val codes = spark.read.parquet(s"$idxDir/codes")
    val outDir = java.nio.file.Files.createTempDirectory("graft-sem-log").toString
    val q = EventStreams.screenArrivalsSemantic(
      spark.readStream.schema(e.schema).option("maxFilesPerTrigger", 1)
        .parquet(arrivalsDir),
      codes, graft.operators.VectorOps.readPqCodebooks(spark, idxDir), 3,
      java.nio.file.Files.createTempDirectory("graft-ckpt-sem").toString,
      outDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("adc_d2"))).toSet
    val batch = graft.operators.VectorOps.pqKnnAgainstCodes(
        arrivals, "vec_id", "embedding", codes, 3, cbs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "per-arrival top-k is batch-partition-independent, so the " +
        "micro-batched stream must land on the identical pair log")
  }

  test("routed semantic screen: stream equals the routed batch join over the stored index") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val cent = graft.operators.VectorOps.kmeansCentroids(
      base, "vec_id", "embedding", 8, 1)
    val cbs = graft.operators.VectorOps.pqCodebooks(
      base, "vec_id", "embedding", 64, 4, 8, 1)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-s").toString
    graft.operators.VectorOps.writeIvfPqIndex(
      base, "vec_id", "embedding", cent, cbs, idxDir, numFiles = 4)
    val arrivals = e.filter(col("vec_id") % 10 === 0)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-sems-split")
      arrivals.repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-sems-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val centStored = spark.read.parquet(s"$idxDir/centroids")
    val codes = spark.read.parquet(s"$idxDir/codes")
    val cbsStored = graft.operators.VectorOps.readPqCodebooks(spark, idxDir)
    val outDir = java.nio.file.Files.createTempDirectory("graft-sems-log").toString
    val q = EventStreams.screenArrivalsSemanticRouted(
      spark.readStream.schema(e.schema).option("maxFilesPerTrigger", 1)
        .parquet(arrivalsDir),
      centStored, codes, cbsStored, 3, 2,
      java.nio.file.Files.createTempDirectory("graft-ckpt-sems").toString,
      outDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("adc_d2"))).toSet
    val batch = graft.operators.VectorOps.pqKnnAgainstCodesRouted(
        arrivals, "vec_id", "embedding", 3, 2, centStored, cbsStored, codes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "per-arrival routed top-k is batch-partition-independent, so the " +
        "micro-batched stream must land on the identical pair log")
  }

  test("streaming DSIR gate: parquet-sink scores equal batch stored-model scoring") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val corpus = t.documents.filter(col("doc_id") % 10 =!= 0)
    val modelDir = java.nio.file.Files.createTempDirectory("graft-dsir-model").toString
    graft.operators.Curation.writeDsirModel(corpus,
      corpus.filter(col("lang") === "en"), "text", modelDir, 4096)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-dsir-split")
      t.documents.filter(col("doc_id") % 10 === 0)
        .repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-dsir-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft-dsir-log").toString
    val q = EventStreams.scoreArrivalsDsir(
      EventStreams.readDocuments(spark, arrivalsDir),
      spark.read.parquet(modelDir), 4096,
      java.nio.file.Files.createTempDirectory("graft-ckpt-dsir").toString,
      outDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("log_weight_micro"))).toSet
    val batch = graft.operators.Curation.dsirScoreAgainstModel(
        t.documents.filter(col("doc_id") % 10 === 0),
        spark.read.parquet(modelDir), "doc_id", "text", 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "per-document scores are batch-partition-independent, so the " +
        "micro-batched stream must land on the identical score log")
    // Retention: the per-batch log compacts losslessly (the unbounded
    // small-file growth path closed the same way as the band index).
    val compactDir = java.nio.file.Files.createTempDirectory("graft-dsir-compact").toString
    EventStreams.compactLog(spark, outDir, compactDir, 64L * 1024 * 1024)
    val compacted = spark.read.parquet(compactDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("log_weight_micro"))).toSet
    assert(compacted === streamed, "compaction must be lossless")
    def parquetFiles(d: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(d))
    }
    assert(parquetFiles(compactDir) < parquetFiles(outDir),
      "compaction must reduce the file count of a multi-batch log")
  }

  test("streaming drift monitor: per-batch log rows equal batch corpusDrift") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val baseline = t.documents.filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "lang", "n_chars")
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-drift-split")
      t.documents.filter(col("doc_id") % 10 === 0)
        .select("doc_id", "lang", "n_chars")
        .repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-drift-stream")
      val parts = new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
      }
      dir.toString
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft-drift-log").toString
    val schema = baseline.schema
    val q = EventStreams.monitorDrift(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(arrivalsDir),
      baseline, "lang", "n_chars",
      java.nio.file.Files.createTempDirectory("graft-ckpt-drift").toString,
      outDir)
    q.processAllAvailable()
    q.stop()
    val logged = spark.read.parquet(outDir)
    // batch_id is the partition key now (replay-idempotent overwrite-per-
    // batch) — partition-value inference types it int.
    val batchIds = logged.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(batchIds.length >= 2, "one drift report per micro-batch")
    // every logged batch report equals the batch-mode drift of SOME file
    // slice, and every slice is reported exactly once (batch→file order
    // is the source's business, not the contract's)
    val perBatch = batchIds.map(b => logged.filter(col("batch_id") === b)
      .drop("batch_id").collect().map(_.toSeq).toSet).toSet
    val perSlice = new java.io.File(arrivalsDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        graft.operators.Curation
          .corpusDrift(baseline, spark.read.parquet(f.toString),
            "lang", "n_chars")
          .collect().map(_.toSeq).toSet
      }.toSet
    assert(perBatch === perSlice,
      "each logged per-batch report replays batch-mode corpusDrift over " +
        "exactly one arriving file slice")
  }

  test("streaming cluster maintenance converges to full from-scratch clustering") {
    // The complete nightly loop as a stream: corpus index + labels seeded,
    // two arrival micro-batches screened/merged/admitted in sequence. The
    // final label snapshot must equal CC over ALL pairs of the whole
    // table — including pairs between the two batches, which only exist
    // because batch 1 was admitted to the index before batch 2 screened.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val corpus = t.documents.filter(col("doc_id") % 10 =!= 0)
    val arrivals = t.documents.filter(col("doc_id") % 10 === 0)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mc-idx").toString
    val labelsDir = java.nio.file.Files.createTempDirectory("graft-mc-labels").toString
    graft.operators.TextOps.writeBandIndex(corpus, "doc_id", "text", idxDir)
    graft.operators.Dedup.connectedComponents(
        graft.operators.TextOps.minhashNearDups(corpus, "doc_id", "text", 0.5),
        "id_a", "id_b")
      .write.mode("overwrite").parquet(s"$labelsDir/v0")
    graft.GraftCache.release()
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-mc-split")
      arrivals.repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-mc-stream")
      new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
        }
      dir.toString
    }
    val q = EventStreams.maintainClusters(
      EventStreams.readDocuments(spark, arrivalsDir), t.documents, 0.5,
      java.nio.file.Files.createTempDirectory("graft-mc-ckpt").toString,
      idxDir, labelsDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read
      .parquet(EventStreams.latestLabelVersion(spark, labelsDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.operators.Dedup.connectedComponents(
        graft.operators.TextOps.minhashNearDups(t.documents, "doc_id", "text", 0.5),
        "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    // streamed covers nodes(corpus pairs) ∪ discovered-edge endpoints =
    // exactly the ids full clustering labels (all pairs get discovered)
    assert(streamed === full)
  }

  test("streaming drift-gated index maintenance: append then retrain, equals batch") {
    // pl12's nightly decision per micro-batch: an in-distribution batch
    // must ADMIT through the standing cells (cheap path), a shifted one
    // must RETRAIN — and after both, the stored quantizer state must be
    // byte-identical to batch-mode k-means over the whole accumulated
    // corpus (stream == batch for the maintenance loop, not just the
    // decisions).
    import org.apache.spark.sql.DataFrame
    val VectorOps = graft.operators.VectorOps
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    def toD(df: DataFrame) = df.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val base = toD(e.filter(col("vec_id") % 10 =!= 0))
    val batchA = toD(e.filter(col("vec_id") % 10 === 0))
    val batchB = batchA.select((col("vec_id") + 10000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(3.0)).as("embedding"))
    val idxDir = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    val logDir = java.nio.file.Files.createTempDirectory("graft-vidx-log").toString
    EventStreams.seedVectorIndex(base, 8, 2, idxDir)
    graft.GraftCache.release()
    val arrivalsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-vidx-stream")
      Seq(batchA -> "arrivals_0", batchB -> "arrivals_1").foreach {
        case (b, name) =>
          val staging = java.nio.file.Files
            .createTempDirectory("graft-vidx-split").toString
          b.coalesce(1).write.mode("overwrite").parquet(staging)
          val part = new java.io.File(staging).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          java.nio.file.Files.copy(part.toPath,
            dir.resolve(s"$name.parquet"))
      }
      dir.toString
    }
    def runStream(): Unit = {
      val q = EventStreams.maintainVectorIndex(
        spark.readStream.schema(batchA.schema)
          .option("maxFilesPerTrigger", 1).parquet(arrivalsDir),
        8, 2, graft.queries.VectorQueries.RefreshDriftPpm,
        java.nio.file.Files.createTempDirectory("graft-vidx-ckpt").toString,
        idxDir, logDir)
      q.processAllAvailable()
      q.stop()
    }
    runStream()
    val log = spark.read.parquet(logDir)
      .select(col("batch_id").cast("long"), col("decision"), col("drift_ppm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    info(log.mkString(", "))
    assert(log.map(_._2).toSeq === Seq("append", "retrain"),
      "in-dist batch must append, shifted batch must retrain")
    def centsPath = EventStreams.latestLabelVersion(spark, s"$idxDir/centroids")
    def state() = (
      VectorOps.collectCentroids(spark.read.parquet(centsPath)).toSeq,
      spark.read.parquet(
          EventStreams.latestLabelVersion(spark, s"$idxDir/cellcounts"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      spark.read.parquet(s"$idxDir/corpus")
        .collect().map(_.getLong(0)).sorted.toSeq)
    // post-state == batch-mode retrain over everything accumulated
    val full = base.unionByName(batchA).unionByName(batchB)
    val expectCents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(full, "vec_id", "embedding", 8, 2))
    val (gotCents, gotCounts, gotIds) = state()
    assert(gotCents === expectCents.toSeq,
      "stored centroids must equal batch-mode k-means over the full corpus")
    val expectCounts = VectorOps.assignToCentroids(full, "vec_id",
        "embedding", spark.read.parquet(centsPath))
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotCounts === expectCounts,
      "stored cell counts must equal assignment counts over the full corpus")
    // FULL REPLAY (fresh checkpoint, same arrivals, same batch ids): the
    // exactly-once corpus append skips, the versioned snapshots recompute
    // from the same ≤-batchId inputs and overwrite their own versions —
    // the ENTIRE maintenance state must be byte-identical.
    runStream()
    graft.GraftCache.release()
    assert(state() === ((gotCents, gotCounts, gotIds)),
      "replaying every micro-batch must leave the index state unchanged")
  }

  test("watermark-bounded dedup passes distinct events within the horizon") {
    // testdata has unique event_ids, so within-horizon dedup must be the
    // identity here — the point is the operator wires up with bounded
    // state (the semantic difference from dedupEvents only appears for
    // duplicates straddling the watermark horizon).
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.dedupEventsBounded(stream)
      .select("event_id"), "dedup_wm_stream", "append")
    val n = spark.table("dedup_wm_stream").count()
    val expected = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .events.count()
    assert(n === expected)
  }

  test("streaming funnel state machine equals the batch funnel") {
    val steps = Seq("view", "click", "purchase")
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.funnelProgress(stream, steps).toDF(),
      "funnel_stream", "update")
    // final stage per user = the max stage emitted across micro-batches
    val streamedByStage = spark.table("funnel_stream")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .groupBy("stage").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // batch per-step user counts → users whose FINAL stage is exactly k
    val batchEvents = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val reach = graft.operators.EventAnalytics
      .funnel(batchEvents, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    graft.GraftCache.release()
    // the stream's universe: users with ≥1 funnel-step event
    val nUsers = batchEvents.filter(col("user_id").isNotNull &&
        col("event_type").isin(steps: _*))
      .select("user_id").distinct().count()
    val expectedExact = Map(
      0 -> (nUsers - reach(1)),
      1 -> (reach(1) - reach(2)),
      2 -> (reach(2) - reach(3)),
      3 -> reach(3))
    // the stream only emits users with at least one funnel-step event; all
    // users have view/click/purchase events at this sf, so sets align
    assert(streamedByStage === expectedExact.filter(_._2 > 0))
  }

  test("streaming daily distinct-user sketch equals the batch sketch " +
       "(order-free aggregate under micro-batch state)") {
    val k = 64
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.dailyDistinctUsers(stream, k),
      "kmv_daily_stream", "complete")
    val streamed = spark.table("kmv_daily_stream")
      .orderBy("day").collect().toSeq
    // batch twin: the same sketch columns off the batch reader
    val batch = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
      .filter(col("user_id").isNotNull)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(graft.operators.Aggregations.kmvSketch(
        graft.operators.TextOps.md5Hash60(col("user_id").cast("string")),
        k).as("sk"))
      .select(col("day"), size(col("sk")).cast("long").as("n_sketch"),
        graft.operators.Aggregations.kmvEstimate(col("sk"), k)
          .as("est_users"))
      .orderBy("day").collect().toSeq
    graft.GraftCache.release()
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming histogram maintenance: final counts equal the batch " +
       "histogram and a full replay does not double-count") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val corpus = t.events.filter(col("event_id") % 10 =!= 0)
    val arrivals = t.events.filter(col("event_id") % 10 === 0)
    val histDir = java.nio.file.Files.createTempDirectory("graft-hist").toString
    EventStreams.seedValueHistogram(corpus, "value", histDir)
    val arrivalsDir = {
      val staging = java.nio.file.Files.createTempDirectory("graft-hist-split")
      arrivals.repartition(2).write.mode("overwrite").parquet(staging.toString)
      val dir = java.nio.file.Files.createTempDirectory("graft-hist-stream")
      new java.io.File(staging.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath, dir.resolve(s"arrivals_$i.parquet"))
        }
      dir.toString
    }
    def runStream(): Unit = {
      val q = EventStreams.maintainValueHistogram(
        EventStreams.readEvents(spark, arrivalsDir), "value",
        java.nio.file.Files.createTempDirectory("graft-hist-ckpt").toString,
        histDir)
      q.processAllAvailable()
      q.stop()
    }
    runStream()
    def stored() = spark.read
      .parquet(EventStreams.latestLabelVersion(spark, histDir))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fromScratch = graft.operators.Aggregations
      .logHistogramBuckets(t.events, "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.GraftCache.release()
    val once = stored()
    assert(once.nonEmpty && once == fromScratch)
    // additive counts + fresh-checkpoint replay: versioned inputs make
    // the re-run overwrite its own versions with identical content
    runStream()
    assert(stored() == once)
  }

  test("streaming distinct-sketch maintenance converges to the " +
       "from-scratch corpus sketch (lossless merge per micro-batch)") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val k = 64
    val corpus = t.documents.filter(col("doc_id") % 10 =!= 0)
    val arrivals = t.documents.filter(col("doc_id") % 10 === 0)
    val sketchDir = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    EventStreams.seedDistinctSketch(corpus, "doc_id", k, sketchDir)
    // two arrival micro-batches, the second overlapping the corpus split
    // (replayed keys) — the merge must absorb them
    val arrivalsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-kmv-stream")
      Seq(arrivals -> "arrivals_0",
          arrivals.unionByName(corpus.limit(20)) -> "arrivals_1").foreach {
        case (b, name) =>
          val staging = java.nio.file.Files
            .createTempDirectory("graft-kmv-split").toString
          b.coalesce(1).write.mode("overwrite").parquet(staging)
          new java.io.File(staging).listFiles()
            .filter(_.getName.endsWith(".parquet")).take(1)
            .foreach(f => java.nio.file.Files.copy(
              f.toPath, java.nio.file.Paths.get(dir.toString, s"$name.parquet")))
      }
      dir.toString
    }
    val q = EventStreams.maintainDistinctSketch(
      EventStreams.readDocuments(spark, arrivalsDir), "doc_id", k,
      java.nio.file.Files.createTempDirectory("graft-kmv-ckpt").toString,
      sketchDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read
      .parquet(EventStreams.latestLabelVersion(spark, sketchDir))
      .collect().map(_.getLong(0)).sorted.toSeq
    val fromScratch = t.documents
      .select(graft.operators.TextOps
        .md5Hash60(col("doc_id").cast("string")).as("h"))
      .agg(graft.operators.Aggregations.kmvSketch(col("h"), k).as("sk"))
      .select(explode(col("sk")).as("h"))
      .collect().map(_.getLong(0)).sorted.toSeq
    graft.GraftCache.release()
    assert(streamed.nonEmpty && streamed == fromScratch)
  }

  test("streaming seen-bloom maintenance equals the from-scratch filter " +
       "(idempotent OR merge), keeps stored geometry, never misses a member") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val history = t.documents.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
    val arrivals = t.documents.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
    val (nb, np) = (4096, 3)
    val bloomDir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    EventStreams.seedSeenBloom(history, "fp", nb, np, bloomDir)
    // two micro-batches; the second REPLAYS history fingerprints — the OR
    // must absorb them without changing a bit vs the from-scratch filter
    val arrivalsDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom-stream")
      Seq(arrivals -> "arrivals_0",
          history.limit(20) -> "arrivals_1").foreach { case (b, name) =>
        val staging = java.nio.file.Files
          .createTempDirectory("graft-bloom-split").toString
        b.select(col("doc_id"), col("fp").as("text")).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        new java.io.File(staging).listFiles()
          .filter(_.getName.endsWith(".parquet")).take(1)
          .foreach(f => java.nio.file.Files.copy(
            f.toPath, java.nio.file.Paths.get(dir.toString, s"$name.parquet")))
      }
      dir.toString
    }
    // the stream carries the fingerprint in the documents schema's text
    // column — rename back on read
    val q = EventStreams.maintainSeenBloom(
      EventStreams.readDocuments(spark, arrivalsDir)
        .select(col("text").as("fp")),
      "fp",
      java.nio.file.Files.createTempDirectory("graft-bloom-ckpt").toString,
      bloomDir)
    q.processAllAvailable()
    q.stop()
    val latest = spark.read
      .parquet(EventStreams.latestLabelVersion(spark, bloomDir))
    assert(latest.select("n_bits", "n_probes").head() ===
      org.apache.spark.sql.Row(nb, np))
    val streamedWords = latest.select(explode(col("words")))
      .collect().map(_.getLong(0)).toSeq
    val fromScratch = history.select("fp")
      .unionByName(arrivals.select("fp"))
      .unionByName(history.limit(20).select("fp"))
      .agg(graft.operators.Bloom.sketch(xxhash64(col("fp")), nb, np).as("w"))
      .select(explode(col("w"))).collect().map(_.getLong(0)).toSeq
    graft.GraftCache.release()
    assert(streamedWords.exists(_ != 0L) && streamedWords == fromScratch)
    // no false negatives through the maintained artifact: every history
    // and arrival fingerprint hits
    val missed = history.unionByName(arrivals)
      .crossJoin(broadcast(latest.select(col("words"))))
      .filter(!graft.operators.Bloom.mightContain(
        col("words"), xxhash64(col("fp")), nb, np))
      .count()
    assert(missed === 0L)
  }

  test("sharded rotating seen-bloom maintainer: the tripping batch only " +
       "REQUESTS (O(|batch|) inline — no geometry change, no history scan), " +
       "the offline rebuild publishes a pending artifact, the next batch " +
       "cuts over per shard, no member is ever lost, and a fresh-checkpoint " +
       "replay converges to the same final bits THROUGH the async rotation") {
    import spark.implicits._
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val history = t.documents.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
    val arrivals0 = t.documents.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
    // batch 0: 500 members over 4 shards ≈ 125/shard, 375 probe inserts
    // into 1024 bits → ~31% fill, under threshold on every shard; batch 1
    // adds 700 fresh members → ~300/shard, ~900 inserts → expected fill
    // ≈ 58%, past 50% on every shard with σ-margin on this fixed data
    val arrivals1 = spark.range(700)
      .select((col("id") + 100000L).as("doc_id"),
        concat(lit("fresh"), col("id")).as("fp"))
    // batch 2: a few more fresh fps — the cutover carrier
    val arrivals2 = spark.range(40)
      .select((col("id") + 200000L).as("doc_id"),
        concat(lit("later"), col("id")).as("fp"))
    val (nb, np, nS) = (1024, 3, 4)
    val bloomDir = java.nio.file.Files
      .createTempDirectory("graft-bloomrot").toString
    val histDir = java.nio.file.Files
      .createTempDirectory("graft-bloomrot-hist").toString
    EventStreams.seedSeenBloomSharded(history, "fp", nb, np, nS,
      bloomDir, histDir)
    val arrivalsDir = java.nio.file.Files
      .createTempDirectory("graft-bloomrot-stream").toString
    def stage(b: org.apache.spark.sql.DataFrame, name: String,
              ageMs: Long): Unit = {
      val staging = java.nio.file.Files
        .createTempDirectory("graft-bloomrot-split").toString
      b.select(col("doc_id"), col("fp").as("text")).coalesce(1)
        .write.mode("overwrite").parquet(staging)
      new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).take(1)
        .foreach { f =>
          val dst = java.nio.file.Paths.get(arrivalsDir, s"$name.parquet")
          java.nio.file.Files.copy(f.toPath, dst)
          // pin micro-batch ORDER: the file source picks up files by
          // modification time and the lifecycle asserts are order-sensitive
          dst.toFile.setLastModified(System.currentTimeMillis() - ageMs)
        }
    }
    stage(arrivals0, "arrivals_0", 60000L)
    stage(arrivals1, "arrivals_1", 30000L)
    def run(ckpt: String): Unit = {
      val q = EventStreams.maintainSeenBloomSharded(
        EventStreams.readDocuments(spark, arrivalsDir)
          .select(col("text").as("fp")),
        "fp", ckpt, bloomDir, histDir)
      q.processAllAvailable()
      q.stop()
    }
    def noneMissed(version: String,
                   members: org.apache.spark.sql.DataFrame): Unit = {
      val frame = spark.read.parquet(s"$bloomDir/$version")
      val missed = graft.operators.Bloom.screenSharded(
          members, xxhash64(col("fp")), frame, np, nS)
        .filter(!col("__maybe")).count()
      assert(missed === 0L, s"$version lost members")
    }
    val ckpt1 = java.nio.file.Files
      .createTempDirectory("graft-bloomrot-ckpt").toString
    run(ckpt1)
    // batch 0: all shards under threshold → absorbed, no request
    val v1 = spark.read.parquet(s"$bloomDir/v1")
    assert(v1.count() === nS.toLong)
    assert(v1.select("n_bits").distinct().head().getInt(0) === nb)
    assert(!new java.io.File(s"$bloomDir/rotate-req-1").exists())
    // batch 1 trips the threshold, but the ASYNC contract holds: the
    // version it wrote is still the absorbed OLD geometry (no inline
    // rebuild, no history scan) and a rotation request exists instead
    val v2 = spark.read.parquet(s"$bloomDir/v2")
    assert(v2.select("n_bits").distinct().head().getInt(0) === nb,
      "the tripping batch must not rebuild inline")
    assert(v2.select("base_req").distinct().head().getLong(0) === 0L)
    val reqFile = new java.io.File(s"$bloomDir/rotate-req-2")
    assert(reqFile.exists(), "tripping batch must write a rotation request")
    val requested = scala.io.Source.fromFile(reqFile).mkString
      .trim.split(",").map(_.toInt).toSet
    assert(requested.nonEmpty)
    // serving invariant while the rotation is in flight: the absorbed
    // (saturated) filter still holds every member
    val seen01 = history.select("fp")
      .unionByName(arrivals0.select("fp")).unionByName(arrivals1.select("fp"))
    noneMissed("v2", seen01)
    // offline rebuild: publishes pending-2 with a done marker; idempotent
    assert(EventStreams.rebuildRotation(spark, bloomDir, histDir))
    assert(new java.io.File(s"$bloomDir/pending-2/_SUCCESS").exists())
    assert(!EventStreams.rebuildRotation(spark, bloomDir, histDir),
      "a completed request must not rebuild again")
    val pendingBits = spark.read.parquet(s"$bloomDir/pending-2")
      .select("shard", "n_bits").as[(Int, Int)].collect().toMap
    assert(pendingBits.keySet === requested)
    assert(pendingBits.values.forall(_ > nb), "rebuilds must grow geometry")
    // batch 2 (same checkpoint, new file) cuts over: requested shards at
    // the rebuilt geometry, watermark advanced, nothing lost
    stage(arrivals2, "arrivals_2", 10000L)
    run(ckpt1)
    val v3 = spark.read.parquet(s"$bloomDir/v3")
    val v3bits = v3.select("shard", "n_bits").as[(Int, Int)].collect().toMap
    requested.foreach(sh => assert(v3bits(sh) === pendingBits(sh)))
    (0 until nS).filterNot(requested).foreach(sh => assert(v3bits(sh) === nb))
    assert(v3.select("base_req").distinct().head().getLong(0) === 2L)
    val seenAll = seen01.unionByName(arrivals2.select("fp"))
    noneMissed("v3", seenAll)
    // fill actually dropped on the rotated shards
    val fill3 = graft.operators.Bloom.shardFill(v3)
      .select("shard", "fill_ppm").as[(Int, Long)].collect().toMap
    requested.foreach(sh => assert(fill3(sh) <= 500000L,
      s"shard $sh still saturated after rotation: ${fill3(sh)} ppm"))
    // replay convergence THROUGH the async rotation: a full re-run from a
    // fresh checkpoint (same dirs — the pending artifact now exists from
    // batch 0's perspective, so the cutover lands EARLIER; the final
    // artifact must still be bit-identical)
    def frameBits(version: String): Map[Int, (Int, Seq[Long])] =
      spark.read.parquet(s"$bloomDir/$version")
        .select("shard", "n_bits", "words")
        .as[(Int, Int, Seq[Long])].collect()
        .map { case (s, b, w) => s -> ((b, w)) }.toMap
    val finalBits = frameBits("v3")
    run(java.nio.file.Files
      .createTempDirectory("graft-bloomrot-ckpt2").toString)
    assert(frameBits("v3") === finalBits,
      "fresh-checkpoint replay must converge to the same final bits")
    // and the per-version serving invariant held during the replay too
    noneMissed("v1", seen01.limit(0).unionByName(history.select("fp"))
      .unionByName(arrivals0.select("fp")))
    noneMissed("v2", seen01)
    graft.GraftCache.release()
  }
  test("streaming crawl intake equals the batch front end over two " +
       "file-arrival waves, and a restarted stream does not re-ingest") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-crawl-stream").toString
    val watch = s"$root/files"
    assert(new java.io.File(watch).mkdirs())
    val wave1 = docs.filter(col("doc_id") % 2 === 0)
    val wave2 = docs.filter(col("doc_id") % 2 =!= 0)
    graft.operators.Multimodal.writeWarcFiles(
      graft.operators.Multimodal.asWarcRecordsTable(spark, wave1, 256),
      watch, prefix = "wave1")
    val q = EventStreams.streamCrawlIntake(
      spark, watch, s"$root/cp", s"$root/log")
    q.processAllAvailable()
    graft.operators.Multimodal.writeWarcFiles(
      graft.operators.Multimodal.asWarcRecordsTable(spark, wave2, 256),
      watch, prefix = "wave2")
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "quality_ok", "fp")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val got = rows(spark.read.parquet(s"$root/log"))
    // batch twin straight over documents — recovery is identity
    val twin = graft.operators.TextOps.qualityMetrics(docs, "text")
      .select("doc_id", "n_tokens", "quality_ok")
      .join(docs.select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp")),
        "doc_id")
    assert(got == rows(twin),
      "the streamed intake log must equal the batch front end")
    // restart against the same checkpoint: seen files must NOT re-ingest
    val q2 = EventStreams.streamCrawlIntake(
      spark, watch, s"$root/cp", s"$root/log")
    q2.processAllAvailable()
    q2.stop()
    assert(rows(spark.read.parquet(s"$root/log")) == rows(twin),
      "a restarted stream must not duplicate already-ingested files")
  }
}
