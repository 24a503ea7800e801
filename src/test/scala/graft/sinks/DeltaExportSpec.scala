package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Delta-protocol export: the LOG ITSELF is asserted field-by-field
  * against the published transaction-log format (no external Delta
  * implementation exists in this container, so the JSON shapes — action
  * names, schemaString, partitionValues, 20-digit version files — are the
  * interop surface under test), plus snapshot semantics, the one-winner
  * version gate, copy-on-write delete accounting, and crash residue
  * invisibility. */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-delta-$tag").toString + "/t"

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"g${i % 3}", i * 1.5))
      .toDF("k", "g", "v")

  private def logLines(tbl: String, version: Long): Seq[String] = {
    val f = java.nio.file.Paths.get(tbl, "_delta_log", f"$version%020d.json")
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("version 0 carries the published protocol/metaData/add action shapes") {
    val tbl = tmpTable("shape")
    assert(DeltaExport.commitAppend(rows(0, 30), tbl, Seq("g")) === 0L)
    val lines = logLines(tbl, 0L).map(mapper.readTree)
    // exactly one protocol action, the published reader/writer floor
    val protos = lines.filter(_.has("protocol"))
    assert(protos.size === 1)
    assert(protos.head.get("protocol").get("minReaderVersion").asInt === 1)
    assert(protos.head.get("protocol").get("minWriterVersion").asInt === 2)
    // one metaData: parquet format, Spark-JSON schemaString, partition cols
    val metas = lines.filter(_.has("metaData"))
    assert(metas.size === 1)
    val m = metas.head.get("metaData")
    assert(m.get("format").get("provider").asText === "parquet")
    assert(m.get("id").asText.nonEmpty)
    assert(m.get("partitionColumns").get(0).asText === "g")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(m.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq === Seq("k", "g", "v"))
    // adds: relative path under a partition dir, required fields present
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val p = a.get("path").asText
      assert(!p.startsWith("/") && p.contains("g=") && p.endsWith(".parquet"))
      assert(a.get("size").asLong > 0)
      assert(a.get("dataChange").asBoolean)
      val pv = a.get("partitionValues")
      assert(Set("g0", "g1", "g2").contains(pv.get("g").asText))
      // the path's Hive dir and the protocol-required map must agree
      assert(p.contains(s"g=${pv.get("g").asText}/"))
    }
  }

  test("snapshot reconstructs partition columns from partitionValues, typed") {
    val tbl = tmpTable("parts")
    // integer partition column: the reader must CAST partitionValues
    val df = (0 until 40).map(i => (i.toLong, i % 4, s"r$i")).toDF("k", "p", "s")
    assert(DeltaExport.commitAppend(df, tbl, Seq("p")) === 0L)
    val back = DeltaExport.snapshot(spark, tbl)
    assert(back.schema("p").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(back.select(sum(col("k") * col("p"))).as[Long].head ===
      (0 until 40).map(i => i.toLong * (i % 4)).sum)
    assert(back.count() === 40)
  }

  test("append versions chain; replayed and racing versions lose the gate") {
    val tbl = tmpTable("gate")
    assert(DeltaExport.commitAppend(rows(0, 10), tbl) === 0L)
    assert(DeltaExport.commitAppend(rows(10, 20), tbl) === 1L)
    // replay of a committed version: no-op, table unchanged
    assert(DeltaExport.commitAppend(rows(90, 99), tbl, expectedVersion = 1L) === -1L)
    assert(DeltaExport.snapshot(spark, tbl).count() === 20)
    // a gap is refused loudly
    intercept[IllegalArgumentException] {
      DeltaExport.commitAppend(rows(0, 5), tbl, expectedVersion = 7L)
    }
    // time travel: as-of 0 sees only the first commit
    assert(DeltaExport.snapshot(spark, tbl, asOfVersion = 0L)
      .agg(sum("k")).as[Long].head === (0 until 10).map(_.toLong).sum)
  }

  test("copy-on-write delete: remove+rewrite touch only affected files") {
    val tbl = tmpTable("delete")
    assert(DeltaExport.commitAppend(rows(0, 60), tbl, Seq("g")) === 0L)
    val v0Adds = logLines(tbl, 0L).map(mapper.readTree)
      .filter(_.has("add")).map(_.get("add").get("path").asText).toSet
    // delete hits only partition g=g1 (k % 3 == 1 rows)
    assert(DeltaExport.commitDeleteWhere(spark, tbl,
      col("g") === "g1" && col("k") < 10) === 1L)
    val v1 = logLines(tbl, 1L).map(mapper.readTree)
    val removed = v1.filter(_.has("remove")).map(_.get("remove").get("path").asText)
    assert(removed.nonEmpty)
    // every removed file was a g=g1 file; g0/g2 files never rewritten
    removed.foreach(p => assert(p.contains("g=g1/"), p))
    assert(removed.forall(v0Adds.contains))
    v1.filter(_.has("remove")).foreach(r =>
      assert(r.get("remove").get("deletionTimestamp").asLong > 0))
    // content: exactly the survivors
    val back = DeltaExport.snapshot(spark, tbl)
    assert(back.count() === 60 - Seq.range(0, 10).count(_ % 3 == 1))
    assert(back.filter(col("g") === "g1" && col("k") < 10).count() === 0)
    // delete with no matching rows commits an empty (but real) version
    assert(DeltaExport.commitDeleteWhere(spark, tbl, col("k") === 9999L) === 2L)
    assert(DeltaExport.versions(spark, tbl) === Seq(0L, 1L, 2L))
    assert(DeltaExport.snapshot(spark, tbl).count() === back.count())
  }

  test("crashed attempts are invisible: unreferenced data never surfaces") {
    val tbl = tmpTable("crash")
    assert(DeltaExport.commitAppend(rows(0, 10), tbl) === 0L)
    // simulate a crashed attempt: data staged, version file never written
    rows(500, 600).write.parquet(s"$tbl/v1-deadbeefdead")
    assert(DeltaExport.snapshot(spark, tbl).count() === 10)
    assert(DeltaExport.versions(spark, tbl) === Seq(0L))
    // the next commit takes version 1 and the table stays consistent
    assert(DeltaExport.commitAppend(rows(10, 15), tbl) === 1L)
    assert(DeltaExport.snapshot(spark, tbl).count() === 15)
  }

  test("checkpoint: O(live) reader state survives JSON log cleanup") {
    val tbl = tmpTable("cp")
    assert(DeltaExport.commitAppend(rows(0, 20), tbl, Seq("g")) === 0L)
    assert(DeltaExport.commitAppend(rows(20, 40), tbl, Seq("g")) === 1L)
    assert(DeltaExport.commitDeleteWhere(spark, tbl, col("k") < 5) === 2L)
    val before = DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
    assert(DeltaExport.checkpoint(spark, tbl) === 2L)
    // the protocol artifacts exist: 20-digit checkpoint + _last_checkpoint
    val logDir = java.nio.file.Paths.get(tbl, "_delta_log")
    assert(java.nio.file.Files.exists(
      logDir.resolve(f"${2L}%020d.checkpoint.parquet")))
    val lc = mapper.readTree(java.nio.file.Files.readAllBytes(
      logDir.resolve("_last_checkpoint")))
    assert(lc.get("version").asLong === 2L && lc.get("size").asLong > 2)
    // checkpoint contents: protocol + metaData rows present, adds live-only
    val cp = spark.read.parquet(
      logDir.resolve(f"${2L}%020d.checkpoint.parquet").toString)
    assert(cp.where("protocol IS NOT NULL").count() === 1)
    assert(cp.where("metaData IS NOT NULL").count() === 1)
    assert(cp.where("add IS NOT NULL").count() > 0)
    // snapshot through the checkpoint equals the pre-checkpoint read
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
      === before)
    // LOG CLEANUP: delete every JSON commit the checkpoint seals — the
    // reader must reconstruct from checkpoint alone, and the next append
    // must chain to version 3 without the JSON history
    (0L to 2L).foreach(v =>
      java.nio.file.Files.delete(logDir.resolve(f"$v%020d.json")))
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
      === before)
    assert(DeltaExport.commitAppend(rows(100, 110), tbl, Seq("g")) === 3L)
    assert(DeltaExport.snapshot(spark, tbl).count() === before.size + 10)
    // a second checkpoint after cleanup: metaData survives via the prior
    // checkpoint (no JSON commit carries it anymore)
    assert(DeltaExport.checkpoint(spark, tbl) === 3L)
    val cp2 = spark.read.parquet(
      logDir.resolve(f"${3L}%020d.checkpoint.parquet").toString)
    assert(cp2.where("metaData IS NOT NULL")
      .selectExpr("metaData.schemaString").as[String].head.contains("\"k\""))
    assert(DeltaExport.snapshot(spark, tbl).count() === before.size + 10)
  }

  test("vacuum reclaims only never-committed files; cleanupLog drops " +
       "sealed JSON and the pair leaves every retained read intact") {
    val tbl = tmpTable("vacuum")
    assert(DeltaExport.commitAppend(rows(0, 30), tbl, Seq("g")) === 0L)
    assert(DeltaExport.commitDeleteWhere(spark, tbl, col("k") < 3) === 1L)
    // crash residue: staged data no commit references
    rows(500, 520).write.parquet(s"$tbl/v2-deadbeefdead")
    val v0 = DeltaExport.snapshot(spark, tbl, 0L).orderBy("k").collect().toSeq
    val v1 = DeltaExport.snapshot(spark, tbl, 1L).orderBy("k").collect().toSeq
    val reclaimed = DeltaExport.vacuum(spark, tbl)
    assert(reclaimed > 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tbl, "v2-deadbeefdead")))
    // committed-then-removed files SURVIVE vacuum: version-0 time travel
    // still reads the pre-delete rows
    assert(DeltaExport.snapshot(spark, tbl, 0L).orderBy("k").collect().toSeq === v0)
    assert(DeltaExport.snapshot(spark, tbl, 1L).orderBy("k").collect().toSeq === v1)
    assert(DeltaExport.vacuum(spark, tbl) === 0) // idempotent
    // checkpoint → cleanupLog: sealed JSON goes, reads continue from the
    // checkpoint, and a SECOND vacuum now reclaims the files only the
    // dropped history referenced (the removed-by-delete originals)
    assert(DeltaExport.checkpoint(spark, tbl) === 1L)
    assert(DeltaExport.cleanupLog(spark, tbl) === 2)
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq === v1)
    assert(DeltaExport.vacuum(spark, tbl) > 0)
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq === v1)
  }

  test("streaming CDC publish: micro-batches land as versioned MERGE " +
       "commits, external snapshots follow the stream, and a replayed " +
       "batch no-ops through the version gate") {
    val tbl = tmpTable("stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-delta-stream-ckpt").toString
    // base publish = version 0; the stream owns versions 1+
    assert(DeltaExport.commitAppend(rows(0, 20), tbl, Seq("g")) === 0L)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double, String)]
    val q = graft.streaming.EventStreams.streamChangesToDelta(
      ms.toDF().toDF("k", "g", "v", "op"), tbl, "k", "op", ckpt)
    try {
      // batch 0: update k=1 (g flips to gX), delete k=2, insert k=100
      ms.addData((1L, "gX", 9.9, "U"), (2L, "g2", 0.0, "D"),
        (100L, "gX", 1.0, "U"))
      q.processAllAvailable()
      // batch 1: delete the row batch 0 inserted
      ms.addData((100L, "gX", 1.0, "D"))
      q.processAllAvailable()
    } finally q.stop()
    assert(DeltaExport.versions(spark, tbl) === Seq(0L, 1L, 2L))
    val afterB0 = DeltaExport.snapshot(spark, tbl, 1L)
    assert(afterB0.count() === 20) // -1 delete +1 insert
    assert(afterB0.filter(col("k") === 1L && col("g") === "gX").count() === 1)
    assert(afterB0.filter(col("k") === 2L).count() === 0)
    assert(afterB0.filter(col("k") === 100L).count() === 1)
    val latest = DeltaExport.snapshot(spark, tbl)
    assert(latest.count() === 19)
    assert(latest.filter(col("k") === 100L).count() === 0)
    // at-least-once redelivery: replaying batch 0's merge at its version
    // must lose the create-if-absent gate and change nothing
    import spark.implicits._
    val replay = Seq((1L, "gY", 7.7, "U")).toDF("k", "g", "v", "op")
    assert(DeltaExport.commitMergeByKey(spark, tbl, replay, "k", "op",
      expectedVersion = 1L) === -1L)
    assert(DeltaExport.snapshot(spark, tbl)
      .filter(col("k") === 1L && col("g") === "gX").count() === 1)
  }

  test("txn actions: the streaming bookmark survives interleaved commits " +
       "and log cleanup — replays no-op by appId, not by version number") {
    val tbl = tmpTable("txn")
    import spark.implicits._
    assert(DeltaExport.commitAppend(rows(0, 20), tbl, Seq("g")) === 0L)
    val b0 = Seq((1L, "gX", 9.9, "U")).toDF("k", "g", "v", "op")
    assert(DeltaExport.commitMergeByKey(spark, tbl, b0, "k", "op",
      txn = Some(("app-a", 0L))) === 1L)
    // the log line carries the published txn shape
    val t1 = logLines(tbl, 1L).map(mapper.readTree).filter(_.has("txn"))
    assert(t1.size === 1)
    assert(t1.head.get("txn").get("appId").asText === "app-a")
    assert(t1.head.get("txn").get("version").asLong === 0L)
    // an interleaved OPTIMIZE takes version 2 — a fixed batch→version
    // mapping would now lose batch 1's gate and silently drop it; the
    // txn bookmark does not care what version number the batch lands on
    assert(DeltaExport.optimizeCompact(spark, tbl) === 2L)
    assert(DeltaExport.commitMergeByKey(spark, tbl,
      Seq((2L, "gY", 1.1, "U")).toDF("k", "g", "v", "op"), "k", "op",
      txn = Some(("app-a", 1L))) === 3L)
    assert(DeltaExport.lastTxnVersion(spark, tbl, "app-a") === 1L)
    assert(DeltaExport.lastTxnVersion(spark, tbl, "app-b") === -1L)
    // at-least-once replay of both batches: no-ops, table unchanged
    val replay = Seq((1L, "gZ", 7.7, "U")).toDF("k", "g", "v", "op")
    assert(DeltaExport.commitMergeByKey(spark, tbl, replay, "k", "op",
      txn = Some(("app-a", 0L))) === -1L)
    assert(DeltaExport.commitMergeByKey(spark, tbl, replay, "k", "op",
      txn = Some(("app-a", 1L))) === -1L)
    assert(DeltaExport.snapshot(spark, tbl)
      .filter(col("k") === 1L && col("g") === "gX").count() === 1)
    // a different appId is an independent bookmark; appends carry txn too
    assert(DeltaExport.commitAppend(rows(100, 105), tbl, Seq("g"),
      txn = Some(("app-b", 0L))) === 4L)
    // checkpoint + log cleanup: the bookmark must survive via the
    // checkpoint's txn rows (the protocol requires the newest txn per
    // appId in every checkpoint)
    assert(DeltaExport.checkpoint(spark, tbl) === 4L)
    assert(DeltaExport.cleanupLog(spark, tbl) === 5)
    assert(DeltaExport.lastTxnVersion(spark, tbl, "app-a") === 1L)
    assert(DeltaExport.lastTxnVersion(spark, tbl, "app-b") === 0L)
    assert(DeltaExport.commitMergeByKey(spark, tbl, replay, "k", "op",
      txn = Some(("app-a", 1L))) === -1L)
    assert(DeltaExport.snapshot(spark, tbl).count() === 25)
  }

  test("change data feed: cdc actions carry the exact row-level delta, " +
       "appends derive as inserts, OPTIMIZE contributes nothing, vacuum " +
       "keeps listed cdc files") {
    val tbl = tmpTable("cdf")
    import spark.implicits._
    assert(DeltaExport.commitAppend(rows(0, 10), tbl, Seq("g"),
      enableChangeFeed = true) === 0L)
    // the opt-in is announced the protocol's way: writer tier 4 + the
    // table property (non-CDF tables stay writer 2 and never pay)
    val v0 = logLines(tbl, 0L).map(mapper.readTree)
    assert(v0.find(_.has("protocol")).get
      .get("protocol").get("minWriterVersion").asInt === 4)
    assert(v0.find(_.has("metaData")).get.get("metaData")
      .get("configuration").get("delta.enableChangeDataFeed").asText === "true")
    // merge: update k=1, delete k=2, insert k=100
    val ch = Seq((1L, "gX", 9.9, "U"), (2L, "g2", 0.0, "D"),
      (100L, "gX", 1.0, "U")).toDF("k", "g", "v", "op")
    assert(DeltaExport.commitMergeByKey(spark, tbl, ch, "k", "op") === 1L)
    val cdcs = logLines(tbl, 1L).map(mapper.readTree).filter(_.has("cdc"))
    assert(cdcs.nonEmpty)
    cdcs.foreach { n =>
      assert(n.get("cdc").get("path").asText.startsWith("_change_data/"))
      assert(!n.get("cdc").get("dataChange").asBoolean)
      assert(n.get("cdc").get("size").asLong > 0)
    }
    val feed = DeltaExport.changeFeed(spark, tbl, 1L, 1L)
      .orderBy("_change_type", "k").collect()
    assert(feed.map(r =>
      (r.getAs[String]("_change_type"), r.getAs[Long]("k"))).toSeq ===
      Seq(("delete", 2L), ("insert", 100L), ("update_postimage", 1L),
        ("update_preimage", 1L)))
    // pre-image carries the OLD values, post-image the new ones
    val pre = feed.find(_.getAs[String]("_change_type") == "update_preimage").get
    assert(pre.getAs[String]("g") === "g1" && pre.getAs[Double]("v") === 1.5)
    val post = feed.find(_.getAs[String]("_change_type") == "update_postimage").get
    assert(post.getAs[String]("g") === "gX" && post.getAs[Double]("v") === 9.9)
    val del = feed.find(_.getAs[String]("_change_type") == "delete").get
    assert(del.getAs[String]("g") === "g2" && del.getAs[Double]("v") === 3.0)
    // the version-0 append derives as inserts from its data files
    val both = DeltaExport.changeFeed(spark, tbl, 0L, 1L)
    assert(both.filter(col("_commit_version") === 0L &&
      col("_change_type") === "insert").count() === 10)
    assert(both.count() === 14)
    // OPTIMIZE (dataChange=false throughout) contributes nothing
    assert(DeltaExport.optimizeCompact(spark, tbl) === 2L)
    assert(DeltaExport.changeFeed(spark, tbl, 2L, 2L).count() === 0)
    // a copy-on-write DELETE feeds exactly its removed rows
    assert(DeltaExport.commitDeleteWhere(spark, tbl, col("k") < 1L) === 3L)
    val d3 = DeltaExport.changeFeed(spark, tbl, 3L, 3L).collect()
    assert(d3.map(r =>
      (r.getAs[String]("_change_type"), r.getAs[Long]("k"))).toSeq ===
      Seq(("delete", 0L)))
    // vacuum keeps every cdc file the listed log references
    assert(DeltaExport.vacuum(spark, tbl) === 0)
    assert(DeltaExport.changeFeed(spark, tbl, 1L, 1L).count() === 4)
  }

  test("additive schema evolution: an evolved merge publishes a new " +
       "metaData action, old files null-backfill, non-additive refuses") {
    val tbl = tmpTable("evolve")
    assert(DeltaExport.commitAppend(rows(0, 20), tbl) === 0L)
    import spark.implicits._
    val ch = Seq((1L, "g1", 2.0, "hot", "U"), (2L, "g2", 0.0, null, "D"),
        (300L, "gX", 9.0, "cold", "U"))
      .toDF("k", "g", "v", "tier", "op")
    assert(DeltaExport.commitMergeByKey(spark, tbl, ch, "k", "op") === 1L)
    // the commit carries exactly one metaData action with the widened
    // schema; id/createdTime survive from version 0
    val v0meta = logLines(tbl, 0L).map(mapper.readTree)
      .find(_.has("metaData")).get.get("metaData")
    val v1metas = logLines(tbl, 1L).map(mapper.readTree).filter(_.has("metaData"))
    assert(v1metas.size === 1)
    val m1 = v1metas.head.get("metaData")
    assert(m1.get("id").asText === v0meta.get("id").asText)
    assert(m1.get("createdTime").asLong === v0meta.get("createdTime").asLong)
    assert(m1.get("schemaString").asText.contains("\"tier\""))
    // reads: evolved rows carry tier, pre-evolution rows null-backfill
    val back = DeltaExport.snapshot(spark, tbl)
    assert(back.schema.fieldNames.toSeq === Seq("k", "g", "v", "tier"))
    assert(back.count() === 20) // -1 delete +1 insert
    assert(back.filter(col("k") === 1L).select("tier").as[String].head === "hot")
    assert(back.filter(col("k") === 300L).select("tier").as[String].head === "cold")
    assert(back.filter(col("tier").isNull).count() === 18)
    // time travel BELOW the evolution still reads the narrow schema
    assert(DeltaExport.snapshot(spark, tbl, asOfVersion = 0L)
      .schema.fieldNames.toSeq === Seq("k", "g", "v"))
    // evolved APPEND widens too
    val app = Seq((400L, "gY", 1.0, "warm", 7L)).toDF("k", "g", "v", "tier", "extra")
    assert(DeltaExport.commitAppend(app, tbl) === 2L)
    val back2 = DeltaExport.snapshot(spark, tbl)
    assert(back2.schema.fieldNames.toSeq === Seq("k", "g", "v", "tier", "extra"))
    assert(back2.filter(col("extra").isNotNull).count() === 1)
    // dropping a stored column is refused loudly
    val e = intercept[IllegalArgumentException] {
      DeltaExport.commitMergeByKey(spark, tbl,
        Seq((5L, "g", "U")).toDF("k", "g", "op"), "k", "op")
    }
    assert(e.getMessage.contains("additive"))
  }

  test("log paths are RFC 2396 URIs: a partition value with a space " +
       "percent-encodes in add/remove.path and the checkpoint, decodes to " +
       "the literal Hive dir for every internal consumer") {
    val tbl = tmpTable("uri")
    import spark.implicits._
    // Hive leaves spaces UNescaped in partition dirs (the orders table's
    // '4-NOT SPECIFIED' priority) — exactly the value external Delta
    // readers choke on when add.path carries it raw (new URI throws)
    val df = (0 until 30).map(i =>
        (i.toLong, if (i % 2 == 0) "4-NOT SPECIFIED" else "1-URGENT", i * 1.0))
      .toDF("k", "pri", "v")
    assert(DeltaExport.commitAppend(df, tbl, Seq("pri")) === 0L)
    val adds0 = logLines(tbl, 0L).map(mapper.readTree).filter(_.has("add"))
      .map(_.get("add"))
    assert(adds0.nonEmpty)
    adds0.foreach { a =>
      val p = a.get("path").asText
      assert(!p.contains(" "), s"raw space in add.path: $p")
      // the protocol's reader contract: parse with new URI(path); the
      // decoded form must be the literal on-disk name
      val decoded = new java.net.URI(p).getPath
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tbl, decoded)),
        s"decoded add.path missing on disk: $decoded")
    }
    assert(adds0.filter(
        _.get("partitionValues").get("pri").asText == "4-NOT SPECIFIED")
      .forall(_.get("path").asText.contains("%20")))
    // delete INSIDE the space partition: remove.path must encode too, and
    // the rewrite must resolve the encoded entries back to real files
    assert(DeltaExport.commitDeleteWhere(spark, tbl,
      col("pri") === "4-NOT SPECIFIED" && col("k") < 10) === 1L)
    val rems = logLines(tbl, 1L).map(mapper.readTree).filter(_.has("remove"))
    assert(rems.nonEmpty)
    rems.foreach(r =>
      assert(!r.get("remove").get("path").asText.contains(" ")))
    val expect = (0 until 30).filterNot(i => i % 2 == 0 && i < 10)
    assert(DeltaExport.snapshot(spark, tbl).agg(sum("k")).as[Long].head ===
      expect.map(_.toLong).sum)
    // checkpoint rows carry the encoded form; reads and vacuum (which
    // compares decoded log paths against literal disk names) stay exact
    assert(DeltaExport.checkpoint(spark, tbl) === 1L)
    val logDirP = java.nio.file.Paths.get(tbl, "_delta_log")
    spark.read.parquet(logDirP.resolve(f"${1L}%020d.checkpoint.parquet").toString)
      .where("add IS NOT NULL").selectExpr("add.path").as[String].collect()
      .foreach(p => assert(!p.contains(" "), s"raw space in checkpoint: $p"))
    assert(DeltaExport.vacuum(spark, tbl) === 0,
      "a decode mismatch would orphan (and reclaim) live files here")
    assert(DeltaExport.snapshot(spark, tbl).agg(sum("k")).as[Long].head ===
      expect.map(_.toLong).sum)
  }

  test("publish is atomic: a crashed temp file is inert (never a version, " +
       "never truncated state) and successful commits leave no residue") {
    val tbl = tmpTable("atomic")
    assert(DeltaExport.commitAppend(rows(0, 10), tbl) === 0L)
    val logDirP = java.nio.file.Paths.get(tbl, "_delta_log")
    def temps() = new java.io.File(logDirP.toString).listFiles()
      .map(_.getName).filter(_.startsWith(".tmp-")).toSeq
    assert(temps().isEmpty, "successful publish must rename its temp away")
    // a crash between temp-write and rename leaves ONLY this residue —
    // the 20-digit version regex ignores it, so reads and chaining are
    // unaffected (the pre-fix shape, a truncated 00...01.json, would have
    // been read as a committed empty version)
    java.nio.file.Files.write(logDirP.resolve(".tmp-deadbeef-1.json"),
      "{\"add\":{}}".getBytes("UTF-8")): Unit
    assert(DeltaExport.versions(spark, tbl) === Seq(0L))
    assert(DeltaExport.commitAppend(rows(10, 20), tbl) === 1L)
    assert(DeltaExport.snapshot(spark, tbl).count() === 20)
    // the absence gate still holds through the rename path
    assert(DeltaExport.commitAppend(rows(90, 95), tbl,
      expectedVersion = 1L) === -1L)
    assert(DeltaExport.snapshot(spark, tbl).count() === 20)
  }

  test("add.stats carries numRecords/minValues/maxValues/nullCount and " +
       "snapshotWhere prunes files from the log alone — equal answers, " +
       "fewer files") {
    val tbl = tmpTable("stats")
    import spark.implicits._
    // range-partitioned writes give each file a tight, disjoint k range —
    // the layout data skipping exists to exploit
    val df = (0 until 400)
      .map(i => (i.toLong, s"s$i", if (i % 7 == 0) null else s"t$i", i * 0.5))
      .toDF("k", "s", "t", "v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    assert(DeltaExport.commitAppend(df, tbl) === 0L)
    val adds = logLines(tbl, 0L).map(mapper.readTree).filter(_.has("add"))
      .map(_.get("add"))
    assert(adds.size === 8)
    // the protocol's stats shape: a JSON STRING holding the four sections
    adds.foreach { a =>
      val st = mapper.readTree(a.get("stats").asText)
      assert(st.get("numRecords").asLong > 0)
      assert(st.get("minValues").get("k").isIntegralNumber)
      assert(st.get("maxValues").get("k").asLong >=
        st.get("minValues").get("k").asLong)
      assert(st.get("minValues").get("s").isTextual)
      assert(st.get("nullCount").get("k").asLong === 0L)
      assert(st.get("nullCount").get("t").asLong > 0L ||
        st.get("numRecords").asLong < 7)
    }
    assert(adds.map(_.get("stats").asText)
      .map(s => mapper.readTree(s).get("numRecords").asLong).sum === 400L)
    // skipping: a tight k range must keep a strict subset of files...
    val (cand, total) = DeltaExport.candidateFiles(spark, tbl,
      col("k") >= 100L && col("k") < 150L)
    assert(total === 8 && cand < total && cand >= 1)
    // ...and the answer must equal the unpruned filter exactly
    val got = DeltaExport.snapshotWhere(spark, tbl,
        col("k") >= 100L && col("k") < 150L)
      .agg(sum("k"), count(lit(1))).as[(Long, Long)].head
    assert(got === ((100L until 150L).sum, 50L))
    // string equality predicate prunes by binary min/max
    val (cs, _) = DeltaExport.candidateFiles(spark, tbl, col("s") === "s0")
    assert(cs < total)
    assert(DeltaExport.snapshotWhere(spark, tbl, col("s") === "s0")
      .count() === 1)
    // IS NULL prunes nothing here (nulls everywhere) but stays exact;
    // OR keeps the union of candidates; an untranslatable predicate
    // keeps everything and still answers right
    assert(DeltaExport.snapshotWhere(spark, tbl, col("t").isNull)
      .count() === (0 until 400).count(_ % 7 == 0))
    val (cOr, _) = DeltaExport.candidateFiles(spark, tbl,
      col("k") < 50L || col("k") >= 350L)
    assert(cOr < total && cOr >= 2)
    assert(DeltaExport.snapshotWhere(spark, tbl,
      (col("k") % 2) === 0L).count() === 200)
    // partition values prune as min=max=value, pre-encoding and typed
    val tbl2 = tmpTable("stats-part")
    val df2 = (0 until 90).map(i => (i.toLong, i % 3, i * 1.0))
      .toDF("k", "p", "v")
    assert(DeltaExport.commitAppend(df2, tbl2, Seq("p")) === 0L)
    val (cp2, t2) = DeltaExport.candidateFiles(spark, tbl2, col("p") === 1)
    assert(cp2 < t2)
    assert(DeltaExport.snapshotWhere(spark, tbl2, col("p") === 1)
      .count() === 30)
    // stats survive the checkpoint round-trip: replay from checkpoint
    // alone must still prune
    assert(DeltaExport.checkpoint(spark, tbl) === 0L)
    (0L to 0L).foreach(v => java.nio.file.Files.delete(
      java.nio.file.Paths.get(tbl, "_delta_log", f"$v%020d.json")))
    val (cCp, tCp) = DeltaExport.candidateFiles(spark, tbl,
      col("k") >= 100L && col("k") < 150L)
    assert(tCp === 8 && cCp === cand)
  }

  test("optimizeCompact: dataChange=false bin-packing — fewer files, " +
       "identical data, time travel intact, streaming-visible as a no-op") {
    val tbl = tmpTable("optimize")
    // five tiny appends = the small-file debt of frequent commits
    (0 until 5).foreach { b =>
      assert(DeltaExport.commitAppend(
        rows(b * 20, b * 20 + 20).repartition(2), tbl, Seq("g")) === b.toLong)
    }
    val before = DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
    def liveCount(asOf: Long): Int = {
      var live = Set.empty[String]
      (0L to asOf).foreach { v =>
        logLines(tbl, v).map(mapper.readTree).foreach { n =>
          if (n.has("add")) live += n.get("add").get("path").asText
          if (n.has("remove")) live -= n.get("remove").get("path").asText
        }
      }
      live.size
    }
    val filesBefore = liveCount(4L)
    assert(filesBefore > 3)
    assert(DeltaExport.optimizeCompact(spark, tbl) === 5L)
    // every action in the OPTIMIZE commit is dataChange:false — the
    // protocol's signal that an incremental consumer may skip it
    val acts = logLines(tbl, 5L).map(mapper.readTree)
    assert(acts.nonEmpty)
    acts.foreach { n =>
      val a = if (n.has("add")) n.get("add") else n.get("remove")
      assert(a != null && !a.get("dataChange").asBoolean, n.toString)
    }
    // one file per partition now (3 groups), data bit-identical
    assert(liveCount(5L) === 3)
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
      === before)
    // rewritten files carry fresh stats → skipping still works
    val (cand, total) = DeltaExport.candidateFiles(spark, tbl,
      col("g") === "g1")
    assert(total === 3 && cand === 1)
    // time travel below the OPTIMIZE reads the pre-compaction layout
    assert(DeltaExport.snapshot(spark, tbl, asOfVersion = 4L)
      .orderBy("k").collect().toSeq === before)
    // vacuum keeps the replaced files (older versions reference them)
    assert(DeltaExport.vacuum(spark, tbl) === 0)
    assert(DeltaExport.snapshot(spark, tbl, asOfVersion = 2L).count() === 60)
    // replay of the optimize version loses the gate
    assert(DeltaExport.optimizeCompact(spark, tbl, expectedVersion = 5L) === -1L)
    // an already-compact table commits an empty (real) version
    assert(DeltaExport.optimizeCompact(spark, tbl) === 6L)
    assert(DeltaExport.snapshot(spark, tbl).orderBy("k").collect().toSeq
      === before)
  }

  test("optimizeZOrder: a 2-D box predicate prunes to a compact file set " +
       "after the Morton rewrite, data identical, dataChange=false") {
    val tbl = tmpTable("zorder")
    import spark.implicits._
    // 64x64 grid scattered round-robin: every initial file overlaps the
    // whole square in both keys, so stats can prune nothing
    val df = (0 until 4096)
      .map(i => (i.toLong % 64L, (i.toLong / 64L) % 64L, i.toLong))
      .toDF("x", "y", "payload").repartition(8)
    assert(DeltaExport.commitAppend(df, tbl) === 0L)
    val box = col("x") >= 8L && col("x") < 16L &&
      col("y") >= 8L && col("y") < 16L
    val (cBefore, tBefore) = DeltaExport.candidateFiles(spark, tbl, box)
    assert(cBefore === tBefore && tBefore === 8)
    val before = DeltaExport.snapshot(spark, tbl)
      .orderBy("payload").collect().toSeq
    assert(DeltaExport.optimizeZOrder(spark, tbl, "x", "y",
      targetFileBytes = 2048L, bits = 8) === 1L)
    val acts = logLines(tbl, 1L).map(mapper.readTree)
    assert(acts.nonEmpty)
    acts.foreach { n =>
      val a = if (n.has("add")) n.get("add") else n.get("remove")
      assert(a != null && !a.get("dataChange").asBoolean, n.toString)
    }
    assert(DeltaExport.snapshot(spark, tbl).orderBy("payload").collect().toSeq
      === before)
    val (cAfter, tAfter) = DeltaExport.candidateFiles(spark, tbl, box)
    assert(tAfter >= 4, s"want multiple z files, got $tAfter")
    // the aligned [8,16)x[8,16) quadrant is one contiguous z-range: a
    // compact region, so only a small minority of files can contain it
    assert(cAfter < tAfter && cAfter.toDouble / tAfter <= 0.5,
      s"$cAfter of $tAfter files after z-order")
    assert(DeltaExport.snapshotWhere(spark, tbl, box).count() === 64L)
  }

  test("unpartitioned roundtrip preserves schema and values exactly") {
    val tbl = tmpTable("plain")
    val df = rows(0, 25)
    assert(DeltaExport.commitAppend(df, tbl) === 0L)
    val back = DeltaExport.snapshot(spark, tbl)
    // names + types; the parquet scan relaxes nullability on read-back
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("k").collect().toSeq === df.orderBy("k").collect().toSeq)
  }
}
