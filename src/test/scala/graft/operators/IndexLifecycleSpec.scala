package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 index-lifecycle operators: residual IVF-PQ (x78/x82),
  * tombstone deletes (x79/x83), and the append-then-compact cycle of the
  * composed index (x77/x81). The oracle gates pin end-to-end results;
  * these specs pin the DESIGN claims behind them — delete ≡ rebuild on
  * survivors, residual encoding's lower quantization error, layout
  * restoration after compact. */
class IndexLifecycleSpec extends SparkSpec {

  private def embeddings =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings

  private def documents =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").documents

  test("deleteFromBandIndex equals writeBandIndex over the surviving corpus") {
    // Band signatures are per-document, so pruning the index must be
    // row-identical to rebuilding it from the survivors — the property
    // that makes delete an O(|index|) columnar pass instead of a corpus
    // re-tokenization.
    val corpus = documents.filter(col("doc_id") % 10 =!= 0)
    val survivors = corpus.filter(col("doc_id") % 3 =!= 0)
    val removed = corpus.filter(col("doc_id") % 3 === 0).select("doc_id")
    val idx = java.nio.file.Files.createTempDirectory("graft-band-del").toString
    val pruned = java.nio.file.Files.createTempDirectory("graft-band-del-p").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-band-del-r").toString
    TextOps.writeBandIndex(corpus, "doc_id", "text", idx)
    TextOps.deleteFromBandIndex(spark, idx, pruned, removed)
    TextOps.writeBandIndex(survivors, "doc_id", "text", rebuilt)
    def rows(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val (p, r) = (rows(pruned), rows(rebuilt))
    assert(p.nonEmpty && p === r,
      "pruned index must equal the from-scratch index on the survivors")
    // and the pruned output is range-laid again: files disjoint on bsig
    val files = new java.io.File(pruned).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filter(f => spark.read.parquet(f.getPath).limit(1).count() > 0)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getPath).agg(min("bsig"), max("bsig")).head
      (d.getString(0), d.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, "pruned files must cover disjoint bsig ranges")
      case _ => ()
    }
  }

  test("deletePqCodes equals encoding the survivors with the stored codebooks") {
    val e = embeddings
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-del").toString
    VectorOps.writePqIndex(e, "vec_id", "embedding", cbs, dir)
    val removed = e.filter(col("vec_id") % 5 === 3).select("vec_id")
    val pruned = java.nio.file.Files.createTempDirectory("graft-pq-del-p").toString
    VectorOps.deletePqCodes(spark, dir, removed, "vec_id", pruned)
    val survivors = e.filter(col("vec_id") % 5 =!= 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val got = rows(spark.read.parquet(pruned))
    val want = rows(VectorOps.pqEncode(survivors, "vec_id", "embedding", cbs))
    assert(got.nonEmpty && got === want,
      "delete-without-retrain must equal encode(survivors, stored codebooks)")
  }

  test("deletePqCodes on a composed index keeps the cid range layout") {
    val e = embeddings
    val cent = VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-del").toString
    VectorOps.writeIvfPqIndex(e, "vec_id", "embedding", cent, cbs, dir,
      numFiles = 4)
    val removed = e.filter(col("vec_id") % 5 === 3).select("vec_id")
    val pruned = java.nio.file.Files.createTempDirectory("graft-ivfpq-del-p").toString
    VectorOps.deletePqCodes(spark, dir, removed, "vec_id", pruned, numFiles = 4)
    // survivors only, and files cid-range-disjoint so probe pruning holds
    val n = spark.read.parquet(pruned)
      .join(removed, Seq("vec_id"), "left_semi").count()
    assert(n === 0, "removed ids must not survive the delete")
    val files = new java.io.File(pruned).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filter(f => spark.read.parquet(f.getPath).limit(1).count() > 0)
    assert(files.length > 1, "range layout must produce multiple files")
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getPath).agg(min("cid"), max("cid")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, "pruned files must cover disjoint cid ranges")
      case _ => ()
    }
  }

  test("residualEncodeWithCells equals pqEncode over the residual frame") {
    // The fused single-projection form must agree with the compositional
    // one (residuals → pqEncode + assignment join) — the same
    // cross-check pqEncodeWithCells has against its two-frame ancestor.
    val e = embeddings
    val cents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1))
    val cbs = VectorOps.pqCodebooksResidual(e, "vec_id", "embedding", cents,
      64, 4, 8, 1)
    val fused = VectorOps.residualEncodeWithCells(e, "vec_id", "embedding",
        cents, cbs)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    val res = VectorOps.residuals(e, "vec_id", "embedding", cents)
    val composed = VectorOps.pqEncode(res, "vec_id", "residual", cbs)
      .join(res.select("vec_id", "cid"), "vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    assert(fused.nonEmpty && fused === composed)
  }

  test("residual encoding has lower quantization error than raw at equal m/ks") {
    // THE design claim behind x78 (FAISS IVFPQ's residual form): the
    // coarse quantizer removes the between-cell component, so codebooks
    // trained on residuals quantize a lower-variance signal — the mean
    // squared reconstruction error at equal m/ks must drop. This is the
    // stable measurement; top-k RECALL on the adversarially-iid test
    // embeddings is within sampling noise of raw (x82 reports it
    // honestly) because iid data has almost no cell structure to remove
    // — real clustered embeddings are where the recall gap opens.
    val e = embeddings
    val cents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 2))
    val rawCbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 8, 16, 2)
    val resCbs = VectorOps.pqCodebooksResidual(e, "vec_id", "embedding", cents,
      64, 8, 16, 2)
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val centById = cents.toMap
    val sub = 8
    def sliceErr(v: Seq[Double], codes: Seq[Long],
                 cbs: Seq[Seq[(Long, Seq[Double])]]): Double =
      cbs.indices.map { j =>
        val cb = cbs(j).toMap
        v.slice(j * sub, (j + 1) * sub).zip(cb(codes(j)))
          .map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    val rawErr = VectorOps.pqEncode(e, "vec_id", "embedding", rawCbs)
      .collect().map { r =>
        sliceErr(vecs(r.getLong(0)), r.getSeq[Long](1), rawCbs)
      }
    val resErr = VectorOps.residualEncodeWithCells(e, "vec_id", "embedding",
        cents, resCbs)
      .collect().map { r =>
        val v = vecs(r.getLong(0))
        val c = centById(r.getLong(2))
        sliceErr(v.zip(c).map { case (a, b) => a - b }, r.getSeq[Long](1), resCbs)
      }
    val (rawMse, resMse) =
      (rawErr.sum / rawErr.length, resErr.sum / resErr.length)
    info(f"raw MSE = $rawMse%.6f, residual MSE = $resMse%.6f " +
      f"(${(1 - resMse / rawMse) * 100}%.1f%% lower)")
    assert(resMse < rawMse,
      f"residual encoding must reduce quantization error: raw=$rawMse%.6f res=$resMse%.6f")
  }

  test("cellShareTvdPpm: zero on itself, in-dist below / shifted above the gate") {
    // pl12's decision statistic: exact-integer TVD in ppm. Identity →
    // 0; an in-distribution modular split must sit below the retrain
    // threshold and a +3-shifted batch far above it — the two branches
    // the pipeline gate must separate, pinned at spec scale.
    val e = embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val shifted = batch.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") + lit(3.0))
        .as("embedding"))
    val cents = VectorOps.kmeansCentroids(base, "vec_id", "embedding", 8, 2)
    val self = VectorOps.cellShareTvdPpm(base, base, "vec_id", "embedding", cents)
    val inDist = VectorOps.cellShareTvdPpm(base, batch, "vec_id", "embedding", cents)
    val drifted = VectorOps.cellShareTvdPpm(base, shifted, "vec_id", "embedding", cents)
    info(s"self = $self, in-dist = $inDist ppm, shifted = $drifted ppm")
    assert(self === 0L, "identical corpora must have zero drift")
    assert(inDist < graft.queries.VectorQueries.RefreshDriftPpm,
      s"in-distribution batch must stay under the gate: $inDist")
    assert(drifted > graft.queries.VectorQueries.RefreshDriftPpm,
      s"shifted batch must trip the gate: $drifted")
    assert(drifted <= 1000000L, "TVD is bounded by 1 (1e6 ppm)")
  }

  test("clustered corpus: residual recall beats raw recall (x86's claim)") {
    // The companion to the MSE test: MSE drops even on iid data, but the
    // RECALL gap needs cell structure — x86's clustered derivation gives
    // the coarse quantizer a real between-cell component to remove, and
    // the residual codebooks' concentrated budget must then win the
    // routed top-k measurably, not just in reconstruction error.
    val out = graft.queries.VectorQueries
      .queries("x86_clustered_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    graft.GraftCache.release()
    val (raw, res) = (out.map(_.getLong(2)).sum, out.map(_.getLong(4)).sum)
    info(s"clustered: raw hits = $raw, residual hits = $res of ${out.map(_.getLong(1)).sum}")
    assert(res > raw,
      s"residual must out-recall raw on clustered data: raw=$raw res=$res")
  }

  test("residual serve at nprobe = |cells| ranks every cell's codes") {
    // Degenerate-probe identity, the residual twin of the raw form's
    // spec: with every cell probed, the serve is a full ADC ranking over
    // all codes — no candidate may be lost to routing.
    val e = embeddings
    val cents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1))
    val cbs = VectorOps.pqCodebooksResidual(e, "vec_id", "embedding", cents,
      64, 4, 8, 1)
    val all = VectorOps.ivfPqResidualTopK(e, "vec_id", "embedding", 0L,
      500, cents.length, cents, cbs).count()
    graft.GraftCache.release()
    assert(all === e.count() - 1,
      "nprobe = |cells| must rank every non-query vector")
  }

  test("stored residual index serves the live residual ranking") {
    val e = embeddings
    val cents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1))
    val cbs = VectorOps.pqCodebooksResidual(e, "vec_id", "embedding", cents,
      64, 4, 8, 1)
    val live = VectorOps.ivfPqResidualTopK(e, "vec_id", "embedding", 0L, 10,
      2, cents, cbs).collect().toSeq
    graft.GraftCache.release()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-res-idx").toString
    VectorOps.writeIvfPqResidualIndex(e, "vec_id", "embedding", cents, cbs,
      dir, numFiles = 4)
    val stored = VectorOps.ivfPqResidualTopKOverIndex(e, "vec_id",
      "embedding", 0L, 10, 2, VectorOps.readCentroids(spark, dir),
      VectorOps.readPqCodebooks(spark, dir),
      spark.read.parquet(s"$dir/codes")).collect().toSeq
    assert(stored === live, "the storage round trip must be result-invisible")
  }

  test("compacted appended composed index restores cid-disjoint files") {
    // x81's layout claim, pinned structurally: append breaks the range
    // layout (new files overlap standing cid ranges); compact re-lays
    // from the skinny codes alone and the files are disjoint again.
    val e = embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val cent = VectorOps.kmeansCentroids(base, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(base, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-cmp").toString
    VectorOps.writeIvfPqIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", cent, cbs, dir, numFiles = 4)
    VectorOps.appendIvfPqIndex(batch, "vec_id", "embedding", dir)
    val compacted = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-cmp-out").toString
    VectorOps.deletePqCodes(spark, dir,
      spark.range(0).select(col("id").as("vec_id")), "vec_id", compacted,
      numFiles = 4)
    // row set preserved (delete with an empty tombstone set = pure compact)
    assert(spark.read.parquet(compacted).count() ===
      spark.read.parquet(s"$dir/codes").count())
    val files = new java.io.File(compacted).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filter(f => spark.read.parquet(f.getPath).limit(1).count() > 0)
    assert(files.length > 1)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getPath).agg(min("cid"), max("cid")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, "compacted files must cover disjoint cid ranges")
      case _ => ()
    }
  }

  test("residual index append → delete → compact: every maintenance " +
       "arrow is result-invisible and the layout heals") {
    // The {residual} × {append, delete, compact} lifecycle cells in one
    // chain: base-trained quantizers store the base; the batch appends
    // through the stored tables (x90's oracle covers result-equality —
    // here the chain CONTINUES); a tombstone pass drops ids and re-lays;
    // compaction re-lays the survivors again; and the final serve must
    // equal the live residual ranking over exactly the surviving rows.
    val e = embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val cents = VectorOps.collectCentroids(
      VectorOps.kmeansCentroids(base, "vec_id", "embedding", 8, 1))
    val cbs = VectorOps.pqCodebooksResidual(base, "vec_id", "embedding",
      cents, 64, 4, 8, 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-res-lifecycle").toString
    VectorOps.writeIvfPqResidualIndex(base, "vec_id", "embedding", cents,
      cbs, dir, numFiles = 4)
    VectorOps.appendIvfPqResidualIndex(batch, "vec_id", "embedding", dir)
    // takedown: every id divisible by 3 (hits base AND appended rows)
    val removed = e.filter(col("vec_id") % 3 === 0).select("vec_id")
    val prunedDir = java.nio.file.Files
      .createTempDirectory("graft-res-pruned").toString
    VectorOps.deletePqCodes(spark, dir, removed, "vec_id",
      s"$prunedDir/codes", numFiles = 4)
    val compactDir = java.nio.file.Files
      .createTempDirectory("graft-res-compact").toString
    graft.sinks.LayoutSink.compact(spark, s"$prunedDir/codes",
      s"$compactDir/codes", targetFileBytes = 1L << 20, Some("cid"))
    val survivors = e.filter(col("vec_id") % 3 =!= 0)
    val live = VectorOps.ivfPqResidualTopK(survivors, "vec_id", "embedding",
      1L, 10, 2, cents, cbs).collect().toSeq
    graft.GraftCache.release()
    val served = VectorOps.ivfPqResidualTopKOverCodes(e, "vec_id",
      "embedding", 1L, 10, 2, cents, cbs,
      spark.read.parquet(s"$compactDir/codes")).collect().toSeq
    assert(served === live,
      "append+delete+compact must serve exactly the survivors' ranking")
  }

  test("appendBandIndexExactlyOnce: replay is detected, crash-retry " +
       "converges, distinct batches admit normally") {
    val corpus = documents.filter(col("doc_id") % 10 =!= 0)
    val batchA = documents.filter(col("doc_id") % 10 === 0)
    // disjoint from corpus ∪ batchA: fresh ids, so its band rows are new
    val batchB = documents.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft-band-eo").toString
    TextOps.writeBandIndex(corpus, "doc_id", "text", idx)
    def indexRows() = spark.read.parquet(idx)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val base = indexRows()
    assert(TextOps.appendBandIndexExactlyOnce(batchA, "doc_id", "text", idx, 0L))
    val afterA = indexRows()
    assert(afterA.values.forall(_ == 1), "no duplicate rows after admit")
    assert(afterA.size > base.size)
    // replay of the same micro-batch id: marker short-circuits, no change
    assert(!TextOps.appendBandIndexExactlyOnce(batchA, "doc_id", "text", idx, 0L))
    assert(indexRows() == afterA)
    // crash between moves and marker: marker missing, files present —
    // the retry re-derives and overwrites the same names, never adds
    new java.io.File(idx, "_batch0.done").delete()
    assert(TextOps.appendBandIndexExactlyOnce(batchA, "doc_id", "text", idx, 0L))
    assert(indexRows() == afterA)
    // crash-retry where the first attempt left MORE part files than the
    // retry writes (AQE/shuffle-config change): the pre-move sweep must
    // remove the excess stale part or its rows silently duplicate
    // (round-13 advice). Simulated by cloning a real part under a high
    // index the retry will never reach.
    val parts = new java.io.File(idx).listFiles()
      .filter(_.getName.matches("batch0-part\\d+\\.parquet"))
    java.nio.file.Files.copy(parts.head.toPath,
      java.nio.file.Paths.get(idx, "batch0-part99.parquet"))
    new java.io.File(idx, "_batch0.done").delete()
    assert(TextOps.appendBandIndexExactlyOnce(batchA, "doc_id", "text", idx, 0L))
    assert(indexRows() == afterA, "stale straggler part must not survive retry")
    assert(!new java.io.File(idx, "batch0-part99.parquet").exists())
    // staging residue never survives a successful commit
    assert(!new java.io.File(idx, "_staging_batch0").exists())
    // a genuinely new batch under a new id admits on top
    assert(TextOps.appendBandIndexExactlyOnce(batchB, "doc_id", "text", idx, 1L))
    val afterB = indexRows()
    assert(afterB.size > afterA.size && afterB.values.forall(_ == 1))
  }

  test("adaptive nprobe: the chosen value is the cheapest floor-clearing " +
       "point of the held-out recall curve, and the floor is met on the " +
       "held-out set whenever the curve reaches it") {
    import graft.queries.VectorQueries._
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cent = VectorOps.kmeansCentroids(e, "vec_id", "embedding",
      KClusters, KmeansIters)
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding",
      Dim, PqM, PqKs, KmeansIters)
    val cents = VectorOps.collectCentroids(cent)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-nprobe-idx").toString
    VectorOps.writeIvfPqIndex(e, "vec_id", "embedding", cent, cbs, idx)
    val codes = spark.read.parquet(s"$idx/codes")
    val holdout = e.filter(col("vec_id") % KnnQueryMod === RecallHoldoutRes)
    val curve = VectorOps.fitRecallCurve(holdout, "vec_id", "embedding", e,
        KnnK, KClusters, cents, cbs, codes)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(curve.keySet === (1 to KClusters).toSet)
    assert(curve.values.forall(ppm => ppm >= 0L && ppm <= 1000000L))
    val curveDf = {
      import spark.implicits._
      curve.toSeq.toDF("nprobe", "recall_ppm")
    }
    // choice semantics at the gate's floor
    val chosen = VectorOps.chooseNprobe(curveDf, RecallFloorPpm, KClusters)
    val clearing = curve.filter(_._2 >= RecallFloorPpm).keys
    if (clearing.nonEmpty) {
      assert(chosen === clearing.min)
      assert(curve(chosen) >= RecallFloorPpm,
        s"chosen nprobe $chosen misses the floor: ${curve(chosen)} ppm")
      // cheapest: every smaller nprobe is under the floor
      (1 until chosen).foreach(np =>
        assert(curve(np) < RecallFloorPpm, s"nprobe $np already clears"))
    } else assert(chosen === KClusters, "fallback must probe everything")
    // an unreachable floor always falls back; a free floor picks nprobe 1
    assert(VectorOps.chooseNprobe(curveDf, 1000001L, KClusters) === KClusters)
    assert(VectorOps.chooseNprobe(curveDf, 0L, KClusters) === 1)
  }
}
