package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hybrid-retrieval operators: BM25 arithmetic against a hand-computed
  * value, candidate-list ranking, RRF fusion semantics — plus the round-8
  * dedup extensions (cross-document span dedup, SemDeDup cluster dedup). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def toked(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))

  test("bm25 matches the hand-computed Okapi formula") {
    val df = toked(
      1L -> "spark spark join",
      2L -> "spark other words here",
      3L -> "nothing relevant at all")
    val out = Retrieval.bm25(df, "doc_id", "toks", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    // N=3, df=2, avgdl=(3+4+4)/3; idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    val avgdl = 11.0 / 3
    def score(tf: Double, dl: Double): Double = {
      val raw = math.log(1.6) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.rint(raw * 1e4) / 1e4
    }
    assert(out(1L) === score(2, 3))
    assert(out(2L) === score(1, 4))
    assert(out(3L) === 0.0) // tf = 0 → zero contribution
    assert(out(1L) > out(2L))
  }

  test("topCandidates ranks 1..c by (score DESC, id ASC) and cuts at c") {
    val scored = Seq((10L, 3.0), (11L, 5.0), (12L, 5.0), (13L, 1.0))
      .toDF("id", "score")
    val out = Retrieval.topCandidates(scored, "id", "score", 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank")))
    // 5.0 tie breaks on id; 1.0 falls below the c=3 cut
    assert(out.toSet === Set((11L, 1L), (12L, 2L), (10L, 3L)))
  }

  test("rrfFuse sums reciprocal ranks and reports 0 for absent lists") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(a, b, "id", 10).collect()
      .map(r => (r.getAs[Long]("id"),
        (r.getAs[Double]("rrf"), r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b"))))
    def rrf(v: Double) = math.rint(v * 1e6) / 1e6
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 3L)) // both-list doc wins
    val m = out.toMap
    assert(m(2L) === ((rrf(1.0 / 62 + 1.0 / 61), 2L, 1L)))
    assert(m(1L) === ((rrf(1.0 / 61), 1L, 0L)))
    assert(m(3L) === ((rrf(1.0 / 62), 0L, 2L)))
  }

  // ------------------------------------------------------------ span dedup

  test("spanDedup drops cross-document spans and reassembles in order") {
    val df = Seq(
      (1L, "a b c d e f g"), // spans: "a b c" | "d e f" | "g"
      (2L, "a b c x y z"),   // shares "a b c" with doc 1
      (3L, "")               // zero spans
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(df, "doc_id", "text", 3, 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_clean_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((3L, 1L, 4L, "d e f g")))
    assert(out(2L) === ((2L, 1L, 3L, "x y z")))
    assert(out(3L) === ((0L, 0L, 0L, "")))
  }

  test("spanDedup counts DISTINCT documents: within-doc repeats survive") {
    val df = Seq((1L, "p q r s t u p q r")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(df, "doc_id", "text", 3, 2).collect()(0)
    assert(out.getAs[Long]("n_dropped") === 0L)
    assert(out.getAs[String]("clean_text") === "p q r s t u p q r")
  }

  // ------------------------------------------------- exact-substring dedup

  test("substringDedup catches a shared passage at ANY alignment and " +
       "excises exactly its token interval") {
    // doc 2 embeds doc 1's "c d e" passage OFF chunk boundaries: x34's
    // non-overlapping 3-token chunks ("z1 z2 c", "d e z3") would miss it;
    // the sliding window must flag it and cut exactly those three tokens.
    val df = Seq(
      (1L, "a b c d e"),       // windows: "a b c","b c d","c d e"
      (2L, "z1 z2 c d e z3"),  // shares only the "c d e" window, shifted
      (3L, "")                 // zero tokens
    ).toDF("doc_id", "text")
    val out = TextOps.substringDedup(df, "doc_id", "text", 3, 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped_tokens"),
          r.getAs[Long]("n_clean_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((5L, 3L, 2L, "a b")))
    assert(out(2L) === ((6L, 3L, 3L, "z1 z2 z3")))
    assert(out(3L) === ((0L, 0L, 0L, "")))
  }

  test("substringDedup unions overlapping flagged windows into one cover") {
    // docs share a 5-token passage → three overlapping flagged 3-windows
    // in each; the interval union must drop exactly the 5 passage tokens,
    // not 9, and leave the distinct tails intact
    val df = Seq(
      (1L, "p q r s t own1"),
      (2L, "p q r s t own2")
    ).toDF("doc_id", "text")
    val out = TextOps.substringDedup(df, "doc_id", "text", 3, 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_dropped_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((5L, "own1")))
    assert(out(2L) === ((5L, "own2")))
  }

  test("substringDedup: within-doc repeats survive (distinct-doc count) " +
       "and short docs pass through whole") {
    val df = Seq(
      (1L, "p q r p q r"),  // repeated within ONE doc only
      (2L, "u v")           // shorter than one window
    ).toDF("doc_id", "text")
    val out = TextOps.substringDedup(df, "doc_id", "text", 3, 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_dropped_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((0L, "p q r p q r")))
    assert(out(2L) === ((0L, "u v")))
  }

  // --------------------------------------------- within-doc repetition cut

  test("selfRepetitionDedup keeps the first occurrence of a repeated " +
       "window and excises later copies, within one doc only") {
    val df = Seq(
      (1L, "a b c x a b c y"),  // "a b c" repeats at pos 4 -> drop 4..6
      (2L, "a b c z"),          // same window as doc 1 — cross-doc is NOT a repeat
      (3L, "u v")               // shorter than one window
    ).toDF("doc_id", "text")
    val out = TextOps.selfRepetitionDedup(df, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_dropped_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((3L, "a b c x y")))
    assert(out(2L) === ((0L, "a b c z")))
    assert(out(3L) === ((0L, "u v")))
  }

  test("selfRepetitionDedup: overlapping repeats union into one cover " +
       "against the original text (one pass, no re-scan)") {
    // "p q p q p q": windows(2): pq(0) qp(1) pq(2) qp(3) pq(4); repeats at
    // 2,3,4 -> union drops tokens 2..5, leaving "p q"
    val df = Seq((1L, "p q p q p q")).toDF("doc_id", "text")
    val out = TextOps.selfRepetitionDedup(df, "doc_id", "text", 2).collect()(0)
    assert(out.getAs[Long]("n_dropped_tokens") === 4L)
    assert(out.getAs[String]("clean_text") === "p q")
  }

  // ------------------------------------------------------ span corruption

  test("spanCorruption matches an independent local T5 model: hash mask, " +
       "maximal-run merge, sentinel numbering, terminator") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val spanLen = 2
    val maskMod = 3
    def local(id: Long, toks: Seq[String]): (Long, Long, String, String) = {
      val starts = toks.indices.filter(p => h60(s"$id:$p") % maskMod == 0)
      val masked = starts.flatMap(p => p until math.min(p + spanLen, toks.size))
        .distinct.sorted.toSet
      // maximal runs in position order
      val runs = toks.indices.filter(masked).foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      val runOf = runs.zipWithIndex.flatMap { case (r, k) => r.map(_ -> k) }.toMap
      val input = toks.indices.flatMap { p =>
        if (!masked(p)) Some(toks(p))
        else if (runs(runOf(p)).head == p) Some(s"<extra_id_${runOf(p)}>")
        else None
      }.mkString(" ")
      val target = (runs.zipWithIndex.map { case (r, k) =>
        s"<extra_id_$k> " + r.map(toks).mkString(" ")
      } :+ s"<extra_id_${runs.size}>").mkString(" ")
      (masked.size.toLong, runs.size.toLong, input, target)
    }
    val docs = Seq(
      1L -> "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9",
      2L -> "a b c",
      3L -> "")
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.spanCorruption(df, "doc_id", "text", spanLen, maskMod)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_masked"), r.getAs[Long]("n_spans"),
          r.getAs[String]("input_text"), r.getAs[String]("target_text")))).toMap
    for ((id, text) <- docs) {
      val toks = if (text.isEmpty) Seq() else text.split(" ").toSeq
      assert(out(id) === local(id, toks), s"doc $id")
    }
    // the fixture must actually exercise a run MERGE somewhere (two starts
    // whose covers touch) or the test proves too little
    val merged = docs.exists { case (id, text) =>
      val n = if (text.isEmpty) 0 else text.split(" ").length
      val starts = (0 until n).filter(p => h60(s"$id:$p") % maskMod == 0)
      starts.sliding(2).exists(w => w.size == 2 && w(1) - w(0) <= spanLen)
    }
    assert(merged, "fixture has no overlapping/adjacent spans — enlarge it")
  }

  // ------------------------------------------------------- hard negatives

  test("hardNegatives excludes same-label neighbors BEFORE the cut, so " +
       "each query still gets k true negatives") {
    // query 0L (label 0): nearest is 1L (label 0 — same, excluded even
    // though most similar), then 2L/3L (label 1). With k=2 the result
    // must be [2L, 3L] — a post-kNN filter would have returned only one.
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.14f), 0),   // same label, closest
      (2L, Array(0.9f, 0.44f), 1),
      (3L, Array(0.7f, 0.71f), 1),
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = VectorOps.hardNegatives(df, "vec_id", "embedding", "label",
        col("vec_id") === 0L, 2)
      .orderBy("rk")
      .select("vec_id", "neg_label", "rk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((2L, 1, 1), (3L, 1, 2)))
  }

  // --------------------------------------------------- incremental near-dup

  test("minhashNearDupsAgainst finds cross pairs only, never within-frame") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " other"
    val unrelated = (100 to 140).map(i => s"z$i").mkString(" ")
    // indexed holds the original AND an exact in-index duplicate pair —
    // which must NOT be reported (index x index is the standing corpus's
    // own dedup problem, not the incremental screen's)
    val indexed = Seq((1L, doc), (2L, unrelated), (3L, unrelated)).toDF("id", "text")
    val newBatch = Seq((10L, nearDup), (11L, "fresh content entirely new"))
      .toDF("id", "text")
    val out = TextOps.minhashNearDupsAgainst(newBatch, indexed, "id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.GraftCache.release()
    assert(out.toSeq === Seq((10L, 1L)))
  }

  // -------------------------------------------------------------- semdedup

  test("semanticDedup drops greedy within-cluster near-dups only") {
    val centroids = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "c")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),   // cluster 0, kept (lowest id)
      (1L, Seq(0.99f, 0.1f)),  // cluster 0, cos(v0,v1) ≈ 0.995 → dropped
      (2L, Seq(0.0f, 1.0f)),   // cluster 1, alone → kept
      (3L, Seq(0.5f, 0.5f))    // L2-tie → cluster 0; cos to mates < 0.99 → kept
    ).toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedup(vecs, "vec_id", "embedding",
        centroids, 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("is_kept")))).toMap
    assert(out(0L) === ((0L, true)))
    assert(out(1L) === ((0L, false)))
    assert(out(2L) === ((1L, true)))
    assert(out(3L) === ((0L, true)))
  }

  test("ivfKnnJoin: probing every cell degenerates to the exact join; " +
      "fewer probes return a subset") {
    val vecs = (0L until 20L).map { i =>
      val a = (i % 7).toFloat / 7f; val b = (i % 5).toFloat / 5f
      (i, Array(1f + a, -1f + b, a * b))
    }.toDF("vec_id", "embedding")
    val cent = VectorOps.kmeansCentroids(vecs, "vec_id", "embedding", 3, 2)
    val pred = col("vec_id") % 6 === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = rows(VectorOps.knnJoin(vecs, "vec_id", "embedding", pred, 4))
    val all = rows(VectorOps.ivfKnnJoin(vecs, "vec_id", "embedding", pred,
      4, cent, nprobe = 3))
    assert(all === exact, "nprobe = |cells| must reproduce the exact join")
    // fewer probes: the approximate best can never BEAT the exact best
    def best(df: org.apache.spark.sql.DataFrame) = df.filter(col("rk") === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Double]("sim_r")).toMap
    val exactBest = best(VectorOps.knnJoin(vecs, "vec_id", "embedding", pred, 4))
    val someBest = best(VectorOps.ivfKnnJoin(vecs, "vec_id", "embedding",
      pred, 4, cent, nprobe = 1))
    someBest.foreach { case (qid, sim) =>
      assert(sim <= exactBest(qid) + 1e-12,
        s"query $qid: approximate top-1 $sim beats exact ${exactBest(qid)}")
    }
  }

  test("ivfKnnJoin at LARGE k (broadcast __cells probe path) still " +
       "degenerates to the exact join at nprobe = |cells|") {
    // cents > ArgminLiteralMaxK routes BOTH the corpus assignment
    // (ArgMinCells) and the per-query probe ranking (transform over the
    // one-row __cells broadcast) through the large-k forms; probing every
    // cell must still reproduce the exact kNN join exactly — the
    // end-to-end equivalence that pins the probe pipeline's arithmetic
    // and ordering.
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val k = 100
    assert(k > VectorOps.ArgminLiteralMaxK)
    val cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _.cast("double")).as("c"))
    val pred = col("vec_id") % 50 === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = rows(VectorOps.knnJoin(e, "vec_id", "embedding", pred, 3))
    val all = rows(VectorOps.ivfKnnJoin(e, "vec_id", "embedding", pred,
      3, cent, nprobe = k))
    assert(all === exact,
      "large-k nprobe = |cells| must reproduce the exact join")
  }

  test("nearDupPairsAgainst: cross-frame pairs only, within-frame dups ignored") {
    val planes = VectorOps.hyperplanes(3, 2)
    val eval = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(1.0f, 0.0f)), // dups of each other
      (12L, Array(0.0f, -1.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(0.99f, 0.05f)),   // near (1,0) → flags 10 and 11
      (2L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorOps.nearDupPairsAgainst(eval, train, "vec_id",
        "embedding", planes, 0.9)
      .collect().map(r => (r.getAs[Long]("id_eval"), r.getAs[Long]("id_train")))
      .toSet
    assert(out === Set((10L, 1L), (11L, 1L)),
      "both eval copies flag on the train neighbour; the eval-eval dup " +
        s"pair must NOT appear: $out")
  }

  test("embeddingDrift: frozen old geometry surfaces share shift and " +
      "dispersion jump") {
    // Old snapshot: tight cluster A around (1,0) (ids 0,2,3,4) and B
    // around (0,1) (ids 1,5,6); ids 0/1 seed the two centroids.
    val old = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(1.1f, -0.1f)), (4L, Array(1.0f, 0.1f)),
      (1L, Array(0.0f, 1.0f)), (5L, Array(0.1f, 0.9f)),
      (6L, Array(-0.1f, 1.1f))).toDF("vec_id", "embedding")
    // New snapshot: A grows by one tight point; B loses its tight mates
    // and gains two FAR points — B's share falls and its dispersion jumps.
    val neu = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(1.1f, -0.1f)), (4L, Array(1.0f, 0.1f)),
      (7L, Array(0.95f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (8L, Array(0.5f, 1.5f)), (9L, Array(-0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.embeddingDrift(old, neu, "vec_id", "embedding",
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 2)
    val a = out(0L); val b = out(1L)
    assert(a.getAs[Long]("n_old") === 4L && a.getAs[Long]("n_new") === 5L)
    assert(b.getAs[Long]("n_old") === 3L && b.getAs[Long]("n_new") === 3L)
    assert(a.getAs[Double]("share_delta") > 0 &&
      b.getAs[Double]("share_delta") < 0)
    assert(b.getAs[Double]("mean_d2_new") > b.getAs[Double]("mean_d2_old") * 5,
      "the far points must blow up B's dispersion against the frozen cells")
    // shares telescope to 1 on each side
    assert(math.abs(out.values.map(_.getAs[Double]("share_old")).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_.getAs[Double]("share_new")).sum - 1.0) < 1e-9)
  }

  test("semanticDedup greedy form: dropped mates still disqualify later ids") {
    // chain: v0~v1 and v1~v2 but v0!~v2 — v1 drops on v0; v2 drops on v1
    // even though v1 itself was dropped (the anti-chain keep-first form).
    val centroids = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "c")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),       // 0°
      (1L, Seq(0.9397f, 0.342f)),  // 20°: cos(v0,v1) ≈ 0.94 ≥ 0.9
      (2L, Seq(0.766f, 0.6428f))   // 40°: cos(v1,v2) ≈ 0.94; cos(v0,v2) ≈ 0.77 < 0.9
    ).toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedup(vecs, "vec_id", "embedding",
        centroids, 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept"))
      .toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> false))
  }
}
