package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-analysis and vector operators: tokenization edges, Jaccard, MinHash
  * near-dup recall, SimHash invariance, cosine identities, LSH blocking. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: empty and whitespace-only text yield an empty array") {
    val out = Seq("", "   ", "One  Two\tthree").toDF("text")
      .select(size(TextOps.tokens($"text")).as("n")).collect().map(_.getInt(0))
    assert(out.toSeq === Seq(0, 0, 3))
  }

  test("jaccard: identical token sets → 1.0, disjoint → 0.0, half overlap") {
    val df = Seq(
      ("a b c", "a b c"), ("a b", "c d"), ("a b c", "a b d")
    ).toDF("x", "y")
      .select(TextOps.jaccard(TextOps.tokens($"x"), TextOps.tokens($"y")).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) === 1.0)
    assert(js(1) === 0.0)
    assert(math.abs(js(2) - 0.5) < 1e-9)
  }

  test("minhashNearDups finds a true near-duplicate and skips unrelated docs") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " other"
    val unrelated = (100 to 140).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, doc), (2L, nearDup), (3L, unrelated)).toDF("id", "text")
    val pairs = TextOps.minhashNearDups(df, "id", "text", 0.5).collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) === ((1L, 2L)))
    assert(pairs(0).getDouble(2) > 0.9)
  }

  test("band index append: the next batch screens against the updated corpus") {
    // Nightly loop: index(corpus) → screen batch1 → APPEND batch1's bands
    // → screen batch2 against the updated index. Batch2's pairs must equal
    // the live screen against (corpus + batch1) — including any pair that
    // only exists because batch1 just entered the index.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val corpus = t.documents.filter(col("doc_id") % 10 > 1)
    val batch1 = t.documents.filter(col("doc_id") % 10 === 0)
    val batch2 = t.documents.filter(col("doc_id") % 10 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-append").toString
    TextOps.writeBandIndex(corpus, "doc_id", "text", idx)
    TextOps.appendBandIndex(batch1, "doc_id", "text", idx)
    val viaIndex = TextOps.minhashNearDupsAgainstIndex(batch2,
        spark.read.parquet(idx), corpus.unionByName(batch1),
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    val live = TextOps.minhashNearDupsAgainst(batch2,
        corpus.unionByName(batch1), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(viaIndex.nonEmpty)
    assert(viaIndex === live)

    // Compaction leg: re-lay the appended index from its own skinny bytes
    // (no corpus pass), then re-screen — identical pairs, and the files
    // are range-disjoint on bsig again (appends had broken the layout).
    val compacted = java.nio.file.Files
      .createTempDirectory("graft-idx-compact").toString
    TextOps.compactBandIndex(spark, idx, compacted, 64L * 1024)
    val viaCompacted = TextOps.minhashNearDupsAgainstIndex(batch2,
        spark.read.parquet(compacted), corpus.unionByName(batch1),
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.GraftCache.release()
    assert(viaCompacted === live)
    val ranges = new java.io.File(compacted).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min("bsig"), max("bsig")).head
        (r.getString(0), r.getString(1))
      }.sortBy(_._1)
    assert(ranges.length > 1, "compaction target must yield several files")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(lo2 > hi, s"compacted files must be bsig-disjoint: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("simhash: identical distinct-token sets hash equal; order-invariant") {
    val out = Seq("alpha beta gamma", "gamma beta alpha beta", "totally different words")
      .toDF("text")
      .select(TextOps.simhash(TextOps.tokens($"text")).as("h")).collect().map(_.getLong(0))
    assert(out(0) === out(1))   // same distinct set, different order/multiplicity
    assert(out(0) !== out(2))
    assert(out(0) >= 0L && out(0) < (1L << TextOps.SimHashBits))
  }

  test("simhashes (explode+agg) equals the per-column simhash expression") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "one two three"), (3L, ""))
      .toDF("id", "text")
      .select($"id", TextOps.tokens($"text").as("toks"))
    val viaAgg = TextOps.simhashes(df, "id", "toks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = df.select($"id", TextOps.simhash($"toks").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaCol)
  }

  test("minhashSignatures (explode+agg) equals the per-column signature") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"), (2L, "tiny"))
      .toDF("id", "text")
      .select($"id", TextOps.tokens($"text").as("toks"))
    val viaAgg = TextOps.minhashSignatures(df, "id", "toks")
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq).toMap
    val viaCol = df.select($"id",
        TextOps.minhashSignature(TextOps.shingles($"toks")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaAgg === viaCol)
  }

  test("wordCounts (explode+agg) equals per-column tokenMatches") {
    val df = Seq((1L, "en", "the cat and the dog"), (2L, "de", ""), (3L, "fr", "le le le"))
      .toDF("id", "lang", "text")
      .select($"id", $"lang", TextOps.tokens($"text").as("toks"))
    val words = Seq("the", "le")
    val viaAgg = TextOps.wordCounts(df, "id", "toks", words, extraCols = Seq("lang"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cnt_the"), r.getAs[Long]("cnt_le")))).toMap
    val viaCol = df.select($"id", size($"toks").cast("long"),
        TextOps.tokenMatches($"toks", "the").cast("long"),
        TextOps.tokenMatches($"toks", "le").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(viaAgg === viaCol)
    assert(viaAgg(2L) === ((0L, 0L, 0L))) // empty doc survives explode_outer
  }

  test("rollingHashes (codegen'd expression) equals the sequential fold rollingHash") {
    val df = Seq((1L, "hello world!"), (2L, ""), (3L, "a"), (4L, "Z" * 577),
      (5L, "mix 123 !@# " * 250), // 3000 chars — no length cap
      (6L, "café 世界"), // BMP multibyte
      (7L, "emoji 😀 pair 🔥")) // non-BMP surrogate pairs
      .toDF("id", "text")
    val viaFold = df.select($"id", TextOps.rollingHash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSum = TextOps.rollingHashes(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSum === viaFold)
    assert(viaSum(2L) === 0L)
  }

  test("md5Hash60 (codegen'd expression) equals the conv∘substring∘md5 composition") {
    val df = (Seq("", "a", "hello world", "café 世界", "emoji 😀", "x" * 1000) ++
      (1 to 100).map(i => s"shingle number $i word"))
      .toDF("s")
    val out = df.select(
      TextOps.md5Hash60($"s").as("fast"),
      TextOps.md5Hash60Composed($"s").as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null propagates; range is [0, 2^60)
    val nullRow = Seq(Tuple1(null: String)).toDF("s")
      .select(TextOps.md5Hash60($"s")).head
    assert(nullRow.isNullAt(0))
    out.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("nfcNormalize composes combining marks; fingerprintNfc collapses encodings") {
    val df = Seq(
      (1L, "caf\u00e9"),   // precomposed U+00E9
      (2L, "cafe\u0301"),       // e + combining acute U+0301
      (3L, "plain ascii")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.nfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === out(2L), "NFC must compose the combining-mark form")
    assert(out(3L) === "plain ascii", "ASCII is already NFC (identity)")
    // idempotence: normalizing a normalized string is the identity
    val twice = df.select(
      TextOps.nfcNormalize(TextOps.nfcNormalize(col("text"))).as("a"),
      TextOps.nfcNormalize(col("text")).as("b"))
      .collect()
    assert(twice.forall(r => r.getString(0) == r.getString(1)))
    // the raw fingerprint keeps the variants apart; the NFC one merges them
    val fps = df.filter($"id" <= 2).select(
      TextOps.fingerprint(col("text")).as("raw"),
      TextOps.fingerprintNfc(col("text")).as("nfc")).collect()
    assert(fps.map(_.getString(0)).distinct.length === 2)
    assert(fps.map(_.getString(1)).distinct.length === 1)
    // null propagates
    assert(Seq((1L, null: String)).toDF("id", "text")
      .select(TextOps.nfcNormalize(col("text"))).head.isNullAt(0))
  }

  test("fingerprint collapses whitespace and case, distinguishes content") {
    val out = Seq("Hello   World", "hello world", "hello  worlds")
      .toDF("t").select(TextOps.fingerprint($"t")).collect().map(_.getString(0))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("codegen'd dot product is bit-identical to the HOF fold on floats and doubles") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "fv", "dv")
    val out = df.select(
      VectorOps.dot($"fv", $"fv").as("cf"),
      VectorOps.dotHof($"fv", $"fv").as("hf"),
      VectorOps.dot($"dv", $"dv").as("cd"),
      VectorOps.dotHof($"dv", $"dv").as("hd"),
      VectorOps.dot($"fv", $"dv").as("cm"),
      VectorOps.dotHof($"fv", $"dv").as("hm")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(3)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(5)))
    }
  }

  test("codegen'd vector subtraction is bit-identical to the HOF zip_with") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "fv", "dv")
    val out = df.select(
      VectorOps.vecSub($"fv", $"dv").as("c"),
      VectorOps.vecSubHof($"fv", $"dv").as("h"),
      VectorOps.vecSub($"dv", $"dv").as("cz")).collect()
    out.foreach { r =>
      val (c, h) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(c.length === 64)
      c.zip(h).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ===
               java.lang.Double.doubleToLongBits(y))
      }
      assert(r.getSeq[Double](2).forall(_ === 0.0))
    }
    // poison contract: length mismatch → null result
    val bad = Seq((Array(1.0, 2.0), Array(1.0)))
      .toDF("a", "b").select(VectorOps.vecSub($"a", $"b")).head
    assert(bad.isNullAt(0))
  }

  test("cosine: orthogonal → 0, parallel → 1, known value") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 2.0), Array(2.0, 4.0)),
      (Array(1.0, 0.0), Array(1.0, 1.0))
    ).toDF("a", "b").select(VectorOps.cosine($"a", $"b").as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(cs(0) === 0.0)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
    assert(math.abs(cs(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK ranks the most similar vector first and excludes the query") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.bruteForceTopK(df, "vec_id", "embedding", 0L, 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("multi-probe ANN recalls at least as much as single-probe") {
    val planes = VectorOps.hyperplanes(4, 8)
    val rnd = new scala.util.Random(5)
    val df = (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val single = VectorOps.annTopK(df, "vec_id", "embedding", 0L, 10, planes,
      multiProbe = false).count()
    val multi = VectorOps.annTopK(df, "vec_id", "embedding", 0L, 10, planes,
      multiProbe = true).count()
    assert(multi >= single)
    assert(multi > 0)
  }

  test("jlProject: distance ratios concentrate at entry variance; top-k recall holds") {
    // Real embeddings at sf0.001; uniform[-1,1] plane entries have
    // variance 1/3, so projected/original squared-distance ratios must
    // concentrate near 1/3 (the fixed monotone scale the doc promises).
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val proj = VectorOps.jlProject(t.embeddings.limit(60),
        "embedding", graft.queries.VectorQueries.projPlanes)
      .select("vec_id", "embedding", "projected")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      Seq((_, fa, pa), (_, fb, pb)) <- proj.toSeq.combinations(2).toSeq
      full = d2(fa, fb) if full > 1e-9
    } yield d2(pa, pb) / full
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0 / 3) < 0.05,
      s"mean ratio $mean must sit near the 1/3 entry variance")
    assert(ratios.forall(r => r > 0.05 && r < 1.2),
      s"per-pair distortion out of range: min ${ratios.min} max ${ratios.max}")
    // Candidate-generation contract (the documented usage): a 3x
    // candidate multiplier in projected space recalls the exact top-10 —
    // generate top-30 candidates cheaply, verify exact on survivors.
    val recalls = proj.take(5).map { case (qid, qf, qp) =>
      val rest = proj.filter(_._1 != qid)
      val exact = rest.sortBy(x => d2(x._2, qf)).take(10).map(_._1).toSet
      val cands = rest.sortBy(x => d2(x._3, qp)).take(30).map(_._1).toSet
      (exact & cands).size
    }
    val meanRecall = recalls.sum / 5.0
    assert(meanRecall >= 7.0,
      s"projected top-30 must recall >=7/10 exact on average (got $recalls)")
  }

  test("knnJoinProjected: recall holds at the shipped pool and grows with it") {
    // iid synthetic embeddings are JL's adversarial case (no cluster
    // structure; true neighbours sit barely above the cosine noise
    // floor) — the shipped 48-pool measures 0.60 recall here and far
    // more on clustered real embeddings. Pin the floor AND the shape:
    // recall must improve as the candidate pool widens.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    import graft.queries.VectorQueries._
    val pred = col("vec_id") % KnnQueryMod === 0
    val exact = VectorOps.knnJoin(t.embeddings, "vec_id", "embedding",
        pred, KnnK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(pool: Int): Double = {
      val ts = VectorOps.knnJoinProjected(t.embeddings, "vec_id",
          "embedding", pred, KnnK, pool, projPlanes).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ts.size === exact.size, "same (query, k) output shape")
      (exact & ts).size.toDouble / exact.size
    }
    val narrow = recallAt(12)
    val shipped = recallAt(JlKnnCandidates)
    assert(shipped >= 0.55,
      s"recall at the shipped pool must hold (got $shipped)")
    assert(shipped > narrow,
      s"recall must grow with the pool ($narrow -> $shipped)")
  }

  test("pqEncode: codes are valid codebook entries, one per subspace, deterministic") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    assert(cbs.length === 4)
    assert(cbs.forall(_.forall(_._2.length === 16)), "16-dim sub-centroids")
    val codes = VectorOps.pqEncode(e, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.values.forall(_.length === 4), "one code per subspace")
    codes.values.foreach(cs => cs.zipWithIndex.foreach { case (c, j) =>
      assert(cbs(j).exists(_._1 === c), s"code $c not in codebook $j")
    })
    val again = VectorOps.pqEncode(e, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes === again)
  }

  test("argminAssignJoin (large-k broadcast form) is bit-identical to the " +
       "literal argmin — same cids, same rounded distances, ties included") {
    // The round-13 verdict's plan-size-ceiling fix: above ArgminLiteralMaxK
    // assignment routes through a broadcast join + min(struct) instead of
    // k inlined literal trees. Pin the two forms bit-equal on a 100-cell
    // quantizer over the real sf0.001 embeddings — the k-means chains,
    // drift statistics, and the x92 gate all ride on this equivalence.
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cents = e.filter($"vec_id" < 100)
      .select($"vec_id".cast("long"),
        org.apache.spark.sql.functions.transform(
          $"embedding", _.cast("double")).as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(cents.size > VectorOps.ArgminLiteralMaxK)
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = collected(
      VectorOps.argminAssignLiteral(e, "vec_id", "embedding", cents))
    val join = collected(
      VectorOps.argminAssignJoin(e, "vec_id", "embedding", cents))
    assert(join === lit)
    // ... and the exact-tie path: duplicate centroids force d-equality,
    // where both forms must break on the lowest cid
    val dup = Seq((5L, cents.head._2), (3L, cents.head._2)) ++ cents.tail
    val litT = collected(
      VectorOps.argminAssignLiteral(e, "vec_id", "embedding", dup))
    val joinT = collected(
      VectorOps.argminAssignJoin(e, "vec_id", "embedding", dup))
    assert(joinT === litT)
    // the with-dist variant's large-k branch agrees with a literal replay
    val centDf = spark.createDataFrame(cents).toDF("cid", "c")
    val wd = VectorOps.assignToCentroidsWithDist(e, "vec_id", "embedding", centDf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    wd.foreach { case (id, (cid, _)) => assert(cid === lit(id)) }
  }

  test("pqEncode at large ks (broadcast __cb form) matches an independent " +
       "driver-side argmin model, and large-k residuals subtract exactly") {
    // ks=128 > ArgminLiteralMaxK routes the encode through the ArgMinCells
    // fold over the one-row codebook broadcast; pin it against a local
    // re-computation with the same fold order and lowest-cid ties.
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val dim = 64; val m = 4; val sub = dim / m; val ks = 128
    assert(ks > VectorOps.ArgminLiteralMaxK)
    // synthetic codebooks from the first ks vectors' subvectors (no
    // training — this spec pins ENCODE, x93 gates the trained chain)
    val first = e.filter($"vec_id" < ks).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val cbs: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map(j =>
      first.map { case (id, v) => (id, v.slice(j * sub, (j + 1) * sub)) }.toSeq)
    val got = VectorOps.pqEncode(e, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def l2Local(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
    val vecs = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until m).map { j =>
        val s = v.slice(j * sub, (j + 1) * sub)
        cbs(j).map { case (cid, c) => (l2Local(s, c), cid) }.min._2
      }
      assert(got(id) === expect, s"vec $id")
    }
    // large-k residuals: the broadcast-join path must subtract the
    // ASSIGNED centroid exactly (element = v_i.toDouble - c_i)
    val cents = first.map { case (id, v) => (id, v.toSeq) }.toSeq
    val res = VectorOps.residuals(e, "vec_id", "embedding", cents)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    res.take(20).foreach { case (id, (cid, r)) =>
      val expect = vecs(id).zip(cents.find(_._1 == cid).get._2)
        .map { case (a, b) => a - b }
      assert(r === expect, s"vec $id residual")
    }
  }

  test("ADC distance equals L2 to the reconstructed (decoded) vector") {
    // sum_j l2sq(q_j, cb_j[code_j]) is algebraically l2sq(q, concat of the
    // code's centroids) — the identity that makes ADC a distance to the
    // quantized reconstruction. Verified within float tolerance (the two
    // computations fold in different orders).
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val top = VectorOps.pqTopK(e, "vec_id", "embedding", 0L, 5, cbs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = VectorOps.pqEncode(e, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byId = cbs.map(_.toMap)
    val q = e.filter($"vec_id" === 0L).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    top.foreach { case (id, adc) =>
      val recon = codes(id).zipWithIndex.flatMap { case (c, j) => byId(j)(c) }
      val direct = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - direct) < 1e-6, s"vec $id: adc=$adc direct=$direct")
    }
  }

  test("appendPqIndex: appended codes serve identically to encode-everything") {
    // Write the index from the base split, append the held-out batch, and
    // serve — the result must land exactly where encoding the WHOLE corpus
    // with the same base-trained codebooks lands: appended codes are
    // first-class citizens of the index, and the append touches only the
    // batch (codes row count grows by exactly |batch|).
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = e.filter($"vec_id" % 10 =!= 0)
    val batch = e.filter($"vec_id" % 10 === 0)
    val cbs = VectorOps.pqCodebooks(base, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-append").toString
    VectorOps.writePqIndex(base, "vec_id", "embedding", cbs, dir)
    val baseCount = spark.read.parquet(s"$dir/codes").count()
    VectorOps.appendPqIndex(batch, "vec_id", "embedding", dir)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() === baseCount + batch.count(),
      "append adds exactly the batch; the standing codes are untouched")
    val served = VectorOps.pqTopKOverCodes(e, "vec_id", "embedding", 1L, 10,
      VectorOps.readPqCodebooks(spark, dir), codes).collect().toSeq
    val direct = VectorOps.pqTopK(e, "vec_id", "embedding", 1L, 10, cbs)
      .collect().toSeq
    graft.GraftCache.release()
    assert(served === direct,
      "write-then-append must equal encode-everything with the same codebooks")
  }

  test("ivfPqTopKOverIndex: the stored composed index serves the live IVF-PQ ranking") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cent = VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    VectorOps.writeIvfPqIndex(e, "vec_id", "embedding", cent, cbs, dir,
      numFiles = 4)
    val live = VectorOps.ivfPqTopK(e, "vec_id", "embedding", 0L, 10, cent, 2, cbs)
      .collect().toSeq
    val stored = VectorOps.ivfPqTopKOverIndex(e, "vec_id", "embedding", 0L, 10,
        2, spark.read.parquet(s"$dir/centroids"),
        VectorOps.readPqCodebooks(spark, dir),
        spark.read.parquet(s"$dir/codes"))
      .collect().toSeq
    graft.GraftCache.release()
    assert(stored === live, "the storage round trip must be result-invisible")
    // the layout contract: >1 files, each covering a disjoint cid range,
    // so the probe predicate can prune files on min/max stats
    val files = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "range layout must produce multiple files")
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("cid"),
          org.apache.spark.sql.functions.max("cid")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, "files must cover disjoint cid ranges")
      case _ => ()
    }
  }

  test("appendIvfPqIndex: appended rows serve identically to write-everything") {
    // Composed-index twin of the appendPqIndex gate: base writes the
    // index, the batch appends with the STORED quantizers, and the routed
    // serve over the appended index must equal the serve over an index
    // written whole with the same centroids + codebooks.
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = e.filter($"vec_id" % 10 =!= 0)
    val batch = e.filter($"vec_id" % 10 === 0)
    val cent = VectorOps.kmeansCentroids(base, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(base, "vec_id", "embedding", 64, 4, 8, 1)
    val appended = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    VectorOps.writeIvfPqIndex(base, "vec_id", "embedding", cent, cbs, appended,
      numFiles = 4)
    val baseCount = spark.read.parquet(s"$appended/codes").count()
    VectorOps.appendIvfPqIndex(batch, "vec_id", "embedding", appended)
    val whole = java.nio.file.Files.createTempDirectory("graft-ivfpq-whole").toString
    VectorOps.writeIvfPqIndex(e, "vec_id", "embedding", cent, cbs, whole,
      numFiles = 4)
    assert(spark.read.parquet(s"$appended/codes").count() ===
      baseCount + batch.count(), "append adds exactly the batch")
    def serve(dir: String) = VectorOps.ivfPqTopKOverIndex(e, "vec_id",
        "embedding", 1L, 10, 2, spark.read.parquet(s"$dir/centroids"),
        VectorOps.readPqCodebooks(spark, dir), spark.read.parquet(s"$dir/codes"))
      .collect().toSeq
    val (a, w) = (serve(appended), serve(whole))
    graft.GraftCache.release()
    assert(a === w, "write-then-append must equal write-everything " +
      "with the same stored quantizers")
  }

  test("routed batch kNN with nprobe = |cells| equals the all-codes ADC join") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cent = VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-routed-idx").toString
    VectorOps.writeIvfPqIndex(e, "vec_id", "embedding", cent, cbs, dir,
      numFiles = 4)
    val queries = e.filter($"vec_id" % 50 === 0)
    val codes = spark.read.parquet(s"$dir/codes")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("adc_d2"))
    val routedAll = VectorOps.pqKnnAgainstCodesRouted(queries, "vec_id",
        "embedding", 3, 8, spark.read.parquet(s"$dir/centroids"),
        VectorOps.readPqCodebooks(spark, dir), codes)
      .collect().map(key).toSet
    val fullScan = VectorOps.pqKnnAgainstCodes(queries, "vec_id", "embedding",
        codes, 3, cbs).collect().map(key).toSet
    // and with a real nprobe cut, every routed result is a subset drawn
    // from the probed cells — never a vector outside them
    val routed = VectorOps.pqKnnAgainstCodesRouted(queries, "vec_id",
        "embedding", 3, 2, spark.read.parquet(s"$dir/centroids"),
        VectorOps.readPqCodebooks(spark, dir), codes)
      .collect().map(key)
    graft.GraftCache.release()
    assert(routedAll === fullScan,
      "probing every cell must recover the unrouted ranking")
    assert(routed.nonEmpty && routed.forall { case (_, _, d) => d >= 0.0 })
  }

  test("IVF-PQ with nprobe = |cells| degenerates to the full ADC scan") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cent = VectorOps.kmeansCentroids(e, "vec_id", "embedding", 8, 1)
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 4, 8, 1)
    val full = VectorOps.pqTopK(e, "vec_id", "embedding", 0L, 10, cbs)
      .collect().toSeq
    val ivfpq = VectorOps.ivfPqTopK(e, "vec_id", "embedding", 0L, 10, cent, 8, cbs)
      .collect().toSeq
    graft.GraftCache.release()
    assert(ivfpq === full, "probing every cell must recover the unpartitioned ranking")
  }

  test("two-stage PQ refine never recalls less than raw ADC ranking") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val pred = col("vec_id") % 100 === 0
    val cbs = VectorOps.pqCodebooks(e, "vec_id", "embedding", 64, 8, 16, 1)
    val q = e.filter(pred).select(col("vec_id").as("qid"), col("embedding").as("__qv"))
    val exact = graft.plans.TopKPerKey.topKPerKey(
      e.select(col("vec_id"), col("embedding").as("__v"))
        .crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          VectorOps.l2sq(col("__v"), col("__qv")).as("d2")),
      Seq("qid"), Seq(col("d2"), col("vec_id")), 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).count(exact)
    val adcHits = hits(VectorOps.pqKnnJoin(e, "vec_id", "embedding", pred, 3, cbs))
    val refinedHits = hits(
      VectorOps.pqKnnJoinRefined(e, "vec_id", "embedding", pred, 3, 24, cbs))
    assert(refinedHits >= adcHits,
      s"refined ($refinedHits) must dominate raw ADC ($adcHits)")
  }

  test("nearDupPairs blocks by LSH bucket and finds identical vectors") {
    val planes = VectorOps.hyperplanes(4, 3)
    val df = Seq(
      (1L, Array(0.5f, 0.5f, 0.0f)),
      (2L, Array(0.5f, 0.5f, 0.0f)),   // identical → same bucket, sim 1.0
      (3L, Array(-0.5f, -0.5f, 0.0f))  // antipodal → different bucket
    ).toDF("vec_id", "embedding")
    val pairs = VectorOps.nearDupPairs(df, "vec_id", "embedding", planes, 0.99).collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(1), pairs(0).getLong(2)) === ((1L, 2L)))
    assert(pairs(0).getDouble(3) === 1.0)
  }

  test("scrubPii replaces emails and URLs with placeholders, leaves text intact") {
    val out = Seq(
      "contact me at john.doe+spam@example.co.uk today",
      "see https://example.com/a?b=1 and http://x.io",
      "no pii here at all"
    ).toDF("t").select(TextOps.scrubPii($"t")).collect().map(_.getString(0))
    assert(out(0) === "contact me at <EMAIL> today")
    assert(out(1) === "see <URL> and <URL>")
    assert(out(2) === "no pii here at all")
  }

  test("tokenChunks windows with overlap; short tail kept; empty doc empty") {
    val toks = TextOps.tokens(lit((1 to 10).map(i => s"t$i").mkString(" ")))
    val chunks = Seq(1).toDF("x")
      .select(TextOps.tokenChunks(toks, windowSize = 4, step = 3).as("c"))
      .head.getSeq[Seq[String]](0)
    assert(chunks.length === 4)                      // starts 1,4,7,10
    assert(chunks(0) === Seq("t1", "t2", "t3", "t4"))
    assert(chunks(1) === Seq("t4", "t5", "t6", "t7")) // overlap of 1
    assert(chunks(3) === Seq("t10"))                  // short tail
    val empty = Seq(1).toDF("x")
      .select(TextOps.tokenChunks(TextOps.tokens(lit("")), 4, 3)).head.getSeq[Any](0)
    assert(empty.isEmpty)
  }

  test("language ID picks the marker-word argmax with declaration-order ties") {
    val out = Seq(
      "the cat and the dog of note",  // en markers
      "der hund und die katze",       // de markers
      "no markers here whatsoever"    // zero scores → first language wins
    ).toDF("text")
      .select(TextOps.predictedLang(TextOps.tokens($"text"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "en"))
  }

  test("repetitionMetrics: hand-computed duplicate/top bigram fractions") {
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> total 5,
    // distinct 2, top ("a b") 3 => dup = 1 - 2/5 = 0.6, top = 3/5 = 0.6
    // "w x y z": 3 distinct bigrams, no repeats => dup 0.0, top 1/3
    // "solo": < 2 tokens => no row
    val docs = Seq(
      ("d1", "a b a b a b"),
      ("d2", "w x y z"),
      ("d3", "solo")
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set("d1", "d2"))
    assert(out("d1") === ((5L, 0.6, 0.6)))
    assert(out("d2") === ((3L, 0.0, 0.3333)))
  }
}
