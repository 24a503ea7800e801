package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operators: SimHash near-dup recall, deterministic
  * sampling, quota caps, decontamination, quantization bounds, sharded
  * shuffle, and sequence packing invariants. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- domain mixing

  test("domainMixResample downsamples over-represented strata at target/actual") {
    // stratum a holds 3/4 of the mass but targets 1/4 → rate 1/3;
    // stratum b under-represented → rate clamps to 1.0 (kept whole)
    val rows = (1L to 30L).map(i => (i, "a", 10L)) ++
      (31L to 40L).map(i => (i, "b", 10L))
    val df = rows.toDF("id", "s", "n")
    val kept = Curation.domainMixResample(df, "s", "id", "n",
      Map("a" -> 0.25), 0.75, buckets = 1000)
    val out = kept.groupBy("s").agg(
        count(lit(1)).as("n"), max("mix_rate").as("r"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("r")))).toMap
    assert(out("b") === ((10L, 1.0)), "under-represented stratum keeps all rows")
    val rateA = out("a")._2
    assert(math.abs(rateA - (0.25 / 0.75)) < 1e-12)
    // the keep set is exactly the hash-coin selection at that rate
    val expectA = df.filter($"s" === "a")
      .filter(Curation.hashBucket($"id", 1000) < rateA * 1000)
      .count()
    assert(out("a")._1 === expectA && expectA > 0 && expectA < 30)
  }

  test("domainMixResample is deterministic and a subset of the input") {
    val df = (1L to 50L).map(i => (i, if (i % 3 == 0) "x" else "y", i))
      .toDF("id", "s", "n")
    val k1 = Curation.domainMixResample(df, "s", "id", "n", Map("x" -> 0.5), 0.5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val k2 = Curation.domainMixResample(df, "s", "id", "n", Map("x" -> 0.5), 0.5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(k1 === k2)
    assert(k1.toSet.subsetOf((1L to 50L).toSet))
  }

  test("domainMixResampleUp boosts under-represented strata by row repetition") {
    // stratum a: 3/4 of mass, target 1/4 → rate 1/3 (downsample, rep=0);
    // stratum b: 1/4 of mass, target 3/4 → rate 3.0 (every row 3 copies)
    val rows = (1L to 30L).map(i => (i, "a", 10L)) ++
      (31L to 40L).map(i => (i, "b", 10L))
    val df = rows.toDF("id", "s", "n")
    val up = Curation.domainMixResampleUp(df, "s", "id", "n",
      Map("a" -> 0.25, "b" -> 0.75), 0.0, buckets = 1000)
    val byId = up.groupBy("s", "id")
      .agg(count(lit(1)).as("c"), max("rep").as("mr"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Long]("c"), r.getAs[Long]("mr")))
    val b = byId.filter(_._1 == "b")
    assert(b.length === 10 && b.forall(x => x._3 === 3L && x._4 === 2L),
      "rate 3.0 must give exactly 3 copies (rep 0..2) of every b row")
    // the downsampled stratum matches the capped operator's keep set exactly
    val aKept = byId.filter(_._1 == "a")
    assert(aKept.forall(x => x._3 === 1L && x._4 === 0L))
    val capped = Curation.domainMixResample(df, "s", "id", "n",
        Map("a" -> 0.25, "b" -> 0.75), 0.0, buckets = 1000)
      .filter($"s" === "a").select("id").collect().map(_.getLong(0)).toSet
    assert(aKept.map(_._2).toSet === capped)
  }

  test("domainMixResampleUp fractional rates: copies are floor or ceil, coin-exact") {
    // stratum b: 1/4 of mass, target 5/8 → rate 2.5 → 2 or 3 copies per row
    val rows = (1L to 30L).map(i => (i, "a", 10L)) ++
      (31L to 40L).map(i => (i, "b", 10L))
    val df = rows.toDF("id", "s", "n")
    val up = Curation.domainMixResampleUp(df, "s", "id", "n",
      Map("a" -> 0.375, "b" -> 0.625), 0.0, buckets = 1000)
    val counts = up.filter($"s" === "b").groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size === 10 && counts.values.forall(c => c == 2L || c == 3L))
    val extra = df.filter($"s" === "b")
      .filter(Curation.hashBucket($"id", 1000) < lit(0.5) * 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(counts.filter(_._2 == 3L).keySet === extra,
      "the extra copy must land exactly where the hash coin says")
    // determinism: a rerun reproduces the multiset including rep indices
    val r1 = up.select("id", "rep").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r2 = Curation.domainMixResampleUp(df, "s", "id", "n",
        Map("a" -> 0.375, "b" -> 0.625), 0.0, buckets = 1000)
      .select("id", "rep").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(r1 === r2)
  }

  test("temperatureResample: alpha=1 keeps the mix, alpha=0 targets uniform") {
    // stratum a: 3/4 of mass, b: 1/4. alpha=1 → every rate 1.0 (identity,
    // all rows once). alpha=0 → uniform targets (1/2, 1/2): a rate 2/3,
    // b rate 2.0 (every b row exactly twice).
    val rows = (1L to 30L).map(i => (i, "a", 10L)) ++
      (31L to 40L).map(i => (i, "b", 10L))
    val df = rows.toDF("id", "s", "n")
    val identity = Curation.temperatureResample(df, "s", "id", "n", 1.0)
    assert(identity.count() === 40)
    assert(identity.select("mix_rate").distinct()
      .collect().map(_.getDouble(0)).toSeq === Seq(1.0))
    val uniform = Curation.temperatureResample(df, "s", "id", "n", 0.0)
    val byStratum = uniform.groupBy("s", "id").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = byStratum.filter(_._1 == "b")
    assert(b.length === 10 && b.forall(_._3 === 2L),
      "alpha=0 must double the quarter-mass stratum toward uniform")
    val aKept = byStratum.filter(_._1 == "a")
    assert(aKept.forall(_._3 === 1L))
    // a keeps a 2/3 hash-coin share
    val expectA = df.filter($"s" === "a")
      .filter(Curation.hashBucket($"id", 1000) < lit(2.0 / 3).cast("double") * 1000)
      .count()
    assert(aKept.length.toLong === expectA)
  }

  test("temperatureResample flattens monotonically: tail share grows as alpha falls") {
    val rows = (1L to 300L).map(i => (i, if (i <= 240) "head" else "tail", 1L))
    val df = rows.toDF("id", "s", "n")
    def tailShare(alpha: Double): Double = {
      val out = Curation.temperatureResample(df, "s", "id", "n", alpha)
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out("tail").toDouble / (out("head") + out("tail"))
    }
    val shares = Seq(1.0, 0.7, 0.3, 0.0).map(tailShare)
    assert(shares.zip(shares.tail).forall { case (lo, hi) => lo <= hi },
      s"tail share must grow as alpha falls: $shares")
    assert(math.abs(shares.last - 0.5) < 0.05, s"alpha=0 ~ uniform: $shares")
  }

  test("assignSplits: stable under growth, near-declared proportions, weights validated") {
    val small = (1L to 200L).map(i => (i, i)).toDF("id", "v")
    val big = (1L to 2000L).map(i => (i, i)).toDF("id", "v")
    val w = Seq("train" -> 0.9, "validation" -> 0.05, "test" -> 0.05)
    def splits(df: org.apache.spark.sql.DataFrame) =
      Curation.assignSplits(df, "id", w)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val sm = splits(small)
    val bg = splits(big)
    // growth stability: every original doc keeps its split when 10x more
    // docs arrive — no test-set leakage across corpus versions
    assert(sm.forall { case (id, s) => bg(id) == s })
    val dist = bg.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(dist("train") / 2000.0 - 0.9) < 0.05)
    assert(dist.keySet === Set("train", "validation", "test"))
    intercept[IllegalArgumentException] {
      Curation.assignSplits(small, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("weightedSample: monotone in weight, biased to heavy rows, errors on w<=0") {
    // 200 light rows (w=1) + 20 heavy rows (w=50): heavy rows must be
    // strongly over-represented in a 40-row sample.
    val rows = (1L to 200L).map(i => (i, 1L)) ++ (201L to 220L).map(i => (i, 50L))
    val df = rows.toDF("id", "w")
    val sampled = Curation.weightedSample(df, "id", "w", 40)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sampled.size === 40)
    assert(sampled.values.forall(k => k > 0.0 && k <= 1.0))
    val nHeavy = sampled.keys.count(_ > 200L)
    assert(nHeavy >= 15,
      s"w=50 rows are ~91% of total weight; got $nHeavy/20 in the sample")
    // same id, larger weight -> larger key (u^(1/w) monotone in w)
    val k1 = Curation.weightedSample(Seq((7L, 2L)).toDF("id", "w"), "id", "w", 1)
      .head.getDouble(2)
    val k2 = Curation.weightedSample(Seq((7L, 20L)).toDF("id", "w"), "id", "w", 1)
      .head.getDouble(2)
    assert(k2 > k1)
    // deterministic: identical rerun
    val again = Curation.weightedSample(df, "id", "w", 40)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === sampled)
    intercept[Exception] {
      Curation.weightedSample(Seq((1L, 0L)).toDF("id", "w"), "id", "w", 1)
        .collect()
    }
  }

  test("dsirLogWeights: target-like docs outscore target-unlike docs") {
    // Target corpus speaks pure "alpha"; raw has alpha docs, beta docs,
    // and one mixed doc — DSIR must order them alpha > mixed > beta.
    val target = Seq((100L, "alpha beta alpha alpha"),
      (101L, "alpha alpha gamma alpha")).toDF("id", "text")
    val raw = Seq(
      (1L, "alpha alpha alpha alpha"),
      (2L, "zzz qqq www zzz"),
      (3L, "alpha alpha zzz qqq")).toDF("id", "text")
    val w = Curation.dsirLogWeights(raw, target, "id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("log_weight_micro")))).toMap
    graft.GraftCache.release(blocking = true)
    // unigrams + bigrams: 4 + 3 per doc
    assert(w.values.forall(_._1 === 7L))
    // Ordering is the contract; absolute sign is not (Laplace smoothing
    // shifts all scores on small corpora — only relative scores matter,
    // which is all Gumbel-top-k consumes).
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2,
      s"expected alpha > mixed > beta ordering, got $w")
    assert(w(1L)._2 - w(2L)._2 > 1000000L,
      "pure-target and pure-off-target docs separate by more than a nat")
  }

  test("dsirLogWeights is deterministic; empty docs drop; reruns identical") {
    val target = Seq((1L, "aa bb cc")).toDF("id", "text")
    val raw = Seq((1L, "aa bb"), (2L, ""), (3L, "dd ee")).toDF("id", "text")
    def run() = {
      val out = Curation.dsirLogWeights(raw, target, "id", "text", 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.GraftCache.release(blocking = true)
      out
    }
    val a = run(); val b = run()
    assert(a === b)
    assert(a.map(_._1) === Set(1L, 3L), "empty doc has no grams, no score")
    // an EMPTY target corpus degrades to the uniform model — scores stay
    // defined (every cell takes the same smoothed zero-count target mass)
    val uniform = Curation.dsirLogWeights(raw,
        target.filter(lit(false)), "id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    graft.GraftCache.release(blocking = true)
    assert(uniform.length === 2 && uniform.forall(_._2 < 0),
      "defined negative scores under the empty-target uniform model")
  }

  test("gramCoverage: full, zero, and partial coverage; short docs drop") {
    val ref = Seq((100L, "aa bb cc dd")).toDF("id", "text")
    val docs = Seq(
      (1L, "aa bb cc"),        // both 2-grams in ref → coverage 1.0
      (2L, "xx yy zz"),        // none → 0.0
      (3L, "aa bb zz"),        // "aa bb" yes, "bb zz" no → 0.5
      (4L, "solo")).toDF("id", "text") // < n tokens → no row
    val out = Curation.gramCoverage(docs, ref, "id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 0L, 0.0)),
      3L -> ((2L, 1L, 0.5))))
    // distinct grams: a repeated n-gram counts once
    val rep = Curation.gramCoverage(
        Seq((7L, "aa bb aa bb aa")).toDF("id", "text"), ref, "id", "text", 2)
      .head
    assert((rep.getLong(1), rep.getLong(2)) === ((2L, 1L)),
      "distinct grams aa-bb (covered) and bb-aa (not), once despite repeats")
  }

  test("dsir model lifecycle: stored model scores a batch without the " +
      "corpus; unseen cells take the reserved default") {
    val target = Seq((100L, "aa bb aa")).toDF("id", "text")
    val raw = Seq((1L, "aa bb cc"), (2L, "cc dd")).toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Curation.writeDsirModel(raw, target, "text", path, buckets = 4096)
    val model = spark.read.parquet(path)
    // one reserved default row, every other cell in [0, buckets)
    val dflt = model.filter($"cell" === -1L).collect()
    assert(dflt.length === 1)
    assert(model.filter($"cell" < -1L || $"cell" >= 4096L).count() === 0)
    val batch = Seq((10L, "aa bb"), (11L, "zz yy")).toDF("id", "text")
    val scored = Curation.dsirScoreAgainstModel(batch, model, "id", "text", 4096)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 11's grams (zz, yy, "zz yy") hash to cells the fitted corpus
    // never touched → score is exactly n_grams × the stored default
    assert(scored(11L) === ((3L, 3L * dflt.head.getLong(1))))
    // doc 10 speaks the target's tongue and must outscore doc 11 per gram
    assert(scored(10L)._2.toDouble / scored(10L)._1 >
      scored(11L)._2.toDouble / scored(11L)._1)
    // rerun against the same stored model is identical
    val again = Curation.dsirScoreAgainstModel(batch, model, "id", "text", 4096)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === scored)
    // a model missing its reserved default row fails loudly instead of
    // silently scoring nothing through the empty cross join
    intercept[IllegalArgumentException] {
      Curation.dsirScoreAgainstModel(batch,
        model.filter($"cell" >= 0L), "id", "text", 4096)
    }
  }

  test("gumbelTopK: deterministic, weight-biased, bounded keys") {
    // 50 low-weight rows and 10 high-weight rows: the +8 log-weight gap
    // (e^8 ≈ 3000x) must dominate the Gumbel noise for every draw.
    val rows = (1L to 50L).map(i => (i, -4.0)) ++ (51L to 60L).map(i => (i, 4.0))
    val df = rows.toDF("id", "lw")
    val top = Curation.gumbelTopK(df, "id", "lw", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(top.size === 10)
    assert(top.keys.forall(_ > 50L),
      s"all 10 slots go to the e^8-heavier rows: $top")
    // keys are log-weight plus bounded noise (|gumbel| < 40 by the u clamp)
    assert(top.values.forall(k => k > -40 && k < 40))
    val again = Curation.gumbelTopK(df, "id", "lw", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === top)
  }

  test("assignSplitsLeakageSafe: clusters share a split, singletons unchanged") {
    val w = Seq("train" -> 0.5, "test" -> 0.5)
    val docs = (1L to 400L).map(i => (i, i)).toDF("id", "v")
    // chains 1-2-3 and 10-11, plus a transitive bridge 20-21, 21-22: the
    // pair (20, 22) is never an edge but must still co-locate
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val out = Curation.assignSplitsLeakageSafe(docs, "id", pairs, "a", "b", w)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // every cluster member keys by the cluster minimum and shares its split
    for (cluster <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), Seq(20L, 21L, 22L))) {
      assert(cluster.map(out(_)).toSet.size === 1,
        s"cluster $cluster must share (rep, split)")
      assert(out(cluster.head)._1 === cluster.min)
    }
    // no near-dup edge (or transitive pair) straddles splits
    assert(out(20L)._2 === out(22L)._2)
    // unclustered docs: identical assignment to the base form
    val clustered = Set(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L)
    val base = Curation.assignSplits(docs, "id", w)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.forall { case (id, (rep, s)) =>
      clustered(id) || (rep == id && s == base(id)) })
    // the operator is not vacuous on this data: at least one cluster
    // member's naive split differs from its leakage-safe one
    assert(clustered.exists(id => out(id)._2 != base(id)),
      "pick cluster ids whose naive splits disagree")
  }

  // -------------------------------------------------------- percentile bins

  test("percentileBins assigns count-of-thresholds-below with exact quartiles") {
    // scores 1..8: quartile thresholds (interpolated) 2.75 / 4.5 / 6.25
    val df = (1L to 8L).map(i => (i, i.toDouble)).toDF("id", "score")
    val out = Curation.percentileBins(df, "score", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))
  }

  test("percentileBins rejects unsorted probes and reserved columns") {
    val df = Seq((1L, 1.0)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      Curation.percentileBins(df, "score", Seq(0.75, 0.25))
    }
    intercept[IllegalArgumentException] {
      Curation.percentileBins(df.withColumn("bin", lit(0)), "score", Seq(0.5))
    }
    // Duplicated probes produce two identical thresholds — the bin index
    // would silently double-increment across that boundary; reject them,
    // along with the degenerate endpoints 0 and 1.
    intercept[IllegalArgumentException] {
      Curation.percentileBins(df, "score", Seq(0.5, 0.5))
    }
    intercept[IllegalArgumentException] {
      Curation.percentileBinsApprox(df, "score", Seq(0.0, 0.5))
    }
    intercept[IllegalArgumentException] {
      Curation.percentileBins(df, "score", Seq(0.5, 1.0))
    }
  }

  test("percentileBinsApprox: threshold rank error within the GK bound") {
    // 20k distinct scores; the GK sketch guarantees rank error <= n/accuracy
    // per threshold — pin it at a coarse accuracy where the bound bites,
    // and at the default accuracy assert near-exact bin agreement.
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val probs = Seq(0.25, 0.5, 0.75)
    val coarse = 100
    val thr = Curation.percentileBinsApprox(df, "score", probs, coarse)
      .groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    // bin b holds rows between thresholds p_b..p_{b+1}: rank error per
    // threshold <= n/coarse, so each bin's size is 0.25n +/- 2*(n/coarse)
    (0L to 3L).foreach { b =>
      val sz = thr.getOrElse(b, 0L).toDouble
      assert(math.abs(sz - n / 4.0) <= 2.0 * n / coarse + 1,
        s"bin $b size $sz breaches the rank-error bound")
    }
    // default accuracy (10000): rank error <= 2 rows of 20k — bins agree
    // with the exact form on all but a handful of boundary rows
    val exact = Curation.percentileBins(df, "score", probs)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Curation.percentileBinsApprox(df, "score", probs)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val differing = exact.count { case (id, b) => approx(id) != b }
    assert(differing <= probs.length * (n / 10000 + 1),
      s"$differing rows changed bin at default accuracy")
  }

  // ------------------------------------------------------------ simhash dedup

  test("simhashNearDups: identical docs pair at hamming 0; pigeonhole recall") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, "entirely different other words here"))
      .toDF("id", "text")
    val pairs = TextOps.simhashNearDups(df, "id", "text", maxDist = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(pairs(0).getInt(2) === 0)
  }

  test("simhashNearDups rejects maxDist >= band count (recall not guaranteed)") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      TextOps.simhashNearDups(df, "id", "text", maxDist = TextOps.SimHashBands)
    }
  }

  test("simhashBands: reassembling the band slices reproduces the signature") {
    val bb = TextOps.SimHashBandBits
    val sigs = Seq(0L, 0xDEADBEEFCAFEL, (1L << TextOps.SimHashBits) - 1).toDF("sig")
      .select($"sig", TextOps.simhashBands($"sig").as("b"))
      .select($"sig", expr(
        s"aggregate(transform(b, s -> shiftleft(s.bits, s.band * $bb)), 0L, (a, x) -> a + x)")
        .as("rebuilt"))
      .collect()
    sigs.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  // --------------------------------------------------------------- sampling

  test("stratifiedSample: rate 0 drops the stratum, rate=buckets keeps it all") {
    val df = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "lang")
    val out = Curation.stratifiedSample(df, "lang", "id",
      Map("a" -> 1000, "b" -> 0), defaultRate = 500, buckets = 1000)
    val langs = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs === Map("a" -> 100L))
  }

  test("stratifiedSample is deterministic and a subset of the input") {
    val df = (1 to 500).map(i => (i.toLong, "x")).toDF("id", "lang")
    val once = Curation.stratifiedSample(df, "lang", "id", Map.empty, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    val twice = Curation.stratifiedSample(df, "lang", "id", Map.empty, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(once === twice)
    assert(once.subsetOf((1 to 500).map(_.toLong).toSet))
    // ~30% expected; the md5 hash should land well inside (15%, 45%)
    assert(once.size > 75 && once.size < 225)
  }

  // -------------------------------------------------------------- quota cap

  test("quotaCap keeps at most k per group and all of smaller groups") {
    val df = ((1 to 30).map(i => (i.toLong, "big")) ++ (31 to 33).map(i => (i.toLong, "small")))
      .toDF("id", "grp")
    val out = Curation.quotaCap(df, "grp", "id", 10)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("big" -> 10L, "small" -> 3L))
  }

  test("quotaCap selection is deterministic across runs") {
    val df = (1 to 50).map(i => (i.toLong, "g")).toDF("id", "grp")
    def ids = Curation.quotaCap(df, "grp", "id", 7).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === ids)
    assert(ids.size === 7)
  }

  test("reserved helper columns are rejected, not silently clobbered") {
    val df = (1 to 5).map(i => (i.toLong, "g", 1L)).toDF("id", "grp", "pos")
    intercept[IllegalArgumentException] {
      Curation.shardedShuffle(df, "id", 2)
    }
    intercept[IllegalArgumentException] {
      Curation.quotaCap(df.withColumnRenamed("pos", "__rk"), "grp", "id", 3)
    }
  }

  // -------------------------------------------------------- decontamination

  test("decontaminate flags exactly the training docs sharing an n-gram") {
    val evalDoc = "alpha beta gamma delta epsilon zeta"
    val contaminated = "prefix alpha beta gamma delta epsilon suffix"   // shares 5-grams
    val clean = "one two three four five six seven"
    val train = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val eval = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "alpha beta gamma delta epsilon" is the single shared 5-gram
    assert(out === Map(1L -> 1L))
  }

  test("decontaminate counts distinct shared grams once per training doc") {
    val evalDoc = "a b c d e f g"                      // grams: abcde, bcdef, cdefg
    val train = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // shares all 3
    val eval = Seq((9L, evalDoc)).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text", n = 5).collect()
    assert(out.length === 1 && out(0).getLong(1) === 3L)
  }

  // ------------------------------------------------------------ quantization

  test("quantizeInt8: codes bounded, out-of-range inputs clamp") {
    val codes = Seq(Seq(0.0f, 1.0f, -1.0f, 2.5f, -7.0f, 0.5f)).toDF("v")
      .select(VectorOps.quantizeInt8($"v").as("q"))
      .collect()(0).getSeq[Int](0)
    assert(codes === Seq(0, 127, -127, 127, -127, 64))
  }

  test("quantError: in-range reconstruction error within the half-step bound") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() * 2 - 1)).map(Tuple1(_))
    val out = vecs.toDF("v")
      .select(VectorOps.quantError($"v").as("e"))
      .select($"e.mse", $"e.max_abs_err").collect()
    val halfStep = 1.0 / (2 * VectorOps.QuantScale)
    out.foreach { r =>
      assert(r.getDouble(1) <= halfStep + 1e-12)
      assert(r.getDouble(0) <= halfStep * halfStep + 1e-12)
    }
  }

  // --------------------------------------------------------- sharded shuffle

  test("shardedShuffle: dense 1..n positions per shard, all rows kept once") {
    val df = (1 to 200).map(_.toLong).toDF("id")
    val out = Curation.shardedShuffle(df, "id", shards = 4)
      .select("id", "shard", "pos").collect()
    assert(out.length === 200)
    assert(out.map(_.getLong(0)).toSet.size === 200)
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps === (1L to rows.length.toLong))
    }
  }

  // --------------------------------------------------------------- packing

  test("packSequences: bins respect the budget except oversized singletons") {
    val rows = (1 to 100).map(i => (i.toLong, (i % 7) * 100L + 50L)) :+ (999L, 5000L)
    val df = rows.toDF("id", "n")
    val bins = Curation.packSequences(df, "id", "n", budget = 2048L, shards = 2)
      .groupBy("shard", "bin")
      .agg(sum("n").as("total"), count(lit(1)).as("cnt"), max("n").as("mx"))
      .collect()
    bins.foreach { r =>
      val (total, cnt, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // a bin is within budget, or it closes an overflow: its last row pushed
      // it past the boundary (first-fit keeps a row in the bin its prefix
      // starts in), so total - one row must be under budget
      assert(total <= 2048L || total - mx < 2048L || cnt === 1L)
    }
    // every row lands in exactly one bin
    assert(bins.map(_.getLong(3)).sum === 101L)
  }

  test("packSequences: bins are contiguous from 0 within each shard") {
    val df = (1 to 60).map(i => (i.toLong, 700L)).toDF("id", "n")
    val out = Curation.packSequences(df, "id", "n", budget = 2048L, shards = 2)
      .select("shard", "bin").collect().map(r => (r.getInt(0), r.getLong(1)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val bins = rows.map(_._2).distinct.sorted
      assert(bins === (0L until bins.length))
    }
  }
}
