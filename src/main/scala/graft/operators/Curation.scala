package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines
  * (engine extension — SURVEY.md §7.5(8)): deterministic sampling, per-group
  * quota caps, benchmark decontamination, hash-sharded training-order
  * shuffle, and shard-local sequence packing.
  *
  * Everything is driven by ONE deterministic 60-bit hash of the row id
  * ([[idHash]]), never an RNG: re-running a sample/shuffle/pack over the
  * same corpus yields byte-identical output (reproducible training sets),
  * any subset of the data can be processed independently (the keep/drop
  * decision for a row needs only that row), and the DuckDB oracle replays
  * the exact selection. `rand()`-based sampling has neither property.
  *
  * Scale notes per operator are inline; the common theme is that nothing
  * here requires a global ordering — every window runs inside a hash
  * partition whose count (`shards`) is a tuning knob, so a 1000-executor
  * cluster processes shards in parallel and no single task sees more than
  * ~n/shards rows.
  */
object Curation {

  /** Rejects input frames that already carry columns this operator will
    * introduce — silent ambiguity otherwise (same guard discipline as
    * `Aggregations.skewSafeGroupSum` / `Joins.asofJoin`). */
  private def requireAbsent(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved column(s): ${clash.mkString(", ")}")
  }

  /** Deterministic 60-bit hash of a row id (md5-derived, same construction
    * as [[TextOps.md5Hash60]] so the oracle computes the identical value).
    * Uniform over [0, 2^60); non-negative. */
  def idHash(id: Column): Column = TextOps.md5Hash60(id.cast("string"))

  /** Hash bucket in [0, buckets) — the sampling coin. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    idHash(id) % buckets
  }

  /** Deterministic stratified sampling: keep a row iff its hash bucket is
    * below the stratum's rate (per-mille by default). A pure per-row filter
    * — ZERO shuffles, pushes past column pruning to the scan — which is the
    * only sampling shape that survives 100 TB: no global count, no sort, no
    * state. Rates are exact in expectation and reproducible run-to-run.
    * Strata absent from `rates` fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Int], defaultRate: Int,
                       buckets: Int = 1000): DataFrame = {
    require(defaultRate >= 0 && rates.values.forall(_ >= 0))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), buckets) < rate)
  }

  /** Deterministic train/validation/test assignment: each row's hash
    * bucket falls into consecutive ranges sized by `splits`' weights
    * (fractions summing to 1), yielding a `split` label column. The
    * hash-range form is the only split that survives 100 TB AND time:
    * zero shuffles (a pure per-row projection), reproducible run-to-run,
    * stable under corpus growth (a document's split never changes when
    * other documents arrive — no leakage of yesterday's test set into
    * today's training set), and uniform WITHIN every stratum
    * automatically, since the hash is independent of any column. Weights
    * multiply into bucket thresholds exactly (0.9/0.05/0.05 × 1000 =
    * 900/950/1000), so an external replay agrees row-for-row. */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)],
                   buckets: Int = 1000): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "weights must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    requireAbsent(df, "split")
    val thresholds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val bucket = hashBucket(col(idCol), buckets)
    val expr = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, t), acc) =>
        when(bucket < t * buckets, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic weighted sample without replacement (Efraimidis &
    * Spirakis 2006): key_i = u_i^(1/w_i) with u_i the id-hash mapped
    * uniformly into (0, 1], sample = the k largest keys — each row's
    * inclusion probability is proportional to its weight, with the same
    * reproducibility contract as every sampler here (hash-driven, no
    * RNG: rerun ⇒ identical sample; any subset computable
    * independently). The standard corpus knob "sample documents
    * proportional to quality score / token count". Keys round to 6
    * decimals before ranking (ties break on id), so an external engine
    * whose libm pow differs by 1 ulp replays the identical selection —
    * the x44 discipline. Non-positive weights are rejected: silently
    * dropping them would make the sample size data-dependent.
    *
    * Scale shape: the key is a row-local expression; top-k by key
    * compiles to TakeOrderedAndProject (per-partition heaps, no global
    * sort). Returns the sampled rows plus `sample_key`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0)
    requireAbsent(df, "sample_key")
    // +1 in LONG before the double cast (not after): at 2^60 magnitude
    // double spacing is 256, so cast-then-add would absorb the 1 — and
    // the oracle's BIGINT-add-then-cast would disagree at the boundary.
    val u = (idHash(col(idCol)) + lit(1L)).cast("double") /
      lit((1L << 60).toDouble)
    val key = round(pow(u, lit(1.0) / col(weightCol).cast("double")), 6)
    df.withColumn("sample_key",
        when(col(weightCol).cast("double") > 0, key)
          .otherwise(raise_error(lit("weightedSample: non-positive weight"))))
      .orderBy(desc("sample_key"), col(idCol))
      .limit(k)
  }

  /** Leakage-safe [[assignSplits]]: assignment keyed by the near-dup
    * CLUSTER representative instead of the document itself, so every
    * member of a connected near-duplicate cluster lands in the SAME
    * split — the train/test contamination a per-document hash split
    * cannot prevent (a test document whose near-duplicate sits in train
    * leaks the answer; at web-corpus duplication rates this is the
    * dominant eval-integrity bug — the reason GPT-3 (Brown et al. 2020
    * §4) and the C4 audit (Dodge et al. 2021) run post-hoc contamination
    * analyses this operator makes structural). `pairs` is any near-dup
    * edge list the pipeline already computes (MinHash, SimHash,
    * SemDeDup); clusters close transitively, singleton documents key by
    * their own id — for them the assignment is IDENTICAL to
    * [[assignSplits]], so adopting this form reassigns only clustered
    * documents. Growth-stable while a cluster's representative (min id)
    * is stable; an arrival merging two clusters re-keys the smaller —
    * the unavoidable price of transitive closure, confined to the merged
    * clusters. Returns the input plus `rep` (the split key) and `split`.
    *
    * Scale shape: connected components run on the EDGE list only
    * (near-dup pairs, ≪ corpus); the label frame (one row per clustered
    * doc, not per doc) joins back by id — broadcast-able when the
    * clustered fraction is small, an ordinary equi-join otherwise; the
    * split itself stays the zero-shuffle hash expression. */
  def assignSplitsLeakageSafe(df: DataFrame, idCol: String, pairs: DataFrame,
                              aCol: String, bCol: String,
                              splits: Seq[(String, Double)]): DataFrame = {
    requireAbsent(df, "rep", "__cid", "__rep")
    val comps = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__cid"), col("component").as("__rep"))
    val keyed = df.join(comps, df(idCol) === col("__cid"), "left")
      .withColumn("rep", coalesce(col("__rep"), df(idCol)))
      .drop("__cid", "__rep")
    assignSplits(keyed, "rep", splits)
  }

  /** Per-group quota cap: keep at most `k` rows per group, selected by hash
    * order (deterministic, unbiased by any value column). The canonical
    * "at most N documents per domain" pass. One keyed shuffle on the group
    * column + an in-partition rank — the same shape as keep-first dedup; at
    * scale a skewed group bounds the task at the group's size, which the cap
    * itself is about to cut to k, so a pre-filter on a cheaper bound (e.g.
    * [[hashBucket]] < p) can shrink monster groups before the shuffle when
    * group sizes are pathological. */
  def quotaCap(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0)
    requireAbsent(df, "__rk")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Skew-safe two-phase [[quotaCap]]: phase 1 ranks within (group, salt)
    * sub-shards and keeps top-k per sub-shard; phase 2 ranks the ≤ k·salts
    * survivors per group exactly. Selects the IDENTICAL rows as
    * [[quotaCap]] (phase 1 can never evict a global top-k row: a row in
    * the group's hash-order top k is also in its own sub-shard's top k) —
    * spec-proven equivalent — while bounding any single task at
    * ~groupSize/salts instead of groupSize. Use when one monster group
    * (a crawl's top domain) would otherwise dominate the cap's wall
    * clock; for ordinary distributions [[quotaCap]]'s single pass wins. */
  def quotaCapSkewSafe(df: DataFrame, groupCol: String, idCol: String,
                       k: Int, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0)
    requireAbsent(df, "__salt", "__rk1", "__rk")
    val h = idHash(col(idCol))
    val w1 = Window.partitionBy(col(groupCol), col("__salt")).orderBy(h, col(idCol))
    val w2 = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("__salt", h % salts)
      .withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= k)
      .withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= k)
      .drop("__salt", "__rk1", "__rk")
  }

  /** [[quotaCap]] on the custom bounded-heap top-k physical operator
    * ([[graft.plans.TopKPerKey]]): selects the IDENTICAL rows (same total
    * hash order, same k), but the plan is partial-heap → one exchange of
    * ≤ k rows per (group × partition) → final heap — no per-group sort,
    * and skew-safety is STRUCTURAL: a monster group streams through a
    * k-bounded heap instead of materializing for a sort, so neither
    * [[quotaCapSkewSafe]]'s salting pass nor its second window is needed.
    * Measured ~2.6× over the window form at sf0.1 (Probe).
    *
    * Cardinality contract (the heap operator does not spill): the caller
    * must know |distinct groups| × k fits task memory — true for the
    * source/language/domain-class quota shapes this targets. When the
    * group cardinality is data-dependent (a raw crawl's registered
    * domain, a user id), use [[quotaCapAuto]] instead. */
  def quotaCapNative(df: DataFrame, groupCol: String, idCol: String,
                     k: Int): DataFrame = {
    require(k > 0)
    graft.plans.TopKPerKey.topKPerKey(df, Seq(groupCol),
      Seq(idHash(col(idCol)).asc, col(idCol).asc), k)
  }

  /** [[quotaCapNative]] with the heap-memory contract enforced: measures
    * the group cardinality (one column-pruned HLL pass) and falls back to
    * the sort-based [[quotaCap]] window shape — which spills — when
    * estimated groups × k per task would overflow the bounded heap.
    * Row-identical to [[quotaCap]]/[[quotaCapNative]] either way (same
    * total hash order, same k). The safe default entry point when the
    * group column's cardinality is not structurally bounded. */
  def quotaCapAuto(df: DataFrame, groupCol: String, idCol: String,
                   k: Int): DataFrame = {
    require(k > 0)
    graft.plans.TopKPerKey.topKPerKeyAuto(df, Seq(groupCol),
      Seq(idHash(col(idCol)).asc, col(idCol).asc), k)
  }

  /** Data-driven domain-mix resampling — the static form of domain
    * reweighting (DoReMi, Xie et al. 2023, arXiv:2305.10429; the "data
    * mixture" knob every LLM pretraining run tunes): measure each
    * stratum's ACTUAL share of total `sizeCol` (tokens), derive a
    * per-stratum keep-rate that moves the mix toward `targetShares`
    * (rate = min(1, target/actual) — over-represented strata downsample
    * proportionally; under-represented ones keep everything, since
    * upsampling would duplicate rows), and apply the rate with the same
    * deterministic [[hashBucket]] coin as [[stratifiedSample]]. Unlike
    * stratifiedSample's LITERAL per-mille rates, the rates here are
    * computed from the data — the join of a measured distribution against
    * a declared target.
    *
    * Returns the kept rows with their stratum's `mix_rate` attached.
    *
    * Scale shape: the measured distribution is one keyed agg collapsing
    * the corpus to |strata| rows plus a 1-row total; the rate frame
    * (|strata| rows) broadcasts back onto the scan, so the apply pass is
    * a broadcast-join + per-row filter — no second full shuffle, and the
    * keep decision for a row needs only that row plus the tiny rate
    * table. Every intermediate is an exactly-representable integer sum in
    * a double, so an external oracle replays rate and keep-set
    * bit-identically. */
  def domainMixResample(df: DataFrame, strataCol: String, idCol: String,
                        sizeCol: String, targetShares: Map[String, Double],
                        defaultShare: Double,
                        buckets: Int = 1000): DataFrame = {
    require(buckets > 0)
    require(defaultShare >= 0 && targetShares.values.forall(_ >= 0))
    requireAbsent(df, "mix_rate", "__ssize", "__total")
    val target = targetShares.foldLeft(lit(defaultShare)) {
      case (acc, (stratum, share)) =>
        when(col(strataCol) === stratum, lit(share)).otherwise(acc)
    }
    val stats = df.groupBy(strataCol)
      .agg(sum(col(sizeCol)).cast("double").as("__ssize"))
    val total = df.agg(sum(col(sizeCol)).cast("double").as("__total"))
    val rates = stats.crossJoin(broadcast(total))
      .select(col(strataCol),
        least(lit(1.0), target / (col("__ssize") / col("__total")))
          .as("mix_rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashBucket(col(idCol), buckets) < col("mix_rate") * buckets)
  }

  /** [[domainMixResample]] with the UPSAMPLING branch — the full DoReMi
    * knob: rates are not capped at 1, so an under-represented stratum is
    * boosted by deterministic row repetition. Every row gets
    * floor(rate) guaranteed copies plus one more when the hash coin
    * falls below frac(rate) — per-stratum expected multiplicity is
    * exactly `rate`, the decision per row is the same replayable md5
    * coin as the downsampling path (no RNG), and rate < 1 degenerates to
    * [[domainMixResample]]'s keep/drop filter (floor = 0). Returns kept
    * rows with (`mix_rate`, `rep`) where `rep` = 0..copies−1 — the
    * repetition index makes the output multiset a proper set, so
    * downstream shuffles/packs treat copies as distinct rows and an
    * external oracle replays the result exactly.
    *
    * Scale shape: identical to the downsampling form — one keyed agg to
    * |strata| rows, a |strata|-row broadcast back onto the scan, then a
    * per-row `explode(sequence(0, copies−1))` whose fan-out is the tiny
    * repeat count; no extra shuffle, and the row-size amplification is
    * exactly the declared mix change, never a data-dependent surprise. */
  def domainMixResampleUp(df: DataFrame, strataCol: String, idCol: String,
                          sizeCol: String, targetShares: Map[String, Double],
                          defaultShare: Double,
                          buckets: Int = 1000): DataFrame = {
    require(buckets > 0)
    require(defaultShare >= 0 && targetShares.values.forall(_ >= 0))
    requireAbsent(df, "mix_rate", "rep", "__ssize", "__total", "__copies")
    val target = targetShares.foldLeft(lit(defaultShare)) {
      case (acc, (stratum, share)) =>
        when(col(strataCol) === stratum, lit(share)).otherwise(acc)
    }
    val stats = df.groupBy(strataCol)
      .agg(sum(col(sizeCol)).cast("double").as("__ssize"))
    val total = df.agg(sum(col(sizeCol)).cast("double").as("__total"))
    // Guard the degenerate stratum whose sizes sum to <= 0 (every row
    // zero-sized): its share is 0, the up-rate divides by it, and the
    // resulting +Infinity would floor to Long.MaxValue copies and blow up
    // the explode. Fail loudly instead, mirroring weightedSample's
    // non-positive-weight guard (round-9 advice).
    val rates = stats.crossJoin(broadcast(total))
      .select(col(strataCol),
        when(col("__ssize") <= 0,
          raise_error(lit("domainMixResampleUp: non-positive stratum size")))
          .otherwise(target / (col("__ssize") / col("__total")))
          .as("mix_rate"))
    applyRatesWithRepetition(df, strataCol, idCol, rates, buckets)
  }

  /** Shared apply pass for uncapped per-stratum rates (`mix_rate` column
    * in the |strata|-row `rates` frame): broadcast-join the rates onto
    * the scan, give every row floor(rate) copies plus a hash-coin extra
    * at frac(rate), and explode a `rep` index — expected multiplicity
    * exactly `rate`, deterministic, no extra shuffle. */
  private def applyRatesWithRepetition(df: DataFrame, strataCol: String,
                                       idCol: String, rates: DataFrame,
                                       buckets: Int): DataFrame =
    df.join(broadcast(rates), Seq(strataCol))
      .withColumn("__copies",
        floor(col("mix_rate")).cast("long") +
          when(hashBucket(col(idCol), buckets) <
            (col("mix_rate") - floor(col("mix_rate"))) * buckets, 1L)
            .otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("rep", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")

  /** Temperature-flattened mix — the multilingual α-sampling knob
    * (exponentiated smoothing, as in multilingual-BERT / XLM-R data
    * sampling: target share_i ∝ (actual share_i)^α): α = 1 keeps the
    * corpus mix, α = 0 moves to uniform, α in between flattens — head
    * strata downsample, tail strata upsample by deterministic row
    * repetition ([[applyRatesWithRepetition]]'s floor + hash-coin form,
    * same `rep`-indexed output as [[domainMixResampleUp]]). Unlike
    * [[domainMixResample]]'s DECLARED targets, the targets here are
    * derived from the measured distribution itself.
    *
    * Scale shape: one keyed agg to |strata| rows; the temperature
    * normalization is an agg over that tiny frame (never the corpus);
    * the |strata|-row rate table broadcasts back onto the scan. Weights
    * and rates round to 6 decimals so an external engine replaying the
    * same arithmetic (pow is correctly rounded only to 1 ulp across
    * libms) agrees exactly — the suite's standard cross-engine float
    * discipline. */
  def temperatureResample(df: DataFrame, strataCol: String, idCol: String,
                          sizeCol: String, alpha: Double,
                          buckets: Int = 1000): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(buckets > 0)
    requireAbsent(df, "mix_rate", "rep", "__ssize", "__total", "__w", "__wsum", "__copies")
    val stats = df.groupBy(strataCol)
      .agg(sum(col(sizeCol)).cast("double").as("__ssize"))
    val total = df.agg(sum(col(sizeCol)).cast("double").as("__total"))
    // Same degenerate-stratum guard as domainMixResampleUp: a zero-size
    // stratum's share is 0, its temperature rate divides by that share
    // (NaN), and the NaN coin would silently drop the stratum — fail
    // loudly instead (round-9 advice).
    val weighted = stats.crossJoin(broadcast(total))
      .select(col(strataCol),
        when(col("__ssize") <= 0,
          raise_error(lit("temperatureResample: non-positive stratum size")))
          .otherwise(col("__ssize") / col("__total")).as("__share"))
      .withColumn("__w", round(pow(col("__share"), alpha), 6))
    val wsum = weighted.agg(sum(col("__w")).as("__wsum"))
    val rates = weighted.crossJoin(broadcast(wsum))
      .select(col(strataCol),
        round(col("__w") / col("__wsum") / col("__share"), 6).as("mix_rate"))
    applyRatesWithRepetition(df, strataCol, idCol, rates, buckets)
  }

  /** DSIR importance weights — Data Selection via Importance Resampling
    * (Xie et al., NeurIPS 2023): score every raw document by how
    * target-like its hashed n-gram distribution is. Both corpora reduce
    * to bag-of-hashed-n-gram models (unigrams + bigrams hashed into
    * `buckets` cells — the paper's feature space); each cell gets a
    * smoothed probability under the target and the raw model, and a
    * document's log importance weight is Σ count_b · ln(p_target(b) /
    * p_raw(b)) over its cells. Unlike the strata knobs
    * ([[domainMixResample]] / [[temperatureResample]]), which need a
    * LABELED stratum column and move whole groups, DSIR shifts the
    * corpus toward an EXAMPLE corpus — "more like Wikipedia" without
    * anyone labeling what Wikipedia-like means. Returns (idCol, n_grams,
    * log_weight_micro) for every raw document with at least one token;
    * resample with [[gumbelTopK]] (the paper's selection rule) after
    * dividing by 1e6 (the score is integer MICRO-nats).
    *
    * Determinism/oracle: the per-cell log-ratio is held as an INTEGER of
    * micro-nats (round(ln·1e6) as long) and the per-document score stays
    * in that integer space — Σ count·lr is an exact long sum,
    * order-independent, and is returned UNROUNDED. A double sum here is
    * engine-order-dependent, and even an exact sum rounded to a fixed
    * decimal lands on an exact decimal half every ~100 docs, where
    * Spark (shortest-decimal HALF_UP) and binary-value rounders
    * (DuckDB) deterministically disagree — both failure modes observed
    * at sf0.001 before this formulation. The only float step left is
    * the ln itself (1-ulp libm variance absorbed by the micro-nat
    * rounding), so an external engine replays the scores exactly.
    *
    * Scale shape: grams hash to cells IN the projection (strings never
    * cross a shuffle); the raw corpus collapses once to the skinny
    * (id, cell, count) frame — persisted, it feeds both the model agg
    * and the scoring pass, so the corpus is tokenized exactly once; each
    * model is a ≤`buckets`-row aggregate; the log-ratio table
    * (≤`buckets` rows) BROADCASTS back onto the skinny frame — scoring
    * is a broadcast join + one keyed agg, no corpus-sized join side.
    * The target corpus is an eval/reference set (MBs next to a 100 TB
    * raw crawl by construction) and costs one extra tokenization pass
    * over itself only. Callers release the persisted frame via
    * [[graft.GraftCache]] after consuming. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0)
    requireAbsent(raw, "n_grams", "log_weight_micro", "__b", "__c", "__lr")
    val rawCells = graft.GraftCache.persist(
      dsirCellCounts(raw, idCol, textCol, buckets))
    val rawModel = rawCells.groupBy("__b").agg(sum("__c").as("__rc"))
    val tgtModel = dsirModelCounts(target, textCol, buckets)
    val ratio = dsirRatio(rawModel, tgtModel, buckets)
    rawCells.join(broadcast(ratio.filter(col("__b") >= 0)), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_grams"),
        sum(col("__c") * col("__lr")).as("log_weight_micro"))
  }

  /** Per-document hashed n-gram cell counts — the DSIR feature frame:
    * unigrams + bigrams hashed to `buckets` cells in the projection
    * (strings never cross the shuffle), one keyed agg to the skinny
    * (id, cell, count) rows. */
  private def dsirCellCounts(df: DataFrame, idCol: String, textCol: String,
                             buckets: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(
        concat(col("__tk"), TextOps.ngrams(col("__tk"), 2))).as("__g"))
      .select(col(idCol), (TextOps.md5Hash60(col("__g")) % buckets).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))

  /** Corpus-level cell counts when per-document rows aren't needed (model
    * fitting): one map-side-combinable agg straight to ≤`buckets` rows —
    * no per-document intermediate shuffle. */
  private def dsirModelCounts(df: DataFrame, textCol: String,
                              buckets: Int): DataFrame =
    df.select(TextOps.tokens(col(textCol)).as("__tk"))
      .select(explode(concat(col("__tk"), TextOps.ngrams(col("__tk"), 2))).as("__g"))
      .select((TextOps.md5Hash60(col("__g")) % buckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__tc"))

  /** Laplace-smoothed (+0.5 per cell) micro-nat log-ratio per cell the
    * raw corpus touches, PLUS the reserved cell −1 row carrying the
    * unseen-cell default: a cell with zero raw and zero target count
    * smooths to lr = ln((rt + 0.5·B)/(tt + 0.5·B)) — a constant, stored
    * once so a persisted model can score batches whose grams the fitted
    * corpus never saw. */
  private def dsirRatio(rawModel: DataFrame, tgtModel: DataFrame,
                        buckets: Int): DataFrame = {
    // coalesce: an EMPTY corpus sums to null — with 0 the smoothing
    // still defines every ratio (uniform model), instead of nulling
    // every score downstream.
    val rawTotal = rawModel
      .agg(coalesce(sum("__rc"), lit(0L)).cast("double").as("__rt"))
    val tgtTotal = tgtModel
      .agg(coalesce(sum("__tc"), lit(0L)).cast("double").as("__tt"))
    val cells = rawModel.join(tgtModel, Seq("__b"), "left")
      .crossJoin(broadcast(rawTotal)).crossJoin(broadcast(tgtTotal))
      .select(col("__b"), round(log(
        ((coalesce(col("__tc"), lit(0L)).cast("double") + lit(0.5)) /
          (col("__tt") + lit(0.5 * buckets))) /
        ((col("__rc").cast("double") + lit(0.5)) /
          (col("__rt") + lit(0.5 * buckets)))) * lit(1e6))
        .cast("long").as("__lr"))
    val unseen = rawTotal.crossJoin(broadcast(tgtTotal))
      .select(lit(-1L).as("__b"), round(log(
        (col("__rt") + lit(0.5 * buckets)) /
          (col("__tt") + lit(0.5 * buckets))) * lit(1e6))
        .cast("long").as("__lr"))
    cells.unionByName(unseen)
  }

  /** Fit and PERSIST the DSIR model — the production lifecycle's write
    * half: the (cell, lr) micro-nat table (≤ buckets+1 rows, KBs at any
    * corpus size) lands as one parquet file, so scoring a nightly batch
    * ([[dsirScoreAgainstModel]]) never touches the fitted corpus again —
    * the same store-the-derived-structure shape as the MinHash band
    * index ([[TextOps.writeBandIndex]]). Fitting costs one tokenization
    * pass over each corpus collapsing straight to ≤`buckets`-row models
    * (map-side combine; no per-document intermediate). */
  def writeDsirModel(raw: DataFrame, target: DataFrame, textCol: String,
                     path: String, buckets: Int = 4096): Unit =
    dsirRatio(
        dsirModelCounts(raw, textCol, buckets)
          .withColumnRenamed("__tc", "__rc"),
        dsirModelCounts(target, textCol, buckets), buckets)
      .select(col("__b").as("cell"), col("__lr").as("lr"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Score an arriving batch against a STORED model — the steady state
    * of the DSIR lifecycle: candidate scoring reads ONLY the persisted
    * (cell, lr) table; the corpus the model was fitted on is never
    * re-read or re-tokenized. Cells the fitted corpus never saw take
    * the model's reserved cell −1 default (exactly the smoothed ratio
    * an unseen cell would have received at fit time, so scoring against
    * the stored model and refitting-with-the-batch-absent agree).
    * Returns (idCol, n_grams, log_weight_micro) per batch document.
    *
    * Scale shape: the batch's cell counts are one keyed agg; the model
    * (≤ buckets+1 rows) BROADCASTS onto them; one keyed agg back to
    * per-document scores. Nothing scales with the fitted corpus. */
  def dsirScoreAgainstModel(batch: DataFrame, model: DataFrame,
                            idCol: String, textCol: String,
                            buckets: Int = 4096): DataFrame = {
    require(buckets > 0)
    requireAbsent(batch, "n_grams", "log_weight_micro", "__b", "__c", "__lr", "__dlr")
    val m = model.select(col("cell").as("__b"), col("lr").as("__lr"))
    val dflt = m.filter(col("__b") === -1L).limit(2).collect()
    // A model without its reserved default row would silently produce an
    // EMPTY result through the 1-row cross join below — fail loudly
    // instead (the check is one job over a KB-sized table).
    require(dflt.length == 1,
      s"model must carry exactly one reserved cell=-1 default row " +
        s"(found ${dflt.length}) — was it written by writeDsirModel?")
    val unseenDefault = broadcast(
      m.filter(col("__b") === -1L).select(col("__lr").as("__dlr")))
    dsirCellCounts(batch, idCol, textCol, buckets)
      .join(broadcast(m.filter(col("__b") >= 0L)), Seq("__b"), "left")
      .crossJoin(unseenDefault)
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_grams"),
        sum(col("__c") * coalesce(col("__lr"), col("__dlr")))
          .as("log_weight_micro"))
  }

  /** Gumbel top-k resampling (the DSIR paper's selection rule, and the
    * standard log-space form of weighted sampling without replacement):
    * keep the k rows maximizing log_weight + Gumbel noise, where the
    * noise is derived from the row id's deterministic hash coin —
    * g = −ln(−ln(u)), u uniform in (0,1) — so selection probability
    * follows the importance weights yet the draw replays exactly.
    * [[weightedSample]]'s u^(1/w) key is the same distribution in
    * weight space; this form works from LOG weights directly, which is
    * what DSIR produces (exp(log_weight) under/overflows a double for
    * strongly target-(un)like documents long before the key loses
    * precision here). Output: input plus `gumbel_key`, top-k rows.
    *
    * Scale shape: per-row expression + global top-k — compiles to
    * TakeOrderedAndProject (per-partition bounded heaps, never a total
    * sort), the same shape as [[weightedSample]]. */
  def gumbelTopK(df: DataFrame, idCol: String, logWeightCol: String,
                 k: Int): DataFrame = {
    require(k > 0)
    requireAbsent(df, "gumbel_key")
    // +1 in LONG before the double cast (weightedSample's boundary note);
    // denominator 2^60+4096 is double-exact (spacing at 2^60 is 256) and
    // keeps u strictly inside (0,1) — u=1 would send −ln(−ln(u)) to +∞.
    val u = (idHash(col(idCol)) + lit(1L)).cast("double") /
      lit(((1L << 60) + 4096L).toDouble)
    df.withColumn("gumbel_key",
        round(col(logWeightCol) - log(-log(u)), 6))
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(k)
  }

  /** Corpus drift between two snapshots — the across-time companion to a
    * point-in-time health report: per stratum, document counts and
    * size-share in the OLD and NEW snapshots plus the share delta, so a
    * nightly ingest that silently tilts the language/domain mix (a crawler
    * change, an upstream source dying) surfaces as a signed number
    * instead of a surprise at training time. Two keyed aggs collapse each
    * snapshot to |strata| rows; the tiny share frames full-outer-join on
    * the stratum (a stratum present in only one snapshot reports zeros on
    * the other side). Shares round to 6 decimals and the delta is a
    * difference of the rounded values, so an external replay agrees
    * exactly. */
  def corpusDrift(oldDf: DataFrame, newDf: DataFrame, strataCol: String,
                  sizeCol: String): DataFrame = {
    def shares(df: DataFrame, suffix: String) = {
      val stats = df.groupBy(strataCol).agg(
        count(lit(1)).as(s"n_docs_$suffix"),
        sum(col(sizeCol)).cast("double").as(s"__sz_$suffix"))
      stats.crossJoin(broadcast(
          df.agg(sum(col(sizeCol)).cast("double").as(s"__tot_$suffix"))))
        .select(col(strataCol), col(s"n_docs_$suffix"),
          round(col(s"__sz_$suffix") / col(s"__tot_$suffix"), 6)
            .as(s"share_$suffix"))
    }
    shares(oldDf, "old").join(shares(newDf, "new"), Seq(strataCol), "full_outer")
      .select(col(strataCol),
        coalesce(col("n_docs_old"), lit(0L)).as("n_docs_old"),
        coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"),
        coalesce(col("share_old"), lit(0.0)).as("share_old"),
        coalesce(col("share_new"), lit(0.0)).as("share_new"),
        round(coalesce(col("share_new"), lit(0.0)) -
          coalesce(col("share_old"), lit(0.0)), 6).as("share_delta"))
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minShared` distinct word `n`-grams with any document of the eval set.
    * Candidate generation is an equi-join on the 60-bit gram hash — the
    * partitionable-join-key shape of the dedup suite, never all-pairs; the
    * eval side is DISTINCT gram hashes only, so ids and text never cross
    * the wire. Returns (idCol, n_shared_grams) for flagged training docs.
    *
    * `broadcastEval` (default true) hard-hints the eval side as a
    * broadcast. That is the right plan for the intended use — benchmark
    * suites are MBs next to a training corpus — but a broadcast must fit
    * the driver and executors (Spark hard-caps broadcasts at 8 GB and
    * OOMs well before): if the eval side's distinct gram hashes can be
    * large, pass false and the planner/AQE picks a shuffled join from
    * actual runtime sizes. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int, minShared: Long = 1L,
                    broadcastEval: Boolean = true): DataFrame = {
    // Tokens are MATERIALIZED into an attribute before ngrams: the n-gram
    // lambda references its array n+2 times, and interpreted higher-order
    // functions have no common-subexpression elimination, so an inline
    // tokens(...) expression would re-run the regex split once per
    // element_at — measured 50× slower on this exact path. CollapseProject
    // keeps the boundary (it never inlines a non-cheap expression that is
    // referenced more than once).
    def grams(df: DataFrame) = df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(TextOps.ngrams(col("__tk"), n)).as("__g"))
      .select(col(idCol), TextOps.md5Hash60(col("__g")).as("gh"))
    // Eval side needs only distinct gram hashes — a per-(id, gh) distinct
    // first would be a second full aggregation thrown away immediately.
    // The train side keeps per-doc distinct grams: each shared gram counts
    // once per training document.
    val evalDistinct = grams(eval).select("gh").distinct()
    val evalGrams = if (broadcastEval) broadcast(evalDistinct) else evalDistinct
    grams(train).distinct()
      .join(evalGrams, "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Per-document n-gram coverage against a reference corpus — the
    * novelty / memorization-risk score: what fraction of a document's
    * DISTINCT word n-grams already occur anywhere in the reference
    * (coverage 1.0 = nothing new; ≈0 = fully novel text). The
    * continuous companion to [[decontaminate]]'s binary flag — used to
    * audit eval-set novelty, score synthetic data against its source
    * corpus, and estimate memorization exposure. Returns (idCol,
    * n_grams, n_covered, coverage) per document with ≥ 1 n-gram;
    * coverage is a single integer division rounded once (no float-sum
    * order anywhere).
    *
    * Scale shape: both sides hash grams to 60 bits in the projection
    * and aggregate to DISTINCT hashes before the join — the reference
    * collapses to one hash set (map-side partial distinct), the join is
    * a partitionable equi-join on the hash (NOT broadcast by default: a
    * 100 TB reference's distinct grams are themselves huge), and the
    * per-document fraction is one keyed agg. Nothing is all-pairs. */
  def gramCoverage(docs: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    require(n > 0)
    requireAbsent(docs, "n_grams", "n_covered", "coverage", "__gh", "__hit")
    def grams(df: DataFrame, cols: Seq[Column]) = df
      .select(cols :+ TextOps.tokens(col(textCol)).as("__tk"): _*)
      .select(cols :+ explode(TextOps.ngrams(col("__tk"), n)).as("__g"): _*)
      .select(cols :+ TextOps.md5Hash60(col("__g")).as("__gh"): _*)
    val docGrams = grams(docs, Seq(col(idCol))).distinct()
    val refGrams = grams(reference, Nil).distinct()
    docGrams.join(refGrams.withColumn("__hit", lit(1L)), Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_covered"))
      .withColumn("coverage", round(col("n_covered") / col("n_grams"), 4))
  }

  /** Percentile-threshold binning — the curriculum-bucket operator (rank
    * documents by a quality/perplexity score, train in quantile order):
    * thresholds are ONE exact-percentile aggregate over the score column
    * (a 1-row frame; swap in `approx_percentile` at 100 TB, where exact
    * percentile's per-value map grows with score cardinality), broadcast
    * back onto the scan, bin = count of thresholds strictly below the
    * score. Never an ntile window — ntile is a TOTAL SORT of the corpus;
    * this is two scans and a broadcast. Thresholds are rounded to 6
    * decimals so an external engine replaying the same interpolation
    * agrees at the bin boundaries. Returns the input plus `bin`
    * (0..probs.length). */
  def percentileBins(df: DataFrame, scoreCol: String,
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty &&
      probs.zip(probs.tail).forall(p => p._1 < p._2) &&
      probs.forall(p => p > 0.0 && p < 1.0),
      "probs must be strictly ascending, each in (0, 1)")
    requireAbsent(df, "bin", "__thr")
    val thr = df.agg(
      percentile(col(scoreCol), array(probs.map(lit): _*)).as("__thr"))
    val bin = probs.indices.map { i =>
      when(col(scoreCol) > round(element_at(col("__thr"), i + 1), 6), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    df.crossJoin(broadcast(thr)).withColumn("bin", bin).drop("__thr")
  }

  /** The 100 TB form of [[percentileBins]]: thresholds from
    * `approx_percentile` (Greenwald–Khanna sketch) instead of exact
    * `percentile`. Exact percentile's aggregation state holds every
    * distinct score value per partition — at corpus scale with a
    * high-cardinality double score that state IS the column; the GK
    * sketch is bounded by `accuracy` regardless of input size, with a
    * guaranteed rank error ≤ n/accuracy per threshold (spec-pinned
    * against the exact form). Bin SEMANTICS are unchanged — same
    * broadcast-threshold shape, never an ntile total-sort — only the
    * threshold values carry the sketch's rank tolerance, which is the
    * right trade for curriculum bucketing (a boundary document landing
    * one bin over is noise; a total sort of 100 TB is not). */
  def percentileBinsApprox(df: DataFrame, scoreCol: String,
                           probs: Seq[Double],
                           accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty &&
      probs.zip(probs.tail).forall(p => p._1 < p._2) &&
      probs.forall(p => p > 0.0 && p < 1.0),
      "probs must be strictly ascending, each in (0, 1)")
    require(accuracy > 0)
    requireAbsent(df, "bin", "__thr")
    val thr = df.agg(approx_percentile(col(scoreCol),
      array(probs.map(lit): _*), lit(accuracy)).as("__thr"))
    val bin = probs.indices.map { i =>
      when(col(scoreCol) > round(element_at(col("__thr"), i + 1), 6), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    df.crossJoin(broadcast(thr)).withColumn("bin", bin).drop("__thr")
  }

  /** Hash-sharded training-order shuffle: shard = idHash mod `shards`,
    * position = rank of idHash within the shard. This is how training data
    * is shuffled at 100 TB — a global `ORDER BY random()` needs a total
    * sort (and an RNG seed nobody can replay); hash-sharding gives each
    * reader shard-parallel, reproducible, well-mixed order with one keyed
    * shuffle and shard-local sorts of ~n/shards rows. */
  def shardedShuffle(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0)
    requireAbsent(df, "__h", "shard", "pos")
    val h = idHash(col(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % shards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Shard-local sequence packing: assign size-bearing rows (e.g. token
    * counts) to contiguous bins in shard hash order —
    * bin = exclusive-prefix-sum(sizes) DIV budget. The deterministic
    * first-fit-in-hash-order packer for building fixed-token training
    * batches. Packing is shard-local by design: a globally optimal packing
    * needs a global sort, but bins only have to be *full enough*, so at
    * scale each of `shards` partitions packs independently (parallel,
    * reproducible).
    *
    * Bin-capacity contract (what prefix-sum DIV budget actually gives):
    * a bin holds every row whose START offset falls inside it, so the row
    * that straddles a bin boundary OVERFILLS its bin — each bin's total is
    * bounded by `budget + closingRowSize − 1`, equivalently
    * `total − max(rowSize) < budget` (the property the spec pins), not by
    * `budget` itself. An oversized row (> budget) is never dropped, but it
    * does NOT always get a bin of its own: if its start offset lands
    * mid-bin it shares that bin with the preceding rows (sizes [100, 5000]
    * at budget 2048 both land in bin 0). Downstream fixed-capacity batch
    * builders must therefore handle the closing row (truncate or split);
    * rows already bounded by the model's sequence length make overflow
    * ≤ seqLen−1 tokens. Returns the input plus (shard, bin). */
  def packSequences(df: DataFrame, idCol: String, sizeCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    requireAbsent(df, "__h", "__cum", "shard", "bin")
    val h = idHash(col(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % shards).cast("int"))
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(sizeCol)) / budget).cast("long"))
      .drop("__h", "__cum")
  }
}
