package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftCache
import graft.operators.{Curation, Quality, TextOps, VectorOps}
import graft.sources.Tables

/** Oracle-checked queries for the corpus-curation suite (engine extension —
  * SURVEY.md §7.5(8)): SimHash dedup, deterministic sampling, quota caps,
  * benchmark decontamination, int8 quantization, sharded training shuffle,
  * and sequence packing.
  *
  * As with [[TextQueries]], the DuckDB oracle SQL is GENERATED from the
  * same Scala constants that drive the Spark expressions ([[TextOps]] hash
  * construction, band layout, [[Curation]] rates/shard counts), so both
  * engines compute identical selections by construction.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Max Hamming distance for SimHash near-dups — must stay below
    * [[TextOps.SimHashBands]] for the band-blocking recall guarantee. */
  val HammingMaxDist = 3

  /** Per-mille sampling rates by language; zh (present in the data) is
    * deliberately absent so the default-rate fallback is exercised. */
  val SampleRates: Map[String, Int] = Map("en" -> 200, "de" -> 400, "es" -> 600, "fr" -> 800)
  val DefaultRate = 500
  val SampleBuckets = 1000

  /** Target token shares for domain-mix resampling: en is over-represented
    * in the corpus (~45% of tokens) and zh is deliberately capped low, so
    * both the downsample branch and the rate-1.0 (under-represented)
    * branch are exercised; the remaining langs fall to the default. */
  val MixTargetShares: Map[String, Double] = Map("en" -> 0.3, "zh" -> 0.1)
  val MixDefaultShare = 0.2

  /** Target shares for the UPSAMPLING form (x42): de (~14% of tokens)
    * targets 40% → rate ≈ 3 (floor-copies + coin), en (~41%) targets 20%
    * → downsample ≈ 0.5, the default 0.15 leaves the rest straddling
    * rate 1 — all three branches of the full DoReMi knob in one run. */
  val UpTargetShares: Map[String, Double] = Map("de" -> 0.40, "en" -> 0.20)
  val UpDefaultShare = 0.15

  /** Temperature for α-sampling (x44): 0.5 flattens the mix — en (~41%
    * of tokens) downsamples, the ~14% languages upsample past rate 1. */
  val MixAlpha = 0.5

  /** Train/validation/test weights for x50 (exact bucket thresholds:
    * 900 / 950 / 1000 of 1000). */
  val SplitWeights: Seq[(String, Double)] =
    Seq("train" -> 0.9, "validation" -> 0.05, "test" -> 0.05)

  /** Quartile probes for perplexity-curriculum binning (x40). */
  val BinQuartiles: Seq[Double] = Seq(0.25, 0.5, 0.75)

  /** Sample size for the weighted (token-proportional) sample (x56). */
  val WeightedSampleK = 50

  /** DSIR (x57): hashed n-gram feature cells, target language defining
    * the example corpus, and the resample size. 4096 cells is deliberate
    * aliasing at this vocabulary — hash collisions are part of the
    * method (the paper uses 10k cells against web-scale vocab). */
  val DsirBuckets = 4096
  val DsirTargetLang = "en"
  val DsirK = 100

  val DomainQuota = 15
  val DecontamGramSize = 5

  /** x61 coverage gram size: 3-grams put the synthetic corpus's coverage
    * spectrum in the interesting range (median ≈ 0.58, 10th–90th pct
    * 0.51–0.97) — 2-grams saturate at 1.0, 5-grams mostly at 0. */
  val CoverageGramSize = 3
  val EvalModulus = 10
  val ShuffleShards = 8
  val PackBudget = 2048L
  val PackShards = 4

  def queries: Map[String, Q] = Map(
    // ----------------------------------------------------------------- x18
    // SimHash near-duplicate pairs: 15-bit band blocking over 60-bit
    // shingle signatures, exact bit_count(xor) Hamming verification —
    // completes x5 (signatures) into a dedup operator. Recall is exact for
    // distance ≤ 3 by pigeonhole over the 4 bands.
    "x18_simhash_neardups" -> ((s, dir) => {
      val t = Tables(s, dir)
      TextOps.simhashNearDups(t.documents, "doc_id", "text", HammingMaxDist)
        .orderBy("id_a", "id_b")
    }),

    // ----------------------------------------------------------------- x19
    // Deterministic stratified sampling: per-language hash-bucket rates
    // (zero-shuffle keep/drop filter), aggregated to per-language
    // before/after counts.
    "x19_stratified_sample" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      val kept = Curation.stratifiedSample(docs, "lang", "doc_id",
          SampleRates, DefaultRate, SampleBuckets)
        .groupBy("lang").agg(count(lit(1)).as("kept"))
      // Null-SAFE join key: a NULL-lang stratum groups on both sides but
      // `=` never matches NULL — <=> keeps Spark and the oracle's
      // single-pass `count(*) FILTER` in agreement for that group.
      val totals = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      totals.join(kept, totals("lang") <=> kept("lang"), "left")
        .select(totals("lang"), col("n_docs"),
          coalesce(col("kept"), lit(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // ----------------------------------------------------------------- x37
    // Data-driven domain-mix resampling (static DoReMi-style reweighting):
    // per-language keep-rates computed from the measured token distribution
    // against declared target shares, applied with the deterministic hash
    // coin. Reported as the per-language funnel (in vs kept, with the
    // operator-computed rate) so the oracle verifies the measured shares,
    // the derived rates, AND the exact keep set.
    "x37_domain_mix" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val kept = Curation.domainMixResample(docs, "lang", "doc_id",
          "n_tokens", MixTargetShares, MixDefaultShare, SampleBuckets)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum("n_tokens").as("tokens_kept"),
          round(max("mix_rate"), 6).as("mix_rate"))
      val totals = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs_in"), sum("n_tokens").as("tokens_in"))
      totals.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_docs_in"), col("tokens_in"),
          coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
          coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
          col("mix_rate"))
        .orderBy("lang")
    }),

    // ----------------------------------------------------------------- x57
    // DSIR importance resampling (Xie et al. 2023): raw documents scored
    // by hashed-n-gram likelihood ratio against the English subset as the
    // example corpus, then Gumbel-top-k selected. Complements the strata
    // knobs (x37/x42/x44): no stratum labels, the target is defined by
    // EXAMPLE. The oracle replays the feature hashing, both smoothed
    // models, per-doc log weights, and the exact deterministic draw.
    "x57_dsir_select" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      val scored = Curation.dsirLogWeights(docs,
        docs.filter(col("lang") === DsirTargetLang), "doc_id", "text",
        DsirBuckets)
      Curation.gumbelTopK(
          scored.join(docs.select("doc_id", "lang"), Seq("doc_id"))
            .withColumn("__lw", col("log_weight_micro") / lit(1e6)),
          "doc_id", "__lw", DsirK)
        .select(col("doc_id"), col("lang"), col("n_grams"),
          col("log_weight_micro"), col("gumbel_key"))
        .orderBy(desc("gumbel_key"), col("doc_id"))
    }),

    // ----------------------------------------------------------------- x59
    // DSIR lifecycle steady state: the model (cell → micro-nat log-ratio)
    // is fitted on the standing corpus and PERSISTED; the arriving batch
    // (doc_id % 10 = 0) is scored against the STORED table only — the
    // corpus is never re-read at scoring time (plan-audited). Unseen
    // cells take the model's reserved cell −1 default. The oracle refits
    // the model from the same split and replays the scoring arithmetic
    // (storage is a plan property; the data contract is the scores).
    "x59_dsir_screen" -> ((s, dir) => {
      val t = Tables(s, dir)
      val batch = t.documents.filter(col("doc_id") % EvalModulus === 0)
      val corpus = t.documents.filter(col("doc_id") % EvalModulus =!= 0)
      val mp = SinkQueries.sinkDir("x59_dsir_model")
      Curation.writeDsirModel(corpus,
        corpus.filter(col("lang") === DsirTargetLang), "text", mp, DsirBuckets)
      Curation.dsirScoreAgainstModel(batch, s.read.parquet(mp),
          "doc_id", "text", DsirBuckets)
        .join(t.documents.select("doc_id", "lang"), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_grams"),
          col("log_weight_micro"))
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x42
    // Full DoReMi knob: the UPSAMPLING branch — under-represented strata
    // are boosted by deterministic row repetition (floor(rate) guaranteed
    // copies + a hash-coin extra), over-represented ones downsample as in
    // x37. The funnel reports repeated ROWS vs distinct docs per language
    // plus the per-language max repetition index, so the oracle pins the
    // uncapped rates, the keep set, AND the exact explode multiplicities.
    "x42_domain_mix_up" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val up = Curation.domainMixResampleUp(docs, "lang", "doc_id",
        "n_tokens", UpTargetShares, UpDefaultShare, SampleBuckets)
      val kept = up.groupBy("lang")
        .agg(count(lit(1)).as("n_rows_out"),
          countDistinct("doc_id").as("n_docs_kept"),
          sum("n_tokens").as("tokens_out"),
          max("rep").as("max_rep"),
          round(max("mix_rate"), 6).as("mix_rate"))
      val totals = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs_in"), sum("n_tokens").as("tokens_in"))
      totals.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_docs_in"), col("tokens_in"),
          coalesce(col("n_rows_out"), lit(0L)).as("n_rows_out"),
          coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
          coalesce(col("tokens_out"), lit(0L)).as("tokens_out"),
          col("max_rep"), col("mix_rate"))
        .orderBy("lang")
    }),

    // ----------------------------------------------------------------- x51
    // Corpus drift between snapshots: the pre-ingest corpus (doc_id % 10
    // <> 0) vs the full post-ingest table — per-language doc counts,
    // token shares, and the share delta a nightly run alerts on. The
    // oracle replays both snapshot aggregations and the rounded delta.
    "x51_corpus_drift" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.corpusDrift(
          docs.filter(col("doc_id") % 10 =!= 0), docs, "lang", "n_tokens")
        .orderBy("lang")
    }),

    // ----------------------------------------------------------------- x50
    // Deterministic train/validation/test split: hash-range assignment —
    // zero shuffles, reproducible, stable under corpus growth (a doc's
    // split never changes when other docs arrive), uniform within every
    // language automatically. Reported per (split, lang) so the oracle
    // verifies the exact assignment, not just global proportions.
    "x50_train_split" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.assignSplits(docs, "doc_id", SplitWeights)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("split", "lang")
    }),

    // ----------------------------------------------------------------- x52
    // Leakage-safe splits: x50's hash split keyed by the near-dup CLUSTER
    // representative, so a test document can never be a near-duplicate of
    // a train document (the transitive closure of the MinHash pair list —
    // x28's clusters — shares one split). Reported per document with the
    // representative, so the oracle verifies the exact key and assignment:
    // the recursive-CTE clustering AND the hash-bucket arithmetic replay.
    // ----------------------------------------------------------------- x68
    // Leakage AUDIT: the guarantee x52 claims, measured — near-dup pairs
    // whose endpoints land in different splits, under the naive per-doc
    // hash split vs the cluster-keyed leakage-safe split. The naive mode
    // straddles pairs (each one a test answer leaked into train); the
    // safe mode must report exactly zero. Post-hoc contamination
    // analysis (GPT-3 §4, C4 audit) as a standing oracle-checked
    // artifact instead of a one-off notebook.
    "x68_leakage_audit" -> ((s, dir) => {
      val t = Tables(s, dir)
      val pairs = GraftCache.persist(
        TextOps.minhashNearDups(t.documents, "doc_id", "text",
            TextQueries.NearDupThreshold)
          .select("id_a", "id_b"))
      val ids = t.documents.select("doc_id")
      def audit(assign: DataFrame, mode: String) = pairs
        .join(assign.select(col("doc_id").as("id_a"), col("split").as("__sa")),
          "id_a")
        .join(assign.select(col("doc_id").as("id_b"), col("split").as("__sb")),
          "id_b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
            .as("n_straddling"))
        .select(lit(mode).as("mode"), col("n_pairs"), col("n_straddling"))
      audit(Curation.assignSplits(ids, "doc_id", SplitWeights), "naive")
        .unionByName(audit(
          Curation.assignSplitsLeakageSafe(ids, "doc_id",
            pairs, "id_a", "id_b", SplitWeights)
            .select("doc_id", "split"), "safe"))
        .orderBy("mode")
    }),

    "x52_leakage_safe_splits" -> ((s, dir) => {
      val t = Tables(s, dir)
      val pairs = TextOps.minhashNearDups(t.documents, "doc_id", "text",
        TextQueries.NearDupThreshold)
      Curation.assignSplitsLeakageSafe(t.documents.select("doc_id"),
          "doc_id", pairs, "id_a", "id_b", SplitWeights)
        .select("doc_id", "rep", "split")
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x56
    // Weighted sample without replacement (Efraimidis–Spirakis): inclusion
    // probability proportional to token count — the "sample long documents
    // more" corpus knob — via key = u^(1/w) over the deterministic id
    // hash, top-k by key. Round-6 keys + id tie-breaks make the exact
    // selection replayable (the x44 pow discipline); the oracle computes
    // the identical keys and the identical top-k.
    "x56_weighted_sample" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0) // zero-weight (empty) docs are rejected
      Curation.weightedSample(docs, "doc_id", "n_tokens", WeightedSampleK)
        .orderBy(desc("sample_key"), col("doc_id"))
    }),

    // ---------------------------------------------------------------- pl11
    // The data-selection capstone: rule cascade → DSIR importance
    // selection, reported as a three-stage funnel (docs / tokens / en
    // count per stage) so the oracle verifies the cascade's survivor
    // set, the importance model fitted ON the survivors, and the exact
    // Gumbel draw — and the en-share shift (the point of DSIR) is
    // visible in the report itself.
    "pl11_dsir_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = TextOps.qualityMetrics(t.documents, "text")
        .select("doc_id", "lang", "n_tokens", "stopword_ratio",
          "mean_token_len")
      val rep = TextOps.repetitionMetrics(t.documents, "doc_id", "text")
        .select("doc_id", "dup_bigram_frac")
      // Skinny persist: (doc_id, lang, n_tokens, cascade metrics) feeds
      // the corpus stats, the cascade, and the selection join — never text.
      val metrics = GraftCache.persist(
        q.join(rep, Seq("doc_id"), "left")
          .withColumn("dup_bigram_frac",
            coalesce(col("dup_bigram_frac"), lit(0.0))))
      val rules = Seq(
        Quality.Rule("min_tokens",
          col("n_tokens") < TextQueries.CascadeMinTokens),
        Quality.Rule("mean_token_len", !col("mean_token_len")
          .between(TextQueries.CascadeMtlLo, TextQueries.CascadeMtlHi)),
        Quality.Rule("stopword_floor",
          col("stopword_ratio") < TextQueries.CascadeStopFloor),
        Quality.Rule("dup_bigrams",
          col("dup_bigram_frac") > TextQueries.CascadeDupMax))
      val surv = GraftCache.persist(
        Quality.cascadeSurvivors(metrics, rules)
          .select("doc_id", "lang", "n_tokens"))
      val survDocs = t.documents
        .join(surv.select("doc_id"), Seq("doc_id"), "left_semi")
      val scored = Curation.dsirLogWeights(survDocs,
        survDocs.filter(col("lang") === DsirTargetLang), "doc_id", "text",
        DsirBuckets)
      val sel = Curation.gumbelTopK(
          scored.withColumn("__lw", col("log_weight_micro") / lit(1e6)),
          "doc_id", "__lw", DsirK)
        .select("doc_id").join(surv, Seq("doc_id"))
      def stage(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L))
            .as("n_en"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
          col("n_en"))
      stage(metrics, "0_corpus")
        .unionByName(stage(surv, "1_cascade"))
        .unionByName(stage(sel, "2_dsir_selected"))
        .orderBy("stage")
    }),

    // ---------------------------------------------------------------- pl10
    // The modern classifier-era curation loop composed end-to-end: the
    // fixed-weight sigmoid gate (x53) admits documents; near-dup pairs
    // are mined over the ADMITTED corpus only (text re-read behind a
    // semi-join on gated ids — the skinny-persist discipline of pl5);
    // leakage-safe splits (x52) key every dup cluster to one split; the
    // report accounts each split's docs, dup groups, tokens, and mean
    // classifier score. The oracle replays all four stages — feature
    // z-scores, sigmoid gate, recursive-CTE clustering over the gated
    // subset, hash-bucket splits — from the shared SQL builders.
    "pl10_classifier_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = TextOps.qualityMetrics(t.documents, "text")
        .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
          "mean_token_len")
      val rep = TextOps.repetitionMetrics(t.documents, "doc_id", "text")
        .select("doc_id", "dup_bigram_frac")
      val z = Quality.standardize(q.join(rep, Seq("doc_id"), "left"),
        Seq("n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len",
          "dup_bigram_frac"))
      val gated = GraftCache.persist(
        Quality.scoreLinear(z, TextQueries.ScoreWeights, TextQueries.ScoreBias)
          .filter(col("quality_pass"))
          .select("doc_id", "n_tokens", "quality_score"))
      val gatedDocs = t.documents
        .join(gated.select("doc_id"), Seq("doc_id"), "left_semi")
      val pairs = TextOps.minhashNearDups(gatedDocs, "doc_id", "text",
        TextQueries.NearDupThreshold)
      Curation.assignSplitsLeakageSafe(gated, "doc_id", pairs,
          "id_a", "id_b", SplitWeights)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("rep").as("n_groups"),
          sum("n_tokens").as("n_tokens"),
          round(avg("quality_score"), 4).as("mean_score"))
        .orderBy("split")
    }),

    // ----------------------------------------------------------------- pl9
    // Training-shard export — the terminal stage of the curation story:
    // quality-pass documents are packed into token-budget bins in shard
    // hash order (x23/x24's arithmetic) and EXPORTED as a shard-partitioned
    // parquet layout (one directory per shard, rows sorted by (bin,
    // doc_id) so a trainer streams each shard's bins in order). The
    // report reads BACK through the partitioned scan — proving the export
    // round-trips losslessly — and the oracle replays gate + shard + pack
    // arithmetic per shard (docs, bins, tokens), so a wrong partition
    // column, a dropped row, or a mis-binned document all hash-mismatch.
    "pl9_export_shards" -> ((s, dir) => {
      val t = Tables(s, dir)
      // Skinny persist BEFORE the gate filter — without it predicate
      // pushdown inlines quality_ok through the metrics projection and
      // re-runs the tokenizing split per stopword per row (the x66
      // finding; same barrier pl5/pl8 use).
      val docs = GraftCache.persist(
          TextOps.qualityMetrics(t.documents, "text")
            .select("doc_id", "n_tokens", "quality_ok"))
        .filter(col("quality_ok")).select("doc_id", "n_tokens")
      val packed = Curation.packSequences(docs, "doc_id", "n_tokens",
        PackBudget, PackShards)
      val out = SinkQueries.sinkDir("pl9_shards")
      packed.repartition(col("shard"))
        .sortWithinPartitions("shard", "bin", "doc_id")
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      s.read.parquet(out)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("bin").as("n_bins"),
          sum("n_tokens").as("shard_tokens"),
          max("bin").as("max_bin"))
        .select(col("shard").cast("int").as("shard"), col("n_docs"),
          col("n_bins"), col("shard_tokens"), col("max_bin"))
        .orderBy("shard")
    }),

    // ----------------------------------------------------------------- x44
    // Temperature-flattened mix (multilingual α-sampling): targets derived
    // from the measured distribution itself — share^α renormalized — so
    // the head language downsamples and tail languages upsample by
    // deterministic repetition. Same funnel shape as x42; the oracle
    // replays the measured shares, the temperature weights, the derived
    // rates, and the exact multiplicities.
    "x44_temperature_mix" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val up = Curation.temperatureResample(docs, "lang", "doc_id",
        "n_tokens", MixAlpha, SampleBuckets)
      val kept = up.groupBy("lang")
        .agg(count(lit(1)).as("n_rows_out"),
          countDistinct("doc_id").as("n_docs_kept"),
          sum("n_tokens").as("tokens_out"),
          max("rep").as("max_rep"),
          round(max("mix_rate"), 6).as("mix_rate"))
      val totals = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs_in"), sum("n_tokens").as("tokens_in"))
      totals.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_docs_in"), col("tokens_in"),
          coalesce(col("n_rows_out"), lit(0L)).as("n_rows_out"),
          coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
          coalesce(col("tokens_out"), lit(0L)).as("tokens_out"),
          col("max_rep"), col("mix_rate"))
        .orderBy("lang")
    }),

    // ----------------------------------------------------------------- x40
    // Perplexity-curriculum buckets: corpus quartile thresholds of the
    // bigram-LM document score (x32's naturalness proxy), each document
    // binned by count-of-thresholds-below — two scans + a 1-row broadcast,
    // never an ntile window (ntile = a total sort of the corpus). Reported
    // as per-bin stats so the oracle checks thresholds AND assignment.
    "x40_perplexity_bins" -> ((s, dir) => {
      val t = Tables(s, dir)
      // Skinny persist: (doc_id, n_bigrams, avg_logp) feeds the threshold
      // aggregate and the bin assignment — never the text.
      val scored = GraftCache.persist(
        TextOps.bigramLogProb(t.documents, "doc_id", "text"))
      Curation.percentileBins(scored, "avg_logp", BinQuartiles)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          round(min("avg_logp"), 4).as("min_lp"),
          round(max("avg_logp"), 4).as("max_lp"),
          sum("n_bigrams").as("n_bigrams"))
        .orderBy("bin")
    }),

    // ----------------------------------------------------------------- x20
    // Per-domain quota cap: at most 15 documents per source, selected in
    // hash order — the "cap boilerplate-heavy domains" pass.
    "x20_domain_cap" -> ((s, dir) => {
      val t = Tables(s, dir)
      Curation.quotaCap(t.documents, "source", "doc_id", DomainQuota)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    }),

    // ----------------------------------------------------------------- x21
    // Benchmark decontamination: training docs (doc_id % 10 ≠ 0) sharing
    // any distinct 5-gram with the eval split (doc_id % 10 = 0), joined on
    // the 60-bit gram hash with the eval side broadcast.
    "x21_decontaminate" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      Curation.decontaminate(
          docs.filter(col("doc_id") % EvalModulus =!= 0),
          docs.filter(col("doc_id") % EvalModulus === 0),
          "doc_id", "text", DecontamGramSize)
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x61
    // N-gram novelty/coverage: for each eval doc, the fraction of its
    // distinct 3-grams already present anywhere in the training corpus —
    // the continuous companion to x21's binary decontamination flag
    // (memorization-risk / synthetic-data-novelty audit). Distinct gram
    // hashes on both sides, partitionable equi-join, one integer
    // division per doc.
    "x61_gram_coverage" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      Curation.gramCoverage(
          docs.filter(col("doc_id") % EvalModulus === 0),
          docs.filter(col("doc_id") % EvalModulus =!= 0),
          "doc_id", "text", CoverageGramSize)
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x22
    // Int8 scalar quantization round-trip: per-vector reconstruction MSE
    // and max abs error (sequential folds — bit-identical to the oracle).
    "x22_int8_quant" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.embeddings
        .select(col("vec_id"), VectorOps.quantError(col("embedding")).as("e"))
        .select(col("vec_id"),
          round(col("e.mse"), 8).as("mse_r"),
          round(col("e.max_abs_err"), 8).as("max_err_r"))
        .orderBy("vec_id")
    }),

    // ----------------------------------------------------------------- x23
    // Hash-sharded training-order shuffle: 8 shards, reproducible in-shard
    // positions — the scale-safe substitute for ORDER BY random().
    "x23_train_shuffle" -> ((s, dir) => {
      val t = Tables(s, dir)
      Curation.shardedShuffle(t.documents.select("doc_id"), "doc_id", ShuffleShards)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- pl5
    // End-to-end corpus-curation pipeline — the nightly job a training-data
    // engine runs, composed from the suite's own operators: quality gate →
    // MinHash near-dup removal (keep-lowest-id) → stratified sample →
    // per-domain cap → sequence packing. Output is the funnel: per-stage
    // surviving documents and tokens, plus the packed-bin count — so the
    // oracle verifies every stage boundary, not just the end state.
    "pl5_curation_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      def stage(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      // The funnel reads each boundary from multiple stage branches —
      // persist the two expensive ones (metric computation feeds stages
      // 0-2; the dedup output feeds stages 2-5) so the six-branch union is
      // one pipeline pass, not six. Both persisted frames are SKINNY
      // (ids + per-doc scalars, never `text`): the stage counters and the
      // sample/cap/pack tail never touch text, and at 100x persisting the
      // corpus's widest column just to feed six count branches would BE
      // the pipeline's memory footprint. The minhash pass instead re-reads
      // text columnar from the parquet scan, restricted to quality
      // survivors by a semi-join on the persisted ids.
      val metrics = GraftCache.persist(TextOps.qualityMetrics(t.documents, "text")
        .select("doc_id", "lang", "source", "n_tokens", "quality_ok"))
      val quality = metrics.filter(col("quality_ok"))
      val qualityText = t.documents.select("doc_id", "text")
        .join(quality.select("doc_id"), Seq("doc_id"), "left_semi")
      val dropIds = TextOps.minhashNearDups(qualityText, "doc_id", "text",
          TextQueries.NearDupThreshold)
        .select(col("id_b").as("doc_id")).distinct()
      val deduped = GraftCache.persist(
        quality.join(dropIds, Seq("doc_id"), "left_anti"))
      val sampled = Curation.stratifiedSample(deduped, "lang", "doc_id",
        SampleRates, DefaultRate, SampleBuckets)
      // Native bounded-heap cap (row-identical to quotaCap, spec-proven):
      // skew-safety is structural — at 100x a monster domain streams
      // through a k-bounded heap instead of materializing for a window
      // sort, with ≤ k rows per (domain × partition) crossing the wire.
      val capped = Curation.quotaCapNative(sampled, "source", "doc_id", DomainQuota)
      val bins = Curation.packSequences(
          capped.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
          PackBudget, PackShards)
        .groupBy("shard", "bin").agg(sum("n_tokens").as("n_tokens"))
      stage("0_raw", metrics)
        .union(stage("1_quality", quality))
        .union(stage("2_neardup", deduped))
        .union(stage("3_sample", sampled))
        .union(stage("4_cap", capped))
        .union(stage("5_pack_bins", bins))
        .orderBy("stage")
    }),

    // ----------------------------------------------------------------- x24
    // Shard-local sequence packing: token counts packed into 2048-token
    // bins in shard hash order; per-bin document and token totals.
    // ----------------------------------------------------------------- x66
    // Pack-efficiency report: per training shard, how well the x24 bins
    // use their token budget — bins, tokens, waste (budget×bins −
    // tokens) and fill fraction, plus the emptiest/fullest bin. The
    // padding-cost observability a token-budget packer owes its trainer
    // (waste IS padding compute at training time). A bin can exceed the
    // budget only via an oversized singleton document, which shows up
    // here as max_bin_tokens > budget rather than being hidden.
    "x66_pack_efficiency" -> ((s, dir) => {
      val t = Tables(s, dir)
      // Skinny persist BEFORE the gate filter: predicate pushdown would
      // otherwise inline quality_ok through the metrics projection and
      // re-run the tokenizing split once per stopword per row (measured
      // 7.6s → 2.9s at sf0.1). Same barrier pl5/pl8 use for their gates.
      val docs = GraftCache.persist(
          TextOps.qualityMetrics(t.documents, "text")
            .select("doc_id", "n_tokens", "quality_ok"))
        .filter(col("quality_ok")).select("doc_id", "n_tokens")
      val bins = Curation.packSequences(docs, "doc_id", "n_tokens",
          PackBudget, PackShards)
        .groupBy("shard", "bin").agg(sum("n_tokens").as("bin_tokens"))
      bins.groupBy("shard")
        .agg(count(lit(1)).as("n_bins"),
          sum("bin_tokens").as("tokens"),
          (lit(PackBudget) * count(lit(1)) - sum("bin_tokens")).as("waste"),
          round(sum("bin_tokens") / (lit(PackBudget) * count(lit(1))), 4)
            .as("fill_frac"),
          min("bin_tokens").as("min_bin_tokens"),
          max("bin_tokens").as("max_bin_tokens"))
        .orderBy("shard")
    }),

    "x24_sequence_pack" -> ((s, dir) => {
      val t = Tables(s, dir)
      val sized = t.documents.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packSequences(sized, "doc_id", "n_tokens", PackBudget, PackShards)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
        .orderBy("shard", "bin")
    })
  )

  // --------------------------------------------------------- oracle SQL gen

  /** DuckDB tokens expression — the ONE shared definition: pl5 feeds this
    * tokenization into TextQueries' CTE builders, so both must be the same
    * string or the oracle silently diverges from the Spark pipeline. */
  private def toksSql: String = TextQueries.toksSql

  /** DuckDB 60-bit md5 hash of a string expression. */
  private def md5h(e: String): String = s"('0x' || substr(md5($e),1,15))::BIGINT"

  /** DuckDB id hash (Curation.idHash: md5Hash60 of the id rendered as a
    * decimal string — both engines print int64 identically). */
  private def idh(idExpr: String): String = md5h(s"CAST($idExpr AS VARCHAR)")

  /** CASE expression assigning [[SplitWeights]] splits from the hash
    * bucket of `keyExpr` — shared by the x50/x52 oracles and the pl10
    * pipeline replay (one arithmetic, three consumers). */
  private def splitCaseSql(keyExpr: String): String = {
    val cases = SplitWeights.scanLeft(("", 0.0)) {
      case ((_, acc), (name, w)) => (name, acc + w)
    }.tail.init
      .map { case (name, t) =>
        s"WHEN ${idh(keyExpr)} % 1000 < ${t * 1000} THEN '$name'" }
      .mkString(" ")
    s"CASE $cases ELSE '${SplitWeights.last._1}' END"
  }

  private def simhashNearDupSql: String = {
    val bits = (0 until TextOps.SimHashBits).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1)*2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val mask = (1L << TextOps.SimHashBandBits) - 1
    val bandStructs = (0 until TextOps.SimHashBands).map { b =>
      s"{'band': $b, 'bits': (simhash >> ${b * TextOps.SimHashBandBits}) & $mask}"
    }.mkString(", ")
    s"""WITH toked AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |    ELSE list_transform(range(0, len(toks)-2),
       |      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])) END AS shingles
       |  FROM toked),
       |hashed AS (
       |  SELECT doc_id, list_transform(list_distinct(shingles), t -> ${md5h("t")}) AS hs
       |  FROM sh),
       |sigs AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM hashed),
       |banded AS (
       |  SELECT doc_id, simhash, u.b.band AS band, u.b.bits AS bits
       |  FROM sigs, UNNEST([$bandStructs]) u(b)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sa, sb)) <= $HammingMaxDist
       |ORDER BY 1, 2""".stripMargin
  }

  private def stratifiedSampleSql: String = {
    val cases = SampleRates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""SELECT lang, count(*) AS n_docs,
       |  count(*) FILTER (WHERE ${idh("doc_id")} % $SampleBuckets <
       |    CASE lang $cases ELSE $DefaultRate END) AS n_kept
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Replays [[Curation.domainMixResample]]: measured per-lang token
    * shares, rate = least(1, target/share), hash-coin keep set — every
    * intermediate an exact integer sum in a double, so rates and the keep
    * set are bit-identical. */
  private def domainMixSql: String = {
    val cases = MixTargetShares.toSeq.sortBy(_._1)
      .map { case (l, v) => s"WHEN '$l' THEN $v" }.mkString(" ")
    val target = s"CASE lang $cases ELSE $MixDefaultShare END"
    s"""WITH docs AS (
       |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)),
       |stats AS (SELECT lang, sum(n_tokens)::DOUBLE AS ssize FROM docs GROUP BY 1),
       |total AS (SELECT sum(n_tokens)::DOUBLE AS t FROM docs),
       |rates AS (
       |  SELECT lang, least(1.0, $target / (ssize / t)) AS mix_rate
       |  FROM stats, total),
       |kept AS (
       |  SELECT d.lang, d.n_tokens, r.mix_rate FROM docs d
       |  JOIN rates r USING (lang)
       |  WHERE ${idh("d.doc_id")} % $SampleBuckets < mix_rate * $SampleBuckets),
       |k AS (
       |  SELECT lang, count(*) AS n_docs_kept,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       |    round(max(mix_rate), 6) AS mix_rate
       |  FROM kept GROUP BY 1),
       |tot AS (
       |  SELECT lang, count(*) AS n_docs_in,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_in
       |  FROM docs GROUP BY 1)
       |SELECT tot.lang, n_docs_in, tokens_in,
       |  coalesce(n_docs_kept, 0) AS n_docs_kept,
       |  coalesce(tokens_kept, 0) AS tokens_kept, mix_rate
       |FROM tot LEFT JOIN k USING (lang)
       |ORDER BY lang""".stripMargin
  }

  /** Replays [[Curation.domainMixResampleUp]]: UNCAPPED rates, per-doc
    * copy count = floor(rate) + hash-coin extra, multiplicities verified
    * arithmetically (sum/max of copies ≡ the Spark side's exploded row
    * counts and max rep index). */
  private def domainMixUpSql: String = {
    val cases = UpTargetShares.toSeq.sortBy(_._1)
      .map { case (l, v) => s"WHEN '$l' THEN $v" }.mkString(" ")
    val target = s"CASE lang $cases ELSE $UpDefaultShare END"
    s"""WITH docs AS (
       |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)),
       |stats AS (SELECT lang, sum(n_tokens)::DOUBLE AS ssize FROM docs GROUP BY 1),
       |total AS (SELECT sum(n_tokens)::DOUBLE AS t FROM docs),
       |rates AS (
       |  SELECT lang, $target / (ssize / t) AS mix_rate
       |  FROM stats, total),
       |copies AS (
       |  SELECT d.lang, d.n_tokens, r.mix_rate,
       |    CAST(floor(r.mix_rate) AS BIGINT) +
       |      (CASE WHEN ${idh("d.doc_id")} % $SampleBuckets <
       |         (r.mix_rate - floor(r.mix_rate)) * $SampleBuckets
       |       THEN 1 ELSE 0 END) AS c
       |  FROM docs d JOIN rates r USING (lang)),
       |k AS (
       |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_rows_out,
       |    count(*) AS n_docs_kept,
       |    CAST(sum(n_tokens * c) AS BIGINT) AS tokens_out,
       |    max(c) - 1 AS max_rep,
       |    round(max(mix_rate), 6) AS mix_rate
       |  FROM copies WHERE c > 0 GROUP BY 1),
       |tot AS (
       |  SELECT lang, count(*) AS n_docs_in,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_in
       |  FROM docs GROUP BY 1)
       |SELECT tot.lang, n_docs_in, tokens_in,
       |  coalesce(n_rows_out, 0) AS n_rows_out,
       |  coalesce(n_docs_kept, 0) AS n_docs_kept,
       |  coalesce(tokens_out, 0) AS tokens_out, max_rep, mix_rate
       |FROM tot LEFT JOIN k USING (lang)
       |ORDER BY lang""".stripMargin
  }

  /** Replays [[Curation.temperatureResample]]: measured shares →
    * round-6 share^α weights → renormalized round-6 rates → the same
    * copies arithmetic as [[domainMixUpSql]]. */
  private def temperatureMixSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)),
       |stats AS (SELECT lang, sum(n_tokens)::DOUBLE AS ssize FROM docs GROUP BY 1),
       |total AS (SELECT sum(n_tokens)::DOUBLE AS t FROM docs),
       |weighted AS (
       |  SELECT lang, ssize / t AS share,
       |    round(pow(ssize / t, $MixAlpha), 6) AS w
       |  FROM stats, total),
       |wsum AS (SELECT sum(w) AS ws FROM weighted),
       |rates AS (
       |  SELECT lang, round(w / ws / share, 6) AS mix_rate FROM weighted, wsum),
       |copies AS (
       |  SELECT d.lang, d.n_tokens, r.mix_rate,
       |    CAST(floor(r.mix_rate) AS BIGINT) +
       |      (CASE WHEN ${idh("d.doc_id")} % $SampleBuckets <
       |         (r.mix_rate - floor(r.mix_rate)) * $SampleBuckets
       |       THEN 1 ELSE 0 END) AS c
       |  FROM docs d JOIN rates r USING (lang)),
       |k AS (
       |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_rows_out,
       |    count(*) AS n_docs_kept,
       |    CAST(sum(n_tokens * c) AS BIGINT) AS tokens_out,
       |    max(c) - 1 AS max_rep,
       |    round(max(mix_rate), 6) AS mix_rate
       |  FROM copies WHERE c > 0 GROUP BY 1),
       |tot AS (
       |  SELECT lang, count(*) AS n_docs_in,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_in
       |  FROM docs GROUP BY 1)
       |SELECT tot.lang, n_docs_in, tokens_in,
       |  coalesce(n_rows_out, 0) AS n_rows_out,
       |  coalesce(n_docs_kept, 0) AS n_docs_kept,
       |  coalesce(tokens_out, 0) AS tokens_out, max_rep, mix_rate
       |FROM tot LEFT JOIN k USING (lang)
       |ORDER BY lang""".stripMargin

  /** Replays pl9: quality gate (shared x2 arithmetic) → shard hash →
    * prefix-sum-DIV-budget bin → per-shard export report. Storage layout
    * is a plan property; the oracle replays the DATA the export must
    * round-trip. */
  private def exportShardsSql: String =
    s"""WITH toked AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    ${TextQueries.punctRatioSql("text")} AS punct,
       |    ${TextQueries.stopRatioSql("toks")} AS stop
       |  FROM toked),
       |pass AS (
       |  SELECT doc_id, n_tokens FROM m
       |  WHERE ${TextQueries.qualityOkSql("n_tokens", "punct", "stop")}),
       |packed AS (
       |  SELECT CAST(${idh("doc_id")} % $PackShards AS INT) AS shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY ${idh("doc_id")} % $PackShards
       |      ORDER BY ${idh("doc_id")}, doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM pass),
       |b AS (
       |  SELECT shard, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin,
       |    n_tokens
       |  FROM packed)
       |SELECT shard, count(*) AS n_docs, count(DISTINCT bin) AS n_bins,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens, max(bin) AS max_bin
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Replays [[Curation.percentileBins]] over the x32 bigram score:
    * quantile_cont thresholds (round 6), bin = count of thresholds
    * strictly below the score. */
  private def perplexityBinsSql: String = {
    val binExpr = BinQuartiles.indices.map { i =>
      s"(CASE WHEN avg_logp > round(t[${i + 1}], 6) THEN 1 ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")
    val probList = BinQuartiles.mkString("[", ", ", "]")
    s"""WITH ${TextQueries.bigramScoredCtes},
       |thr AS (SELECT quantile_cont(avg_logp, $probList) AS t FROM scored),
       |binned AS (
       |  SELECT s.doc_id, s.n_bigrams, s.avg_logp, $binExpr AS bin
       |  FROM scored s, thr)
       |SELECT bin, count(*) AS n_docs,
       |  round(min(avg_logp), 4) AS min_lp,
       |  round(max(avg_logp), 4) AS max_lp,
       |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams
       |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private def decontaminateSql: String = {
    val n = DecontamGramSize
    val gramList = (1 to n).map(k => s"toks[i+$k]").mkString(", ")
    s"""WITH toked AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, ${md5h("g")} AS gh FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(toks) < $n THEN []
       |      ELSE list_transform(range(0, len(toks)-${n - 1}),
       |        i -> concat_ws(' ', $gramList)) END) AS g
       |    FROM toked)
       |  GROUP BY 1, 2),
       |eg AS (SELECT DISTINCT gh FROM grams WHERE doc_id % $EvalModulus = 0)
       |SELECT t.doc_id, count(*) AS n_shared_grams
       |FROM (SELECT * FROM grams WHERE doc_id % $EvalModulus <> 0) t
       |JOIN eg USING (gh)
       |GROUP BY 1 HAVING count(*) >= 1 ORDER BY 1""".stripMargin
  }

  private def quantSql: String = {
    val s = VectorOps.QuantScale
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CAST(x AS DOUBLE) -
       |        CAST(round(least(greatest(CAST(x AS DOUBLE), -1.0), 1.0) * $s) AS INT)
       |          / $s.0) AS err,
       |    len(embedding) AS d
       |  FROM embeddings)
       |SELECT vec_id,
       |  round(list_reduce(list_prepend(0.0, list_transform(err, x -> x*x)),
       |    (a, b) -> a + b) / nullif(d, 0), 8) AS mse_r,
       |  round(list_max(list_transform(err, x -> abs(x))), 8) AS max_err_r
       |FROM e ORDER BY vec_id""".stripMargin
  }

  /** Funnel replay: every stage boundary of pl5 as CTEs, reusing the exact
    * metric/near-dup SQL generators of the standalone oracles. */
  private def curationPipelineSql: String = {
    val cases = SampleRates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    def funnelRow(name: String, from: String, tokCol: String = "n_tokens") =
      s"""SELECT '$name' AS stage, count(*) AS n_docs,
         |  CAST(coalesce(sum($tokCol), 0) AS BIGINT) AS n_tokens FROM $from""".stripMargin
    s"""WITH rawd AS (
       |  SELECT doc_id, lang, source, text, $toksSql AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, lang, source, text, toks,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    ${TextQueries.punctRatioSql("text")} AS pr,
       |    ${TextQueries.stopRatioSql("toks")} AS sr
       |  FROM rawd),
       |q AS (SELECT * FROM m WHERE ${TextQueries.qualityOkSql("n_tokens", "pr", "sr")}),
       |qsrc AS (SELECT doc_id AS id, toks FROM q),
       |${TextQueries.minhashPairCtes("qsrc")},
       |drops AS (SELECT DISTINCT id_b FROM jac
       |  WHERE jaccard >= ${TextQueries.NearDupThreshold}),
       |dedup AS (SELECT * FROM q WHERE doc_id NOT IN (SELECT id_b FROM drops)),
       |samp AS (SELECT * FROM dedup
       |  WHERE ${idh("doc_id")} % $SampleBuckets < CASE lang $cases ELSE $DefaultRate END),
       |cap AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY source ORDER BY ${idh("doc_id")}, doc_id) AS rk FROM samp)
       |  WHERE rk <= $DomainQuota),
       |packed AS (
       |  SELECT CAST(h % $PackShards AS INT) AS shard, doc_id, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY h % $PackShards
       |      ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (SELECT doc_id, n_tokens, ${idh("doc_id")} AS h FROM cap)),
       |bins AS (
       |  SELECT shard, (cum - n_tokens) // $PackBudget AS bin,
       |    CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |  FROM packed GROUP BY 1, 2)
       |SELECT * FROM (
       |  ${funnelRow("0_raw", "m")}
       |  UNION ALL ${funnelRow("1_quality", "q")}
       |  UNION ALL ${funnelRow("2_neardup", "dedup")}
       |  UNION ALL ${funnelRow("3_sample", "samp")}
       |  UNION ALL ${funnelRow("4_cap", "cap")}
       |  UNION ALL ${funnelRow("5_pack_bins", "bins", "bin_tokens")}
       |) ORDER BY stage""".stripMargin
  }

  /** Replays x57 end to end: unigram+bigram feature hashing into
    * [[DsirBuckets]] cells, the smoothed target/raw models, per-document
    * log importance weights, and the deterministic Gumbel-top-k draw. The
    * denominator literal is 2^60+4096 (double-exact; keeps u strictly
    * inside (0,1)). */
  private def dsirSelectSql: String = {
    val b = DsirBuckets
    val denom = (1L << 60) + 4096L
    s"""WITH toked AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_concat(toks,
       |    CASE WHEN len(toks) < 2 THEN []
       |      ELSE list_transform(range(0, len(toks)-1),
       |        i -> concat_ws(' ', toks[i+1], toks[i+2])) END)) AS g
       |  FROM toked),
       |cells AS (
       |  SELECT doc_id, ${md5h("g")} % $b AS cell, count(*) AS c
       |  FROM grams GROUP BY 1, 2),
       |rawm AS (SELECT cell, CAST(sum(c) AS BIGINT) AS rc FROM cells GROUP BY 1),
       |tgtm AS (
       |  SELECT cell, CAST(sum(c) AS BIGINT) AS tc
       |  FROM cells JOIN documents USING (doc_id)
       |  WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |rt AS (SELECT sum(rc)::DOUBLE AS rt FROM rawm),
       |tt AS (SELECT sum(tc)::DOUBLE AS tt FROM tgtm),
       |ratio AS (
       |  SELECT rawm.cell, CAST(round(ln(
       |    ((coalesce(tc, 0)::DOUBLE + 0.5) / (tt + ${0.5 * b})) /
       |    ((rc::DOUBLE + 0.5) / (rt + ${0.5 * b}))) * 1000000) AS BIGINT) AS lr
       |  FROM rawm LEFT JOIN tgtm USING (cell), rt, tt),
       |scored AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(c * lr) AS BIGINT) AS log_weight_micro
       |  FROM cells JOIN ratio USING (cell) GROUP BY 1)
       |SELECT s.doc_id, d.lang, s.n_grams, s.log_weight_micro,
       |  round(s.log_weight_micro / 1000000.0 - ln(-ln(
       |    (${idh("s.doc_id")} + 1)::DOUBLE / $denom.0)), 6) AS gumbel_key
       |FROM scored s JOIN documents d USING (doc_id)
       |ORDER BY gumbel_key DESC, s.doc_id LIMIT $DsirK""".stripMargin
  }

  /** Replays x59: refits the model on the corpus split (the persisted
    * table is a plan property — the oracle checks the SCORES a stored
    * model must yield), scores the batch with the unseen-cell default
    * for cells outside the fitted corpus. */
  private def dsirScreenSql: String = {
    val b = DsirBuckets
    s"""WITH toked AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, lang, unnest(list_concat(toks,
       |    CASE WHEN len(toks) < 2 THEN []
       |      ELSE list_transform(range(0, len(toks)-1),
       |        i -> concat_ws(' ', toks[i+1], toks[i+2])) END)) AS g
       |  FROM toked),
       |hashed AS (
       |  SELECT doc_id, lang, ${md5h("g")} % $b AS cell FROM grams),
       |rawm AS (
       |  SELECT cell, count(*) AS rc FROM hashed
       |  WHERE doc_id % $EvalModulus <> 0 GROUP BY 1),
       |tgtm AS (
       |  SELECT cell, count(*) AS tc FROM hashed
       |  WHERE doc_id % $EvalModulus <> 0 AND lang = '$DsirTargetLang'
       |  GROUP BY 1),
       |rt AS (SELECT sum(rc)::DOUBLE AS rt FROM rawm),
       |tt AS (SELECT sum(tc)::DOUBLE AS tt FROM tgtm),
       |ratio AS (
       |  SELECT rawm.cell, CAST(round(ln(
       |    ((coalesce(tc, 0)::DOUBLE + 0.5) / (tt + ${0.5 * b})) /
       |    ((rc::DOUBLE + 0.5) / (rt + ${0.5 * b}))) * 1000000) AS BIGINT) AS lr
       |  FROM rawm LEFT JOIN tgtm USING (cell), rt, tt),
       |dflt AS (
       |  SELECT CAST(round(ln((rt + ${0.5 * b}) / (tt + ${0.5 * b}))
       |    * 1000000) AS BIGINT) AS dlr FROM rt, tt),
       |batch_cells AS (
       |  SELECT doc_id, cell, count(*) AS c FROM hashed
       |  WHERE doc_id % $EvalModulus = 0 GROUP BY 1, 2)
       |SELECT bc.doc_id, d.lang, CAST(sum(bc.c) AS BIGINT) AS n_grams,
       |  CAST(sum(bc.c * coalesce(ratio.lr, dflt.dlr)) AS BIGINT)
       |    AS log_weight_micro
       |FROM batch_cells bc
       |LEFT JOIN ratio USING (cell), dflt
       |JOIN documents d ON d.doc_id = bc.doc_id
       |GROUP BY 1, 2
       |ORDER BY bc.doc_id""".stripMargin
  }

  /** Replays pl11 end to end: the shared x2 + x29 metric CTEs, the x58
    * first-failure cascade (survivor = stage −1, the identical CASE), the
    * DSIR model fitted ON the survivors, the exact Gumbel draw, and the
    * three funnel stages. */
  private def dsirPipelineSql: String = {
    val b = DsirBuckets
    val denom = (1L << 60) + 4096L
    s"""${TextQueries.qualityFeatureCtes},
       |staged AS (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens < ${TextQueries.CascadeMinTokens} THEN 0
       |         WHEN NOT (mean_token_len BETWEEN ${TextQueries.CascadeMtlLo}
       |           AND ${TextQueries.CascadeMtlHi}) THEN 1
       |         WHEN stopword_ratio < ${TextQueries.CascadeStopFloor} THEN 2
       |         WHEN coalesce(dup_bigram_frac, 0)
       |           > ${TextQueries.CascadeDupMax} THEN 3
       |         ELSE -1 END AS st
       |  FROM f),
       |surv AS (SELECT doc_id FROM staged WHERE st = -1),
       |sdocs AS (
       |  SELECT t.doc_id, d.lang, t.toks
       |  FROM toked t JOIN documents d USING (doc_id) JOIN surv USING (doc_id)),
       |grams2 AS (
       |  SELECT doc_id, lang, unnest(list_concat(toks,
       |    CASE WHEN len(toks) < 2 THEN []
       |      ELSE list_transform(range(0, len(toks)-1),
       |        i -> concat_ws(' ', toks[i+1], toks[i+2])) END)) AS g
       |  FROM sdocs),
       |cells2 AS (
       |  SELECT doc_id, lang, ${md5h("g")} % $b AS cell FROM grams2),
       |dcells AS (SELECT doc_id, cell, count(*) AS c FROM cells2 GROUP BY 1, 2),
       |rawm2 AS (SELECT cell, count(*) AS rc FROM cells2 GROUP BY 1),
       |tgtm2 AS (
       |  SELECT cell, count(*) AS tc FROM cells2
       |  WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |rt2 AS (SELECT sum(rc)::DOUBLE AS rt FROM rawm2),
       |tt2 AS (SELECT sum(tc)::DOUBLE AS tt FROM tgtm2),
       |ratio2 AS (
       |  SELECT rawm2.cell, CAST(round(ln(
       |    ((coalesce(tc, 0)::DOUBLE + 0.5) / (tt + ${0.5 * b})) /
       |    ((rc::DOUBLE + 0.5) / (rt + ${0.5 * b}))) * 1000000) AS BIGINT) AS lr
       |  FROM rawm2 LEFT JOIN tgtm2 USING (cell), rt2, tt2),
       |scored2 AS (
       |  SELECT doc_id, CAST(sum(c * lr) AS BIGINT) AS lwm
       |  FROM dcells JOIN ratio2 USING (cell) GROUP BY 1),
       |sel AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, round(lwm / 1000000.0 - ln(-ln(
       |      (${idh("doc_id")} + 1)::DOUBLE / $denom.0)), 6) AS gk
       |    FROM scored2)
       |  ORDER BY gk DESC, doc_id LIMIT $DsirK),
       |s0 AS (
       |  SELECT '0_corpus' AS stage, count(*) AS n_docs,
       |    CAST(sum(m.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN d.lang = '$DsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_en
       |  FROM m JOIN documents d USING (doc_id)),
       |s1 AS (
       |  SELECT '1_cascade' AS stage, count(*) AS n_docs,
       |    CAST(sum(m.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN d.lang = '$DsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_en
       |  FROM m JOIN documents d USING (doc_id) JOIN surv USING (doc_id)),
       |s2 AS (
       |  SELECT '2_dsir_selected' AS stage, count(*) AS n_docs,
       |    CAST(sum(m.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN d.lang = '$DsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_en
       |  FROM m JOIN documents d USING (doc_id) JOIN sel USING (doc_id))
       |SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |ORDER BY stage""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "pl5_curation_pipeline" -> curationPipelineSql,
    "x57_dsir_select" -> dsirSelectSql,
    "x59_dsir_screen" -> dsirScreenSql,
    "pl11_dsir_pipeline" -> dsirPipelineSql,
    "x66_pack_efficiency" ->
      s"""WITH toked AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    ${TextQueries.punctRatioSql("text")} AS punct,
         |    ${TextQueries.stopRatioSql("toks")} AS stop
         |  FROM toked),
         |pass AS (
         |  SELECT doc_id, n_tokens FROM m
         |  WHERE ${TextQueries.qualityOkSql("n_tokens", "punct", "stop")}),
         |packed AS (
         |  SELECT CAST(${idh("doc_id")} % $PackShards AS INT) AS shard,
         |    n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY ${idh("doc_id")} % $PackShards
         |      ORDER BY ${idh("doc_id")}, doc_id ROWS UNBOUNDED PRECEDING)
         |      AS cum
         |  FROM pass),
         |b AS (
         |  SELECT shard, CAST((cum - n_tokens) // $PackBudget AS BIGINT)
         |    AS bin, n_tokens
         |  FROM packed),
         |bins AS (
         |  SELECT shard, bin, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |  FROM b GROUP BY 1, 2)
         |SELECT shard, count(*) AS n_bins,
         |  CAST(sum(bin_tokens) AS BIGINT) AS tokens,
         |  CAST($PackBudget * count(*) - sum(bin_tokens) AS BIGINT) AS waste,
         |  round(sum(bin_tokens)::DOUBLE / ($PackBudget * count(*)), 4)
         |    AS fill_frac,
         |  min(bin_tokens) AS min_bin_tokens,
         |  max(bin_tokens) AS max_bin_tokens
         |FROM bins GROUP BY 1 ORDER BY 1""".stripMargin,
    "x61_gram_coverage" -> {
      val n = CoverageGramSize
      val terms = (1 to n).map(j => s"toks[i+$j]").mkString(", ")
      s"""WITH toked AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) < $n THEN []
         |    ELSE list_transform(range(0, len(toks)-${n - 1}),
         |      i -> concat_ws(' ', $terms)) END) AS g
         |  FROM toked),
         |h AS (SELECT doc_id, ${md5h("g")} AS gh FROM g),
         |dg AS (SELECT DISTINCT doc_id, gh FROM h WHERE doc_id % $EvalModulus = 0),
         |rg AS (SELECT DISTINCT gh FROM h WHERE doc_id % $EvalModulus <> 0)
         |SELECT dg.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN rg.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_covered,
         |  round(CAST(sum(CASE WHEN rg.gh IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) / count(*)::DOUBLE, 4) AS coverage
         |FROM dg LEFT JOIN rg USING (gh)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "x18_simhash_neardups" -> simhashNearDupSql,
    "x19_stratified_sample" -> stratifiedSampleSql,
    "x37_domain_mix" -> domainMixSql,
    "x42_domain_mix_up" -> domainMixUpSql,
    "x44_temperature_mix" -> temperatureMixSql,
    "pl9_export_shards" -> exportShardsSql,
    "x51_corpus_drift" ->
      s"""WITH docs AS (
         |  SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |old AS (
         |  SELECT lang, count(*) AS n_docs_old,
         |    round(sum(n_tokens)::DOUBLE /
         |      (SELECT sum(n_tokens)::DOUBLE FROM docs WHERE doc_id % 10 <> 0), 6)
         |      AS share_old
         |  FROM docs WHERE doc_id % 10 <> 0 GROUP BY 1),
         |new AS (
         |  SELECT lang, count(*) AS n_docs_new,
         |    round(sum(n_tokens)::DOUBLE /
         |      (SELECT sum(n_tokens)::DOUBLE FROM docs), 6) AS share_new
         |  FROM docs GROUP BY 1)
         |SELECT lang,
         |  coalesce(n_docs_old, 0) AS n_docs_old,
         |  coalesce(n_docs_new, 0) AS n_docs_new,
         |  coalesce(share_old, 0) AS share_old,
         |  coalesce(share_new, 0) AS share_new,
         |  round(coalesce(share_new, 0) - coalesce(share_old, 0), 6) AS share_delta
         |FROM old FULL OUTER JOIN new USING (lang)
         |ORDER BY lang""".stripMargin,
    "x50_train_split" -> {
      val cases = SplitWeights.scanLeft(("", 0.0)) {
        case ((_, acc), (name, w)) => (name, acc + w)
      }.tail.init
        .map { case (name, t) =>
          s"WHEN ${idh("doc_id")} % 1000 < ${t * 1000} THEN '$name'" }
        .mkString(" ")
      s"""SELECT CASE $cases ELSE '${SplitWeights.last._1}' END AS split,
         |  lang, count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "x68_leakage_audit" ->
      s"""WITH RECURSIVE toked AS (
         |  SELECT doc_id AS id, $toksSql AS toks FROM documents),
         |${TextQueries.minhashPairCtes("toked")},
         |e AS (SELECT id_a, id_b FROM jac
         |  WHERE jaccard >= ${TextQueries.NearDupThreshold}),
         |sym AS (SELECT id_a AS s, id_b AS d FROM e
         |        UNION SELECT id_b AS s, id_a AS d FROM e),
         |reach AS (
         |  SELECT s AS id, s AS label FROM sym
         |  UNION
         |  SELECT sym.d AS id, r.label FROM reach r JOIN sym ON sym.s = r.id),
         |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         |naive AS (
         |  SELECT doc_id, ${splitCaseSql("doc_id")} AS split FROM documents),
         |safe AS (
         |  SELECT k.doc_id, ${splitCaseSql("k.rep")} AS split FROM (
         |    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
         |    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id) k)
         |SELECT 'naive' AS mode, count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_straddling
         |FROM e JOIN naive a ON e.id_a = a.doc_id
         |       JOIN naive b ON e.id_b = b.doc_id
         |UNION ALL
         |SELECT 'safe' AS mode, count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_straddling
         |FROM e JOIN safe a ON e.id_a = a.doc_id
         |       JOIN safe b ON e.id_b = b.doc_id
         |ORDER BY mode""".stripMargin,
    "x52_leakage_safe_splits" ->
      s"""WITH RECURSIVE toked AS (
         |  SELECT doc_id AS id, $toksSql AS toks FROM documents),
         |${TextQueries.minhashPairCtes("toked")},
         |e AS (SELECT id_a, id_b FROM jac
         |  WHERE jaccard >= ${TextQueries.NearDupThreshold}),
         |sym AS (SELECT id_a AS s, id_b AS d FROM e
         |        UNION SELECT id_b AS s, id_a AS d FROM e),
         |reach AS (
         |  SELECT s AS id, s AS label FROM sym
         |  UNION
         |  SELECT sym.d AS id, r.label FROM reach r JOIN sym ON sym.s = r.id),
         |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         |keyed AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
         |SELECT doc_id, rep, ${splitCaseSql("rep")} AS split
         |FROM keyed ORDER BY doc_id""".stripMargin,
    "x56_weighted_sample" ->
      s"""SELECT doc_id, lang, n_tokens, sample_key FROM (
         |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(pow((${idh("doc_id")} + 1)::DOUBLE / ${(1L << 60).toDouble},
         |      1.0 / len(toks)), 6) AS sample_key
         |  FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)
         |  WHERE len(toks) > 0)
         |ORDER BY sample_key DESC, doc_id LIMIT $WeightedSampleK""".stripMargin,
    "pl10_classifier_pipeline" ->
      s"""${TextQueries.qualityFeatureCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |scored AS (
         |  SELECT doc_id,
         |    round(1.0 / (1.0 + exp(-${TextQueries.scoreDotSql})), 6)
         |      AS quality_score
         |  FROM z),
         |gated AS (
         |  SELECT s.doc_id, m.n_tokens, s.quality_score
         |  FROM scored s JOIN m USING (doc_id)
         |  WHERE s.quality_score >= 0.5),
         |gsrc AS (
         |  SELECT t.doc_id AS id, t.toks
         |  FROM toked t JOIN gated g ON t.doc_id = g.doc_id),
         |${TextQueries.minhashPairCtes("gsrc")},
         |e AS (SELECT id_a, id_b FROM jac
         |  WHERE jaccard >= ${TextQueries.NearDupThreshold}),
         |sym AS (SELECT id_a AS s, id_b AS d FROM e
         |        UNION SELECT id_b AS s, id_a AS d FROM e),
         |reach AS (
         |  SELECT s AS id, s AS label FROM sym
         |  UNION
         |  SELECT sym.d AS id, r.label FROM reach r JOIN sym ON sym.s = r.id),
         |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         |keyed AS (
         |  SELECT g.doc_id, g.n_tokens, g.quality_score,
         |    coalesce(c.component, g.doc_id) AS rep
         |  FROM gated g LEFT JOIN comp c ON g.doc_id = c.id)
         |SELECT ${splitCaseSql("rep")} AS split,
         |  count(*) AS n_docs,
         |  count(DISTINCT rep) AS n_groups,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  round(avg(quality_score), 4) AS mean_score
         |FROM keyed GROUP BY 1 ORDER BY 1""".stripMargin,
    "x40_perplexity_bins" -> perplexityBinsSql,
    "x20_domain_cap" ->
      s"""WITH r AS (
         |  SELECT source, doc_id, row_number() OVER (
         |    PARTITION BY source ORDER BY ${idh("doc_id")}, doc_id) AS rk
         |  FROM documents)
         |SELECT source, doc_id FROM r WHERE rk <= $DomainQuota
         |ORDER BY 1, 2""".stripMargin,
    "x21_decontaminate" -> decontaminateSql,
    "x22_int8_quant" -> quantSql,
    "x23_train_shuffle" ->
      s"""SELECT doc_id, CAST(h % $ShuffleShards AS INT) AS shard,
         |  row_number() OVER (PARTITION BY h % $ShuffleShards ORDER BY h, doc_id) AS pos
         |FROM (SELECT doc_id, ${idh("doc_id")} AS h FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "x24_sequence_pack" ->
      s"""WITH sized AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    ${idh("doc_id")} AS h
         |  FROM documents),
         |packed AS (
         |  SELECT CAST(h % $PackShards AS INT) AS shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY h % $PackShards
         |      ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM sized)
         |SELECT shard, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
