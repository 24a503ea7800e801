package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{PipelineConfig, Pipelines}
import graft.sources.Tables

/** End-to-end smoke queries for the four composed pipelines (SURVEY.md
  * §7.1): each runs the full pipeline — clean, derive, aggregate, sink,
  * read-back where applicable — and emits an oracle-checkable aggregate of
  * the result, so a pass certifies the whole composition, not just the
  * operators it reuses.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------- pipeline 1
    // CSV analytics pipeline (pac_data_processor): clean → bin → classify →
    // report. Output: the report's category-frequency section.
    "pl1_csv_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val result = Pipelines.CsvPipeline.run(
        CoreQueries.pacFrame(t),
        PipelineConfig(outputDir = SinkQueries.sinkDir("pl1"), dryRun = true))
      result.report.categories
    }),

    // ------------------------------------------------------- pipeline 2
    // SQL extract pipeline (pac_snowflake_pipeline): generic clean → dedup
    // vs existing → batched upload (≥0.8 accounting) → reconciliation.
    "pl2_sql_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = SinkQueries.sinkDir("pl2")
      SinkQueries.clean(out)
      val result = Pipelines.SqlPipeline.run(
        s, t.customer, Seq("c_custkey"),
        PipelineConfig(outputDir = out, dryRun = false, batchSize = 512))
      result.reconciliation.agg(
        count(lit(1)).as("n_keys"),
        sum("incoming_n").as("n_incoming"),
        sum("existing_n").as("n_existing"))
        .select(col("n_keys"), col("n_incoming"), col("n_existing"),
          lit(result.report.succeeded).as("n_succeeded"),
          lit(result.report.ok).as("success_ok"))
    }),

    // ------------------------------------------------------- pipeline 3
    // Realtime tree pipeline (pac_snowflake_realtime): party pivot → brand
    // lookup (misses skipped + reported) → pac nodes → per-path write.
    "pl3_realtime_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val pac = CoreQueries.pacFrame(t)
      val mapping = pac.select("ticker").distinct()
        .filter(col("ticker").isNotNull && length(col("ticker")) === 2)
        .withColumn("brand_id", concat(lit("B_"), col("ticker")))
      val result = Pipelines.RealtimePipeline.run(pac, mapping,
        PipelineConfig(outputDir = SinkQueries.sinkDir("pl3"), dryRun = false))
      result.paths
        .agg(count(lit(1)).as("n_paths"),
          round(sum(get_json_object(col("value"), "$.pac.democrat").cast("double")), 2)
            .as("democrat_total"),
          round(sum(get_json_object(col("value"), "$.pac.republican").cast("double")), 2)
            .as("republican_total"))
        .crossJoin(result.droppedTickers.agg(count(lit(1)).as("n_dropped_tickers")))
    }),

    // ------------------------------------------------------- pipeline 4
    // Issues tree pipeline (index_align): schema discovery → normalize →
    // key by id → whole-tree write → read-back verification.
    "pl4_issues_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val result = Pipelines.IssuesPipeline.run(
        s, t.part.select("p_partkey", "p_name", "p_retailprice"), "p_partkey",
        PipelineConfig(outputDir = SinkQueries.sinkDir("pl4"), dryRun = false))
      graft.sinks.TreeSink.readWholeTree(s, result.treeFile)
        .agg(count(lit(1)).as("n"),
          round(sum(get_json_object(col("rec"), "$.p_retailprice").cast("double")), 2)
            .as("price_total"))
        .select(col("n"), col("price_total"), lit(result.verifiedCount).as("n_verified"))
    }),

    // ------------------------------------------------------- pipeline 7
    // Corpus-health report: the dashboard a nightly curation run
    // publishes, composed from the suite's own operators — corpus totals,
    // quality-gate pass rate (x2's gate), exact-dup redundancy (x0's
    // fingerprint), near-dup pair count (x4's LSH pipeline), vocabulary
    // size and hapax share (x31), language count. One (metric, value) row
    // per figure so the oracle checks each number independently. Every
    // branch is a keyed-or-global aggregate over its own scan — the
    // report costs one pass per metric family, no joins between them.
    "pl7_corpus_report" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      val nDocs = docs.agg(count(lit(1)).cast("double").as("value"))
        .select(lit("n_docs").as("metric"), col("value"))
      val nTokens = docs
        .select(graft.operators.TextOps.tokenCount(col("text")).cast("long").as("nt"))
        .agg(sum("nt").cast("double").as("value"))
        .select(lit("n_tokens").as("metric"), col("value"))
      val nLangs = docs.agg(countDistinct(col("lang")).cast("double").as("value"))
        .select(lit("n_langs").as("metric"), col("value"))
      val qRate = graft.operators.TextOps.qualityMetrics(docs, "text")
        .agg(round(avg(when(col("quality_ok"), 1.0).otherwise(0.0)), 4).as("value"))
        .select(lit("quality_ok_rate").as("metric"), col("value"))
      val dupRedundant = docs
        .select(graft.operators.TextOps.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") - 1).cast("double").as("value"))
        .select(lit("exact_dup_redundant").as("metric"), col("value"))
      val nearDups = graft.operators.TextOps
        .minhashNearDups(docs, "doc_id", "text", TextQueries.NearDupThreshold)
        .agg(count(lit(1)).cast("double").as("value"))
        .select(lit("neardup_pairs").as("metric"), col("value"))
      val vocabRows = docs
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .agg(count(lit(1)).as("types"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"))
        .select(explode(array(
          struct(lit("vocab_types").as("metric"),
            col("types").cast("double").as("value")),
          struct(lit("vocab_hapax_rate").as("metric"),
            round(col("hapax") / col("types"), 4).as("value")))).as("r"))
        .select(col("r.metric").as("metric"), col("r.value").as("value"))
      nDocs.union(nTokens).union(nLangs).union(qRate)
        .union(dupRedundant).union(nearDups).union(vocabRows)
        .orderBy("metric")
    }),

    // ------------------------------------------------------ pipeline 13
    // pl7's SCALE twin: the same nightly corpus-health report computed
    // through the sketch paths — the form that still runs at 100 TB,
    // where pl7's exact countDistinct / full vocab groupBy would shuffle
    // corpus-cardinality keys. Distinct content fingerprints via the KMV
    // sketch (a20's machinery, k longs per shard), heavy tokens via the
    // Misra–Gries two-pass (x46's — EXACT output, bounded memory), and
    // the n_chars distribution via the integer log-histogram (a24's,
    // mergeable bucket counts; the exact rank statistic rides along to
    // keep the bucket honest). Every value is BIGINT and every path
    // integer-deterministic, so the whole report hash-matches.
    "pl13_sketch_report" -> ((s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      val Agg = graft.operators.Aggregations
      val TO = graft.operators.TextOps
      val k = CoreQueries.KmvK
      val est = docs
        .select(TO.md5Hash60(TO.fingerprint(col("text"))).as("h"))
        .agg(Agg.kmvSketch(col("h"), k).as("sk"))
        .select(lit("distinct_fp_est").as("metric"), lit("").as("key"),
          Agg.kmvEstimate(col("sk"), k).as("value"))
      val heavy = Agg.heavyHitters(
          docs.select(explode(TO.tokens(col("text"))).as("token")),
          "token", TextQueries.HHCapacity)
        .select(lit("heavy_token").as("metric"), col("token").as("key"),
          col("n_occurrences").as("value"))
      val hist = Agg.logHistogramPercentiles(
        docs.select(col("n_chars").cast("double").as("value")),
        "value", Seq(50, 95))
      def histRows(valCol: String, suffix: String) = hist.select(
        concat(lit("p"), col("p").cast("string"), lit(suffix)).as("metric"),
        lit("").as("key"), col(valCol).as("value"))
      val nDocs = docs.agg(count(lit(1)).as("value"))
        .select(lit("n_docs").as("metric"), lit("").as("key"), col("value"))
      est.unionByName(heavy)
        .unionByName(histRows("bucket_lo", "_nchars_micro_lo"))
        .unionByName(histRows("exact_micro", "_nchars_micro_exact"))
        .unionByName(nDocs)
        .orderBy("metric", "key")
    })
  )

  def oracles: Map[String, String] = Map(
    "pl1_csv_pipeline" ->
      s"""WITH ${CoreQueries.pacFrameSql}
         |SELECT CASE WHEN amount IS NULL OR amount <= 0 THEN NULL
         |            WHEN amount <= 10000 THEN 'Small (<$$10K)'
         |            WHEN amount <= 100000 THEN 'Medium ($$10K-$$100K)'
         |            WHEN amount <= 500000 THEN 'Large ($$100K-$$500K)'
         |            ELSE 'Very Large (>$$500K)' END AS amount_category,
         |  count(*) AS n
         |FROM src GROUP BY 1 ORDER BY n DESC, amount_category NULLS FIRST""".stripMargin,
    "pl2_sql_pipeline" ->
      """SELECT count(*) AS n_keys, CAST(count(*) AS BIGINT) AS n_incoming,
        |  CAST(count(*) AS BIGINT) AS n_existing, count(*) AS n_succeeded,
        |  true AS success_ok
        |FROM customer""".stripMargin,
    "pl3_realtime_pipeline" ->
      s"""WITH ${CoreQueries.partyPivotSql},
         |mapped AS (SELECT * FROM agg WHERE length(ticker) = 2)
         |SELECT count(*) AS n_paths,
         |  round(sum(democrat_total), 2) AS democrat_total,
         |  round(sum(republican_total), 2) AS republican_total,
         |  (SELECT count(DISTINCT ticker) FROM agg WHERE length(ticker) <> 2)
         |    AS n_dropped_tickers
         |FROM mapped""".stripMargin,
    "pl4_issues_pipeline" ->
      """SELECT count(*) AS n, round(sum(p_retailprice), 2) AS price_total,
        |  count(*) AS n_verified
        |FROM part""".stripMargin,
    "pl7_corpus_report" -> corpusReportSql,
    "pl13_sketch_report" -> sketchReportSql
  )

  /** pl13: each sketch path's relational image — KMV = sort-limit over
    * the distinct fingerprint hashes, heavy hitters = the exact
    * integer-threshold HAVING (the MG two-pass's guaranteed output), and
    * the log-histogram = a24's bucketization on n_chars. */
  private def sketchReportSql: String = {
    val k = CoreQueries.KmvK
    val cap = TextQueries.HHCapacity
    s"""WITH h AS (
       |  SELECT DISTINCT ('0x' || substr(md5(
       |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |  ),1,15))::BIGINT AS hv FROM documents),
       |sk AS (SELECT hv FROM h ORDER BY hv LIMIT $k),
       |agg AS (SELECT max(hv) AS kth, count(*) AS ns FROM sk),
       |t AS (SELECT unnest(${TextQueries.toksSql}) AS token FROM documents),
       |tot AS (SELECT count(*) AS n FROM t),
       |vals AS (
       |  SELECT CAST(floor(n_chars * 1000000) AS BIGINT) AS v FROM documents
       |  WHERE n_chars IS NOT NULL AND n_chars > 0
       |    AND CAST(floor(n_chars * 1000000) AS BIGINT) > 0),
       |vn AS (SELECT count(*) AS n FROM vals),
       |bk AS (
       |  SELECT msb, CASE WHEN msb <= 4 THEN v ELSE v >> CAST(msb - 4 AS INT) END AS sub,
       |         count(*) AS c
       |  FROM (SELECT v, CAST(length(bin(v)) AS BIGINT) AS msb FROM vals)
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT msb, sub, CAST(SUM(c) OVER (ORDER BY msb, sub) AS BIGINT) AS cum
       |  FROM bk),
       |rk AS (
       |  SELECT CAST(p AS BIGINT) AS p, (n * p + 99) // 100 AS rank
       |  FROM (VALUES (50), (95)) pt(p), vn),
       |sel AS (
       |  SELECT p, rank, msb, sub FROM (
       |    SELECT r.p, r.rank, c.msb, c.sub,
       |      row_number() OVER (PARTITION BY r.p ORDER BY c.msb, c.sub) AS rn
       |    FROM rk r JOIN cum c ON c.cum >= r.rank)
       |  WHERE rn = 1),
       |ex AS (SELECT v, row_number() OVER (ORDER BY v) AS xr FROM vals)
       |SELECT 'distinct_fp_est' AS metric, '' AS key,
       |  CASE WHEN ns < $k THEN ns
       |       ELSE CAST(floor(${k - 1}.0 * (1152921504606846976.0 / CAST(kth AS DOUBLE))) AS BIGINT) END AS value
       |FROM agg
       |UNION ALL
       |SELECT 'heavy_token', token, CAST(count(*) AS BIGINT)
       |FROM t GROUP BY token
       |HAVING count(*) * ($cap + 1) > (SELECT n FROM tot)
       |UNION ALL
       |SELECT 'p' || CAST(p AS VARCHAR) || '_nchars_micro_lo', '',
       |  CASE WHEN msb <= 4 THEN sub ELSE sub << CAST(msb - 4 AS INT) END
       |FROM sel
       |UNION ALL
       |SELECT 'p' || CAST(p AS VARCHAR) || '_nchars_micro_exact', '', v
       |FROM sel JOIN ex ON ex.xr = sel.rank
       |UNION ALL
       |SELECT 'n_docs', '', count(*) FROM documents
       |ORDER BY metric, key""".stripMargin
  }

  /** Replays every pl7 metric from the shared generated builders (same
    * tokenization, fingerprint, quality arithmetic, and MinHash pipeline
    * as the x0/x2/x4/x31 oracles). */
  private def corpusReportSql: String = {
    val toks = TextQueries.toksSql
    s"""WITH toked AS (SELECT doc_id AS id, $toks AS toks FROM documents),
       |${TextQueries.minhashPairCtes("toked")},
       |q AS (
       |  SELECT ${TextQueries.qualityOkSql("n_tokens", "punct_ratio", "stopword_ratio")} AS ok
       |  FROM (
       |    SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
       |      ${TextQueries.punctRatioSql("text")} AS punct_ratio,
       |      ${TextQueries.stopRatioSql("toks")} AS stopword_ratio
       |    FROM (SELECT text, $toks AS toks FROM documents))),
       |fp AS (
       |  SELECT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       |    count(*) AS n
       |  FROM documents GROUP BY 1),
       |freqs AS (
       |  SELECT tok, count(*) AS f
       |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY 1),
       |vocab AS (
       |  SELECT count(*) AS types,
       |    sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS hapax
       |  FROM freqs)
       |SELECT 'exact_dup_redundant' AS metric,
       |  CAST(sum(n - 1) AS BIGINT)::DOUBLE AS value FROM fp
       |UNION ALL SELECT 'n_docs', count(*)::DOUBLE FROM documents
       |UNION ALL SELECT 'n_langs', count(DISTINCT lang)::DOUBLE FROM documents
       |UNION ALL SELECT 'n_tokens',
       |  CAST(sum(len(toks)) AS BIGINT)::DOUBLE FROM toked
       |UNION ALL SELECT 'neardup_pairs', count(*)::DOUBLE FROM jac
       |  WHERE jaccard >= ${TextQueries.NearDupThreshold}
       |UNION ALL SELECT 'quality_ok_rate',
       |  round(avg(CASE WHEN ok THEN 1.0 ELSE 0.0 END), 4) FROM q
       |UNION ALL SELECT 'vocab_hapax_rate',
       |  round(hapax / types, 4) FROM vocab
       |UNION ALL SELECT 'vocab_types', types::DOUBLE FROM vocab
       |ORDER BY metric""".stripMargin
  }
}
