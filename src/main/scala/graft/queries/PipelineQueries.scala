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
        |FROM part""".stripMargin
  )
}
