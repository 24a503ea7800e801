package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftCache
import graft.operators.{Aggregations, Cleaning, Dedup, Derivations}
import graft.report.Report
import graft.sinks.{DocumentSink, TreeSink}
import graft.sources.Tables

/** The four end-to-end pipelines (SURVEY.md §3, §7.1), config-driven — the
  * reference's interactive prompts (batch size, dry-run confirmation,
  * query override) become [[PipelineConfig]] fields, with the reference's
  * dry-run-by-default preserved (SURVEY.md §7.4(7)).
  *
  * Each pipeline is a pure composition of the operator layer; nothing here
  * introduces new semantics. Every stage stays lazy until the sink (or the
  * caller) materializes, so Catalyst optimizes across stage boundaries —
  * the reference's eager per-statement pandas execution has no analogue.
  */
final case class PipelineConfig(
    outputDir: String,
    dryRun: Boolean = true,
    batchSize: Int = 1000,
    previewRows: Int = 5)

object Pipelines {

  /** pac_data_processor.py:362-401 — CSV analytics + document upload:
    * clean → derive (bins, company type, metadata) → report → prepare docs
    * → dedup within batch → document sink (dry-run default). */
  object CsvPipeline {
    final case class Result(enriched: DataFrame, report: Report.AnalysisReport,
                            documents: DataFrame)

    def run(contributions: DataFrame, cfg: PipelineConfig): Result = {
      val cleaned = contributions.transform(Cleaning.cleanGeneric)
      // `enriched` feeds the report sections AND the document-prepare/dedup
      // leg (whose dry-run preview executes eagerly) — persist so the
      // scan + clean + derivations run once across the pipeline's legs.
      val enriched = GraftCache.persist(cleaned
        .withColumn("amount_category", Derivations.amountCategory(col("amount")))
        .withColumn("company_type", Derivations.companyType(col("ticker"))))
      val report = Report.analysisReport(
        enriched, "ticker", "cycle", "amount", col("amount_category"))
      val docs = DocumentSink.prepare(
        Dedup.keepFirst(enriched,
          Seq("ticker", "cycle", "committee_name", "amount"),
          Seq(col("ticker"), col("cycle"))),
        lit("pac_contributions"),
        Cleaning.deterministicId(col("ticker"), col("cycle"), col("committee_name"),
          col("amount")))
      if (cfg.dryRun)
        DocumentSink.dryRun(docs, Seq(col("document_id")), cfg.previewRows).collect()
      else DocumentSink.write(docs, s"${cfg.outputDir}/pac_contributions")
      Result(enriched, report, docs)
    }
  }

  /** pac_snowflake_pipeline.py:367-445 — SQL extract → generic clean →
    * dedup vs existing sink → batched upload with ≥0.8 success accounting
    * → count reconciliation. */
  object SqlPipeline {
    final case class Result(cleaned: DataFrame, report: DocumentSink.UploadReport,
                            reconciliation: DataFrame)

    def run(spark: SparkSession, source: DataFrame, idCols: Seq[String],
            cfg: PipelineConfig): Result = {
      val cleaned = source.transform(Cleaning.cleanGeneric)
      // `docs` is consumed twice — the anti-join dedup AND the final
      // reconciliation — so persist it for the pipeline's scope; without
      // this the source scan + clean + id derivation re-executes per leg.
      val docs = GraftCache.persist(DocumentSink.prepare(cleaned, lit("records"),
        Cleaning.deterministicId(idCols.map(col): _*)))
      val sinkDir = s"${cfg.outputDir}/records"
      // Dedup vs existing sink output (idempotent re-run, :338-346). Only a
      // genuinely ABSENT sink counts as empty — read failures (permissions,
      // corrupt JSON) must propagate, or the anti-join silently re-uploads
      // everything the dedup exists to prevent.
      val sinkPath = new org.apache.hadoop.fs.Path(sinkDir)
      val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // "Exists" must mean has-files: a failed first upload can leave the
      // directory created but empty, and schema inference over an empty
      // dir throws at planning time. Listing is RECURSIVE because sinks may
      // use a partitioned layout (data files under subdirectories with only
      // _SUCCESS at the top level) — a top-level-only check would misread
      // such a sink as empty and silently skip the dedup.
      val hasSinkData = fs.exists(sinkPath) && {
        val it = fs.listFiles(sinkPath, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.getLen > 0 && !f.getPath.getName.startsWith("_")
        }
        found
      }
      val existing =
        if (hasSinkData) Tables.documentSinkScan(spark, sinkDir).select("document_id")
        else spark.emptyDataFrame.withColumn("document_id", lit(""))
      val fresh = Dedup.antiJoinExisting(docs, existing, Seq("document_id"))
      val report =
        if (cfg.dryRun) {
          DocumentSink.dryRun(fresh, Seq(col("document_id")), cfg.previewRows).collect()
          DocumentSink.UploadReport(0, 0)
        } else DocumentSink.writeBatched(fresh,
          new DocumentSink.LocalJsonBatchWriter(sinkDir), cfg.batchSize)
      val uploaded =
        if (cfg.dryRun) spark.emptyDataFrame.withColumn("document_id", lit(""))
        else Tables.documentSinkScan(spark, sinkDir).select("document_id")
      val recon = Aggregations.reconcile(
        docs.select("document_id"), uploaded.select("document_id"), "document_id")
      Result(cleaned, report, recon)
    }
  }

  /** pac_snowflake_realtime.py:223-290 — party pivot → ticker→brand lookup
    * join (misses skipped) → nested pac node → per-path tree write. */
  object RealtimePipeline {
    final case class Result(aggregated: DataFrame, paths: DataFrame,
                            droppedTickers: DataFrame)

    def run(pac: DataFrame, brandMapping: DataFrame, cfg: PipelineConfig): Result = {
      // The pivot feeds BOTH the brand join (→ tree paths) and the
      // dropped-keys anti-join, and callers typically aggregate the result
      // again — persist so the scan + pivot executes once, not 2-3×.
      val agg = GraftCache.persist(Aggregations.partyPivot(
        pac, "ticker", "cycle", "committee_name", "amount"))
      val joined = Dedup.lookupJoin(agg, brandMapping, "ticker")
      val dropped = Dedup.droppedKeys(agg, brandMapping, "ticker")
      val paths = TreeSink.preparePaths(
        joined,
        Seq(lit("brands"), col("brand_id"), lit("records"), col("cycle"), lit("pac")),
        TreeSink.pacNode(round(col("democrat_total"), 2), round(col("republican_total"), 2)))
      if (!cfg.dryRun) TreeSink.writePerPath(paths, s"${cfg.outputDir}/brands")
      Result(agg, paths, dropped)
    }
  }

  /** index_align_to_firebase.py:261-332 — schema discovery → normalize →
    * key by id → whole-tree write → read-back count verification. */
  object IssuesPipeline {
    final case class Result(normalized: DataFrame, treeFile: String, verifiedCount: Long)

    def run(spark: SparkSession, issues: DataFrame, idCol: String,
            cfg: PipelineConfig): Result = {
      val columns = Tables.discoverColumns(issues) // S5: schema discovery
      require(columns.map(_.toLowerCase).contains(idCol.toLowerCase),
        s"id column $idCol not in discovered schema $columns")
      val normalized = issues.transform(Cleaning.cleanGeneric)
      val treeFile = s"${cfg.outputDir}/issues.json"
      val verified =
        if (cfg.dryRun) 0L
        else {
          TreeSink.writeWholeTree(normalized, idCol.toLowerCase, treeFile)
          TreeSink.readWholeTree(spark, treeFile).count() // read-back verification
        }
      Result(normalized, treeFile, verified)
    }
  }
}
