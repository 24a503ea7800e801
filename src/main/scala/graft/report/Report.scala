package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Aggregations

/** Report layer — the `generate_analysis_report` bundle
  * (pac_data_processor.py:334-360): global totals (A6-A9), top-k companies
  * (T2), category frequencies (A5), per-cycle breakdown (A3/T3).
  *
  * Each section is a lazy DataFrame; nothing materializes until the caller
  * acts. All sections are single-shuffle aggregations over small key
  * cardinalities — at 100 TB the report costs one pass per section (or one
  * pass total if the caller caches the cleaned input).
  */
object Report {

  final case class AnalysisReport(
      summary: DataFrame,       // 1 row: n_records, n_companies, total, avg
      topCompanies: DataFrame,  // top-10 by total amount
      categories: DataFrame,    // frequency per amount category
      cycles: DataFrame)        // per-cycle total + count, sorted

  def analysisReport(df: DataFrame, ticker: String, cycle: String,
                     amount: String, category: Column): AnalysisReport =
    AnalysisReport(
      summary = summary(df, ticker, amount),
      topCompanies = Aggregations.topKGroups(df, ticker, amount, 10),
      categories = df.select(category.as("amount_category"))
        .transform(d => Aggregations.freqCount(d, "amount_category")),
      cycles = Aggregations.cycleBreakdown(df, cycle, amount))

  /** One-row dataset summary (pac_data_processor.py:20-23,342-345). */
  def summary(df: DataFrame, ticker: String, amount: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_records"),
      countDistinct(col(ticker)).as("n_companies"),
      round(sum(col(amount)), 2).as("total_amount"),
      round(avg(col(amount)), 2).as("avg_amount"))
}
