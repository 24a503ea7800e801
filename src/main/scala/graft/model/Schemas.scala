package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed core of the PAC domain (SURVEY.md §1.3, §7.1): case classes for
  * the fixed-schema paths, used where compile-time field safety helps
  * (pipelines over the known contribution shape). Generic/dynamic-schema
  * paths stay `DataFrame` by design — the reference's name-pattern cleaning
  * is inherently schema-dynamic.
  */
object Schemas {

  /** Contributions row (test_snowflake_pipeline.py:160-167;
    * pac_snowflake_pipeline.py:392-394). */
  final case class Contribution(
      ticker: String,
      cycle: Long,
      committee_name: String,
      amount: Double)

  /** Summary row (pac_data_processor.py:98; check_duplicates.py:92). */
  final case class SummaryRow(
      ticker: String,
      election_cycle: Long,
      entity_type_name: String,
      receipt_amount: Double)

  /** Keyed document destined for a document store (SURVEY.md §1.1). */
  final case class FirebaseRecord(
      collection: String,
      document_id: String,
      data: String)

  /** The realtime pipeline's leaf node (db_restructure_diagram.txt:26-43). */
  final case class PacNode(democrat: Double, republican: Double)

  /** Typed view of a contribution-shaped frame (columns ticker, cycle,
    * committee_name, amount — the [[graft.queries.CoreQueries.pacFrame]]
    * shape). Null tickers become empty strings at the typed boundary, the
    * same collapse the reference applies via fillna('')
    * (pac_snowflake_realtime.py:85). */
  def asContributions(spark: SparkSession, df: DataFrame): Dataset[Contribution] = {
    import spark.implicits._
    df.na.fill("", Seq("ticker")).as[Contribution]
  }
}
