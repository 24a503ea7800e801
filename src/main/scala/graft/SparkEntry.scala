package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, CurationQueries, MediaQueries, PipelineQueries, RetrievalQueries, SinkQueries, TextQueries, VectorQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every oracle-checked query the engine exposes. Each entry in
  * [[queries]] has a matching ANSI-SQL oracle in [[oracleSql]] (DuckDB
  * dialect) unless the operator is not SQL-expressible, in which case the
  * driver records a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline report — "top companies by total
    * contributions" (pac_data_processor.py:68-71,346-349) — mapped onto the
    * testdata star schema: top-10 nations by discounted lineitem revenue.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("join_q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ WindowQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ MediaQueries.queries ++
      CurationQueries.queries ++ RetrievalQueries.queries ++
      SinkQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ WindowQueries.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++ MediaQueries.oracles ++
      CurationQueries.oracles ++ RetrievalQueries.oracles ++
      SinkQueries.oracles ++ PipelineQueries.oracles
}
