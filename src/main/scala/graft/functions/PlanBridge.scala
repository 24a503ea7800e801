// Spark keeps Dataset.ofRows and the experimental-methods accessors
// private[sql] / classic-typed, so a library injecting a custom
// LogicalPlan + SparkStrategy needs this one-file bridge inside the sql
// namespace (same pattern as ColumnBridge). No Spark internals are
// modified — the methods below only re-export constructors for graft.plans.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

object PlanBridge {

  /** Analyze + wrap a logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently register an extra planner strategy on a live session
    * (the documented `spark.experimental.extraStrategies` hook — reaches
    * sessions built without `withExtensions`, e.g. a user's existing
    * session). Registration happens lazily at query-build time on a
    * shared session, so the check-then-append is synchronized on the
    * ExperimentalMethods instance: two threads building queries
    * concurrently must not duplicate the strategy or lose a concurrent
    * registration. */
  def registerStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
