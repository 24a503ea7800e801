package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftCache

/** Event-analytics operators over an event log (engine extension): ordered
  * funnel analysis and cohort retention — the two workhorse product-analytics
  * queries every OLAP engine ends up serving. Both are composed purely from
  * keyed aggregations and equi-joins on the user key, so at cluster scale the
  * only shuffles are hash-partitions on `userCol` and the per-user frames
  * (≤ |distinct users| rows, strictly shrinking per funnel step) stay
  * broadcast-eligible for AQE.
  */
object EventAnalytics {

  /** Per-user first-completion times of an ordered funnel: step i+1 counts
    * only events STRICTLY LATER than the user's step-i completion time
    * (min-completion semantics: each step binds to the earliest event that
    * qualifies, the standard ordered-funnel definition).
    *
    * Returns one frame per step: (userCol, __t = completion ts). Each frame
    * is registered with [[GraftCache]] — frame i is read twice (its own
    * step count + step i+1's lineage), and without the persist the step-k
    * frame would recompute the whole k-step prefix per consumer. Callers
    * release via `GraftCache.release()` after consuming.
    *
    * Scale shape: one filtered keyed agg per step plus one equi-join per
    * step against a ≤|users| frame — no windows over the raw event log, no
    * per-user event collection, so per-user event skew never materializes
    * a large state row. */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(!events.columns.contains("__t") && !events.columns.contains("__u") &&
      !events.columns.contains("__tp"),
      "column names __t/__u/__tp are reserved by funnelSteps")
    val first = GraftCache.persist(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t")))
    steps.tail.foldLeft(Vector(first)) { (acc, step) =>
      val prev = acc.last.select(col(userCol).as("__u"), col("__t").as("__tp"))
      val next = GraftCache.persist(
        events.filter(col(typeCol) === step)
          .join(prev, col(userCol) === col("__u") && col(tsCol) > col("__tp"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t")))
      acc :+ next
    }
  }

  /** Funnel step counts: (step, step_type, users) — users is the number of
    * distinct users whose events complete the first `i` steps in order. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame =
    funnelSteps(events, userCol, typeCol, tsCol, steps).zip(steps).zipWithIndex
      .map { case ((stepDf, stepType), i) =>
        // The step frame is one row per qualifying user, so count(*) IS
        // the distinct-user count — no second distinct aggregation.
        stepDf.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(stepType).as("step_type"),
            col("users"))
      }
      .reduce(_ unionByName _)

  /** Cohort retention: cohort = the user's first-activity day, and for every
    * (cohort_day, day_offset) the number of distinct cohort users active
    * that day. Two keyed aggregations plus one equi-join on `userCol`
    * against the ≤|users| cohort frame (AQE broadcasts it when small); the
    * final distinct-count is a single-column exact distinct, which Spark
    * plans as two-stage partial aggregation — no Expand, no window. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    require(!events.columns.contains("cohort_day") && !events.columns.contains("__d"),
      "column names cohort_day/__d are reserved by retention")
    val cohorts = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(cohorts, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("__d"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }
}
