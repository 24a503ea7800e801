package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal shared by the Explain audit tool and the plan
  * tests — one definition of "all nodes", descending into AQE wrappers, so
  * the two can never count different node sets. */
object PlanNodes {

  /** Flatten a plan, descending into AQE query stages and adaptive roots. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => p +: allNodes(q.plan)
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** Execute the frame and return its AQE-final physical plan. */
  def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
}
