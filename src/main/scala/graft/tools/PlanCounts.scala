package graft.tools

import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

/** Structural counts over an executed plan TREE. `collect` traverses plan
  * children only — it does NOT descend into an InMemoryRelation's cached
  * build plan (which `toString` prints as inner children) — so these counts
  * reflect what the query executes at runtime: a shared memo frame costs
  * one cached read here, not its build plan's exchanges. Shared by
  * PlanAudit (PLANS.md) and the plan-shape regression specs.
  */
case class PlanCounts(joins: Seq[String], shuffles: Int, broadcasts: Int,
                      codegenSpans: Int, cachedReads: Int,
                      topk: Seq[String], pushedFilters: Seq[String]) {
  def exchanges: Int = shuffles + broadcasts
}

object PlanCounts {
  def apply(plan: SparkPlan): PlanCounts = {
    val joins = plan.collect {
      case j: BaseJoinExec => s"${j.nodeName} ${j.joinType}"
    }.distinct
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
    val broadcasts = plan.collect { case e: BroadcastExchangeExec => e }.size
    val codegen = plan.collect {
      case w: WholeStageCodegenExec => w.codegenStageId
    }.distinct.size
    val cached = plan.collect { case s: InMemoryTableScanExec => s }.size
    val topk = plan.collect {
      case w: WindowGroupLimitExec => s"WindowGroupLimit ${w.rankLikeFunction.prettyName}"
      case _: TakeOrderedAndProjectExec => "TakeOrderedAndProject"
      case _: GlobalLimitExec => "GlobalLimit"
    }.distinct
    val pushed = plan.collect {
      case s: FileSourceScanExec =>
        s.metadata.get("PushedFilters").map(p => s"PushedFilters: $p")
    }.flatten.distinct
    PlanCounts(joins, shuffles, broadcasts, codegen, cached, topk, pushed)
  }
}
