package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Blanket plan-invariant audit over EVERY declared query: the
  * scale-killer shapes must never appear, in any query, at any point in
  * the round — institutionalizing the per-round manual plan audits.
  *
  * What is rejected: `CartesianProductExec` — a non-broadcast cross
  * product materializes |L|×|R| rows through the shuffle and is never
  * the right plan at 100 TB. (`BroadcastNestedLoopJoin` is NOT rejected:
  * the engine's deliberate 1-row/bounded-frame `crossJoin(broadcast(…))`
  * scalar-attach pattern plans as BNLJ and is O(|big side|).)
  *
  * Construction at sf0.001 EXECUTES eager segments (localCheckpoint
  * materializations, IndexCache artifact builds) — that is fine here:
  * the suite shares the per-JVM IndexCache with the other specs, and the
  * audit wants the plan Spark would actually run, not a hypothetical.
  * Known blind spot: those eager segments are REPLACED by LogicalRDD
  * scans in the audited plan, so a cartesian inside a localCheckpointed
  * intermediate or an index build would not surface here — the
  * per-query `.explain` audits (SCALE.md / VERDICT plan tables) remain
  * the check for eager legs; this spec pins everything Spark plans at
  * action time.
  */
class PlanAuditSpec extends SparkSpec {

  /** One linear pass: every node (subqueries included), plus each AQE
    * node's initialPlan expanded the same way. */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nodes = p.collectWithSubqueries { case n => n }
    nodes ++ nodes.collect { case a: AdaptiveSparkPlanExec => a.initialPlan }
      .flatMap(collectAll)
  }

  test("no declared query plans a cartesian product at sf0.001") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan
        val cart = collectAll(plan).collect { case c: CartesianProductExec => c }
        if (cart.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
