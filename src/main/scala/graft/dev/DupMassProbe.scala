package graft.dev

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Evidence harness for the un-hinted dedup verification join (dev tool).
  *
  * Round-9 change: `verifyPairs` (and q114's copy) no longer force
  * `broadcast(cand)`. The contract is that AQE broadcasts the candidate
  * side when it is small (the normal "candidates ≪ corpus" regime) and
  * degrades to a shuffle join when dup mass makes the candidate set big —
  * instead of the hint forcing the whole set into executor memory exactly
  * when it is largest. This probe runs a query and reports the join
  * operators every FINAL adaptive plan actually executed (a
  * QueryExecutionListener, because the dedup queries end in
  * localCheckpoint — the interesting joins run in the checkpoint's own
  * execution, not the returned frame's) plus wall time, so SCALE.md can
  * record both regimes:
  *
  *   sbt "runMain graft.dev.GenCorpus tmp_scale/x10spam 10 30"
  *   sbt "runMain graft.dev.DupMassProbe tmp_scale/x10 q18_neardup_jaccard"
  *   sbt "runMain graft.dev.DupMassProbe tmp_scale/x10spam q18_neardup_jaccard"
  */
object DupMassProbe {
  // recurse into adaptive subtrees AND query-stage wrappers: a finalized
  // AQE plan is a tree of QueryStageExec nodes whose `children` are Nil,
  // so a plain collect stops at every stage boundary
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => Seq(other)
    }.flatten

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val query = if (args.length > 1) args(1) else "q18_neardup_jaccard"
    val s = graft.Sessions.local()
    // optional 3rd arg: comma-separated conf overrides k=v — e.g.
    // spark.sql.autoBroadcastJoinThreshold=1m to emulate the regime
    // where candidate mass is large relative to executor memory (the
    // pre-round-9 hard hint ignored this threshold entirely; the fix's
    // whole point is that the choice is threshold-governed now)
    if (args.length > 2) args(2).split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      s.conf.set(k, v)
    }
    val acc = new AtomicReference[Vector[SparkPlan]](Vector.empty)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        try {
          val f = flatten(qe.executedPlan)
          acc.updateAndGet(_ ++ f)
          println(s"[dupmass] captured execution fn=$fn nodes=${f.size}")
        } catch { case e: Throwable => println(s"[dupmass] listener error: $e") }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(query)(s, dir)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listenerManager delivers asynchronously
    val nodes = acc.get()
    val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
    val shj = nodes.count(_.isInstanceOf[ShuffledHashJoinExec])
    val exch = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    println(f"[dupmass] $query on $dir: rows=$n wall=$secs%.2f s " +
      s"joins{broadcast=$bhj sortMerge=$smj shuffledHash=$shj} shuffles=$exch")
    s.stop()
  }
}
