package graft.dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sinks.Sinks

/** Measured evidence for the Z-order layout's pruning claim (dev tool,
  * SCALE.md): generate an n-row synthetic events-like table
  * (seed-pinned, [[graft.functions.expressions.splitmix]]-free — plain
  * xxhash64 of the row id), lay it out (a) on the Morton curve of
  * (user_id, value) and (b) range-sorted by user_id alone (the best
  * one-dimensional layout parquet row-group stats can exploit), then
  * run the same selective two-column box on both and report wall time
  * and files read. Usage:
  *   sbt "runMain graft.dev.ZOrderBench 10000000 /root/repo/tmp_scale/zorder"
  */
object ZOrderBench {

  private def filesRead(df: DataFrame): Long = {
    df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
      .map(_.selectedPartitions.totalNumberOfFiles).sum
  }

  private def time[T](label: String, reps: Int)(f: => (Long, Long)): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val (rows, files) = f
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, rows, files)
    }
    val best = times.minBy(_._1)
    println(f"[zbench] $label%-28s min=${best._1}%7.3f s  rows=${best._2}  files=${best._3}  (all: ${times.map(t => f"${t._1}%.2f").mkString(" ")})")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val root = args.lift(1).getOrElse("/root/repo/tmp_scale/zorder")
    val s = Sessions.local()
    import s.implicits._
    val ev = s.range(n).select(
      $"id".as("event_id"),
      pmod(xxhash64($"id"), lit(1500L)).as("user_id"),
      (pmod(xxhash64($"id" + 1000000007L), lit(100000L)).cast("double") / 200.0)
        .as("value"))
    val zdir = s"$root/z"
    val zcdir = s"$root/zclustered"
    val flatdir = s"$root/flat"
    graft.sinks.ZOrder.writeZOrdered(ev, "user_id", "value", zdir, bits = 5)
    // the clustered sibling: quantile-bucketed curve, range-disjoint
    // sorted FILES, no reader machinery — per-column pushdown does the
    // skipping against tightened min/max stats
    Sinks.writeZOrdered(ev, zcdir, Seq("user_id", "value"), nFiles = 256)
    // 1-D baseline: range-partitioned + sorted by user_id, so parquet
    // row-group stats prune the user dimension as well as 1-D can
    ev.repartitionByRange(32, $"user_id").sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(flatdir)
    // box A: ~10% of users x ~10% of values — the 1-D layout prunes its
    // own dimension here, the interesting margin is the second one.
    // box B: ALL users x 2% of values — the adversarial case for any
    // 1-D layout (nothing to prune on its sort key; z still prunes).
    val boxes = Seq(
      ("A 10%x10%", (200.0, 350.0, 100.0, 150.0)),
      ("B all-users x 2%", (0.0, 1500.0, 100.0, 110.0)))
    for ((bn, (uLo, uHi, vLo, vHi)) <- boxes) {
      time(s"$bn z-partitioned", 5) {
        val q = graft.sinks.ZOrder.boxQuery(s, zdir, uLo, uHi, vLo, vHi)
        (q.count(), filesRead(q))
      }
      time(s"$bn z-clustered", 5) {
        val q = s.read.parquet(zcdir)
          .filter($"user_id".between(uLo, uHi) && $"value".between(vLo, vHi))
        (q.count(), filesRead(q))
      }
      time(s"$bn 1d-sorted", 5) {
        val q = s.read.parquet(flatdir)
          .filter($"user_id".between(uLo, uHi) && $"value".between(vLo, vHi))
        (q.count(), filesRead(q))
      }
    }
    s.stop()
  }
}
