package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit laws for the distributed backward as-of join. */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof join: backward pick, >= at equal times, null when no prior ref") {
    import spark.implicits._
    val ref = Seq(
      (1L, ts(10), 100L, "a"),
      (1L, ts(20), 101L, "b"),
      (1L, ts(40), 102L, "c"),
      (2L, ts(50), 200L, "x"))
      .toDF("k", "t", "rid", "rv")
    val probe = Seq(
      (1L, ts(5), 900L),   // before any ref -> null
      (1L, ts(10), 901L),  // equal time -> matches rid 100 (>= semantics)
      (1L, ts(25), 902L),  // between -> rid 101
      (1L, ts(99), 903L),  // after all -> rid 102
      (2L, ts(49), 904L),  // other key, before its only ref -> null
      (3L, ts(60), 905L))  // key with no refs at all -> null
      .toDF("k", "t", "pid")
    val out = AsofJoin.asofJoin(probe, ref, "k", "t")
      .select($"pid", $"asof_rid", $"asof_rv")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)))).toSet
    assert(out == Set(
      (900L, None, None),
      (901L, Some(100L), Some("a")),
      (902L, Some(101L), Some("b")),
      (903L, Some(102L), Some("c")),
      (904L, None, None),
      (905L, None, None)))
  }

  test("asof join == per-row naive reference on a random frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val refRows = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(1000)), i.toLong))
      // operator contract: (key, time) unique on the ref side
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val probeRows = (1 to 200).map(i =>
      (rnd.nextInt(12).toLong, ts(rnd.nextInt(1100)), 10000L + i))
    val out = AsofJoin.asofJoin(
      probeRows.toDF("k", "t", "pid"), refRows.toSeq.toDF("k", "t", "rid"),
      "k", "t")
      .select($"pid", $"asof_rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val naive = probeRows.map { case (k, t, pid) =>
      pid -> refRows.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap
    assert(out == naive)
    assert(out.values.exists(_.nonEmpty) && out.values.exists(_.isEmpty))
  }

  test("asof join plan: one exchange per side, no broadcast of the big side") {
    import spark.implicits._
    val ref = (1 to 100).map(i => (i.toLong % 5, ts(i), i.toLong)).toDF("k", "t", "rid")
    val probe = (1 to 100).map(i => (i.toLong % 7, ts(i), i.toLong)).toDF("k", "t", "pid")
    val plan = AsofJoin.asofJoin(probe, ref, "k", "t")
      .queryExecution.executedPlan.toString
    // union -> one hash exchange on the key -> window; no join operator
    assert(plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "as-of must not decay to a relational join")
  }
}
