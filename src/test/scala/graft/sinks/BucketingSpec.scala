package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Scale techniques that only show up in the physical plan: bucketed
  * co-located joins (no shuffle) and day-partition pruning (no full scan).
  * Asserting on the plan text pins them against regressions.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // warehouse.dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally
    val d = sf0001
    Tables.orders(spark, d).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, d).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("customer_b")
        .join(spark.table("orders_b"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        "bucketed build side must not re-shuffle")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        "bucketed probe side must not re-shuffle")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Catalyst's InjectRuntimeFilter builds a bloom filter from the
    // filtered (creation) side and pushes might_contain onto the probe
    // side's scan — at 100 TB this is the difference between shuffling
    // the full fact table and shuffling the ~matching fraction. The size
    // gates are tuned for real tables (creation side must be SMALL
    // enough to build a filter from, probe scan LARGE enough to be worth
    // filtering); relax the probe-side minimum so the tiny test data
    // takes the same code path the cluster would.
    val d = sf0001
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side, plan:\n$plan")
      assert(joined.count() == 1)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("day-partitioned parquet prunes partitions under a date predicate") {
    val dir = tmpDir("prune") + "/t"
    val tel = graft.sources.Simulation.telemetry(spark, 2, 10, seed = 1).toDF()
    Sinks.writePartitioned(tel, dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("p_date") === to_date(lit("2023-11-14")))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    assert(pruned.count() == 20)
    val none = spark.read.parquet(dir)
      .filter(col("p_date") === to_date(lit("1999-01-01")))
    assert(none.count() == 0)
  }

  test("P5 time-window metric query prunes day partitions on the store") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpDir("prune_p5") + "/driving"
    // three days of driving events -> three p_date partition directories
    val day0 = java.sql.Timestamp.valueOf("2023-11-14 12:00:00").getTime
    (0 until 3).foreach { d =>
      val drv = graft.sources.Simulation
        .driving(spark, 4, 400, seed = d, startMillis = day0 + d * 86400000L).toDF()
      Sinks.writePartitioned(drv, dir)
    }
    val store = spark.read.parquet(dir)
    assert(store.select("p_date").distinct().count() == 3)
    // the P5 shape: 24 h lookback as of the last day's data
    val asOf = lit("2023-11-16 12:06:40").cast("timestamp")
    val q = graft.metrics.FleetMetrics.interventionsPerVehicle(store, hours = 24, asOf = asOf)
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // root whose stages aren't materialized until execution
    val scans = q.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "p_date")),
      s"time window must derive a p_date partition filter, got ${scan.partitionFilters}")
    // 24 h back from day-2 noon reaches into day 1: exactly 2 of 3 read
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned-in day partitions, got ${scan.selectedPartitions.partitionCount}")
    // and the answer matches the unpartitioned (pruning-free) evaluation
    val flat = store.drop("p_date")
    val expected = graft.metrics.FleetMetrics
      .interventionsPerVehicle(flat, hours = 24, asOf = asOf)
    assert(q.collect().toSeq == expected.collect().toSeq)
  }
}
