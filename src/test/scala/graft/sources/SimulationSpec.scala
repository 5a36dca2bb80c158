package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.FleetRules

class SimulationSpec extends SparkSpec {

  test("generator is deterministic for a fixed seed") {
    val a = Simulation.telemetry(spark, 5, 40, seed = 7).collect().sortBy(t => (t.vehicle_id, t.time.getTime))
    val b = Simulation.telemetry(spark, 5, 40, seed = 7).collect().sortBy(t => (t.vehicle_id, t.time.getTime))
    assert(a.toSeq == b.toSeq)
    val c = Simulation.telemetry(spark, 5, 40, seed = 8).collect().sortBy(t => (t.vehicle_id, t.time.getTime))
    assert(a.toSeq != c.toSeq)
  }

  test("random-walk invariants: speed clamp, battery drain, odometer monotone") {
    val t = Simulation.telemetry(spark, 4, 100, seed = 42).collect()
    assert(t.length == 400)
    assert(t.forall(r => r.current_speed_kmh >= 20.0 && r.current_speed_kmh <= 90.0))
    assert(t.forall(r => r.battery_level_pct <= 80.0 && r.battery_level_pct >= 0.0))
    assert(t.forall(r => r.speed_limit_violation == (r.current_speed_kmh > 65.0)))
    t.groupBy(_.vehicle_id).foreach { case (_, rows) =>
      val byTime = rows.sortBy(_.time.getTime)
      assert(byTime.sliding(2).forall { case Array(x, y) => y.odometer_km > x.odometer_km })
      assert(byTime.sliding(2).forall { case Array(x, y) => y.battery_level_pct <= x.battery_level_pct })
    }
  }

  test("perception and driving streams share the tick grid") {
    val p = Simulation.perception(spark, 3, 50, seed = 42).collect()
    assert(p.length == 150)
    assert(p.forall(e => e.object_distance_m >= 2.0 && e.object_distance_m <= 120.0))
    assert(p.forall(e => e.confidence >= 0.85 && e.confidence <= 1.0))
    val d = Simulation.driving(spark, 3, 50, seed = 42).collect()
    // p=0.02 per tick: some but few events
    assert(d.length < 30)
    assert(d.forall(e => Seq("intervention", "disengagement", "lane_change", "hard_brake").contains(e.event_type)))
  }

  test("generated telemetry through the alert rules reproduces rule counts") {
    val tel = Simulation.telemetry(spark, 5, 80, seed = 42).toDF()
    val alerts = FleetRules.telemetryAlerts(tel)
    val expectedSpeed = tel.filter(col("speed_limit_violation")).count()
    val expectedBattery = tel.filter(col("battery_level_pct") < 20.0).count()
    val byType = alerts.groupBy("alert_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("Speed Violation", 0L) == expectedSpeed)
    assert(byType.getOrElse("Low Battery", 0L) == expectedBattery)
    assert(expectedSpeed > 0, "seeded walk should produce some violations")
  }

  test("explicit-state LCG is bit-identical to java.util.Random") {
    for (seed <- Seq(0L, 42L, -9999L, 1000003L * 7 + 3)) {
      val jr = new java.util.Random(seed)
      var st = Simulation.Lcg.seeded(seed)
      for (_ <- 0 until 500) {
        val (s1, d) = Simulation.Lcg.nextDouble(st)
        assert(d == jr.nextDouble()); st = s1
        for (bound <- Seq(3, 4, 6, 100)) {
          val (s2, v) = Simulation.Lcg.nextInt(st, bound)
          assert(v == jr.nextInt(bound)); st = s2
        }
      }
    }
  }

  test("streaming walk == batch walk across micro-batches and a restart") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = tmpDir("simstream") + "/pulses"
    val out = tmpDir("simstream") + "/out"
    val ckpt = tmpDir("simstream") + "/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writePulses(name: String, ticks: Seq[Int]): Unit = {
      val lines = for (v <- 1 to 3; t <- ticks) yield s"""{"vehicle_id":$v,"tick":$t}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        lines.mkString("\n").getBytes)
    }
    def drain(): Unit = {
      val pulses = spark.readStream
        .schema("vehicle_id INT, tick INT")
        .option("maxFilesPerTrigger", 1)
        .json(in).as[Simulation.TickPulse]
      val q = Simulation.streamingTicks(pulses, seed = 7L)
        .map(_.telemetry)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // two files -> two micro-batches; then a restart with more pulses,
    // including a replayed tick (no-op) and a gap (pulse 9 backfills 6-9)
    writePulses("a.json", 0 until 3)
    writePulses("b.json", 3 until 6)
    drain()
    writePulses("c.json", Seq(5, 9))
    drain()
    val streamed = spark.read.parquet(out).as[graft.model.Telemetry]
      .collect().sortBy(t => (t.vehicle_id, t.time.getTime))
    val batch = Simulation.telemetry(spark, 3, 10, seed = 7L)
      .collect().sortBy(t => (t.vehicle_id, t.time.getTime))
    assert(streamed.toSeq == batch.toSeq)
  }
}
