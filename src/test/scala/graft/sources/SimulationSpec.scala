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
}
