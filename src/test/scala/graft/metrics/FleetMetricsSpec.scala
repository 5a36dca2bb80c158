package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.FleetRules
import graft.sources.Simulation

/** The nine reference metric functions over a seeded simulated fleet
  * (the reference has no tests of its own — SURVEY §5; invariants here
  * pin the semantics its SQL encodes).
  */
class FleetMetricsSpec extends SparkSpec {

  private lazy val tel = Simulation.telemetry(spark, 6, 200, seed = 42).toDF().cache()
  private lazy val drv = Simulation.driving(spark, 6, 200, seed = 42).toDF().cache()
  private lazy val per = Simulation.perception(spark, 6, 200, seed = 42).toDF().cache()
  // simulated data starts at epoch 1.7e9 ms; pick an asOf just past it
  private lazy val asOf = lit("2023-11-14 23:40:00").cast("timestamp")

  test("interventionsPerVehicle counts match direct filters; vehicle filter composes") {
    val m = FleetMetrics.interventionsPerVehicle(drv, hours = 24, asOf = asOf)
    val total = m.agg(sum("event_count")).head().getLong(0)
    assert(total == drv.count(), "24h window covers the whole 200s walk")
    val one = FleetMetrics.interventionsPerVehicle(drv, hours = 24,
      vehicleId = Some(1), asOf = asOf)
    assert(one.select("vehicle_id").distinct().count() <= 1)
  }

  test("latestTelemetry returns exactly the newest row per vehicle") {
    val m = FleetMetrics.latestTelemetry(tel)
    assert(m.count() == 6)
    val maxTs = tel.groupBy("vehicle_id").agg(max("time").as("mt"))
    assert(m.join(maxTs, "vehicle_id").filter(col("time") =!= col("mt")).count() == 0)
  }

  test("kmPerIntervention: km >= 0, ratio null iff no interventions") {
    val m = FleetMetrics.kmPerIntervention(tel, drv, asOf = asOf)
    assert(m.filter(col("km_driven") < 0).count() == 0)
    assert(m.filter(col("interventions") === 0 &&
      col("km_per_intervention").isNotNull).count() == 0)
    assert(m.filter(col("interventions") > 0 &&
      col("km_per_intervention").isNull).count() == 0)
  }

  test("rates per 1000 km are consistent with their inputs") {
    val m = FleetMetrics.interventionRatePer1000Km(tel, drv, asOf = asOf)
    val bad = m.filter(col("km_driven") > 0 &&
      abs(col("interventions_per_1000km") -
        col("interventions") / col("km_driven") * 1000.0) > 1e-9)
    assert(bad.count() == 0)
    val expected = drv.filter(col("event_type") === "intervention")
      .groupBy("vehicle_id").count()
    val joined = m.join(expected, Seq("vehicle_id"), "left")
    assert(joined.filter(coalesce(col("count"), lit(0L)) =!= col("interventions")).count() == 0)
  }

  test("fleet summary equals the sum of per-vehicle parts") {
    val m = FleetMetrics.fleetSelfDrivingSummary(tel, drv, asOf = asOf).head()
    val n = drv.filter(col("event_type").isin("intervention", "disengagement")).count()
    assert(m.getAs[Long]("total_interventions_plus_disengagements") == n)
    assert(m.getAs[Double]("total_km_driven") > 0)
    if (n > 0)
      assert(math.abs(m.getAs[Double]("fleet_avg_km_per_intervention") -
        m.getAs[Double]("total_km_driven") / n) < 1e-9)
  }

  test("autopilot engagement pct in [0,100]; simulation is always engaged") {
    val m = FleetMetrics.autopilotEngagementRate(tel, asOf = asOf)
    assert(m.filter(col("engagement_pct") < 0 || col("engagement_pct") > 100).count() == 0)
    assert(m.filter(col("engagement_pct") =!= 100.0).count() == 0)
  }

  test("perceptionSummary ordered count-desc within vehicle") {
    val m = FleetMetrics.perceptionSummary(per, asOf = asOf).collect()
    m.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val counts = rows.map(_.getLong(2))
      assert(counts.sameElements(counts.sortBy(-_)))
    }
  }

  test("alertsSummary: top-N of the rule-engine output, newest first") {
    val alerts = FleetRules.telemetryAlerts(tel)
    val m = FleetMetrics.alertsSummary(alerts, limit = 10).collect()
    assert(m.length == math.min(10, alerts.count()).toInt)
    val ts = m.map(_.getTimestamp(0).getTime)
    assert(ts.sameElements(ts.sortBy(-_)))
  }

  test("distinctVehicleIds enumerates the fleet") {
    assert(FleetMetrics.distinctVehicleIds(tel).collect().map(_.getInt(0)).toSeq ==
      (1 to 6))
  }

  test("lookback window actually excludes old data") {
    // asOf far in the future: a 24h window sees nothing from 2023
    val farFuture = lit("2030-01-01 00:00:00").cast("timestamp")
    assert(FleetMetrics.interventionsPerVehicle(drv, hours = 24, asOf = farFuture).count() == 0)
    assert(FleetMetrics.autopilotEngagementRate(tel, hours = 24, asOf = farFuture).count() == 0)
  }
}
