package graft.rules

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.{PerceptionEvent, Telemetry, Thresholds}

class RulesSpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def tel(id: Int, speed: Double, violation: Boolean, battery: Double) =
    Telemetry(ts(id), id, speed, violation, 37.0, -122.0, battery,
      battery * 5.2, autopilot_engaged = true, 10.0, "A", "B")

  private def per(id: Int, dist: Double, speed: Double) =
    PerceptionEvent(ts(id), id, "car", dist, speed, "ahead", 0.9)

  test("speed + battery rules fire on exactly the matching rows") {
    import spark.implicits._
    val t = Seq(
      tel(1, 80.0, violation = true, battery = 50.0),   // speed only
      tel(2, 50.0, violation = false, battery = 10.0),  // battery only
      tel(3, 70.0, violation = true, battery = 5.0),    // both
      tel(4, 40.0, violation = false, battery = 90.0))  // neither
    val alerts = FleetRules.telemetryAlerts(t.toDS.toDF(), Thresholds()).collect()
    assert(alerts.length == 4)
    val byType = alerts.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byType == Map("Speed Violation" -> 2, "Low Battery" -> 2))
  }

  test("alert messages mirror the reference format") {
    import spark.implicits._
    val alerts = FleetRules
      .telemetryAlerts(Seq(tel(7, 81.4, violation = true, battery = 12.34)).toDS.toDF())
      .orderBy("alert_type").collect()
    assert(alerts.map(_.getString(3)).toSeq == Seq(
      "Vehicle 7 battery low: 12.3%",
      "Vehicle 7 exceeded speed limit (81 km/h)"))
  }

  test("collision rule requires close AND fast") {
    import spark.implicits._
    val p = Seq(
      per(1, 3.0, 50.0),  // close + fast -> alert
      per(2, 3.0, 5.0),   // close + slow -> no
      per(3, 80.0, 50.0), // far + fast -> no
      per(4, 4.9, 10.1))  // boundary: just inside both -> alert
    val alerts = FleetRules.perceptionAlerts(p.toDS.toDF(), Thresholds()).collect()
    assert(alerts.map(_.getInt(1)).sorted.toSeq == Seq(1, 4))
    assert(alerts.forall(_.getString(2) == "Collision Risk"))
  }

  test("thresholds are configurable") {
    import spark.implicits._
    val t = Seq(tel(1, 50.0, violation = false, battery = 40.0))
    val strict = Thresholds(batteryPct = 50.0)
    assert(FleetRules.telemetryAlerts(t.toDS.toDF(), strict).count() == 1)
    assert(FleetRules.telemetryAlerts(t.toDS.toDF(), Thresholds()).count() == 0)
  }
}
