package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's nine metric query functions (reference
  * src/metrics/queries.py:29–223) as pure DataFrame transforms over the
  * domain tables — the E2 batch-metrics surface a user of the reference
  * calls today, re-expressed Spark-first.
  *
  * Design change for determinism (SURVEY §7 hard-part 1): every
  * `NOW()`-relative window takes an explicit `asOf` column (default
  * `current_timestamp()`), so tests and incremental materialization are
  * reproducible. The optional `vehicleId` mirrors the reference's dynamic
  * WHERE-appending as optional `.filter` composition — analyzed per call,
  * same semantics, and the predicate still pushes into the scan.
  *
  * All inputs are frames with the [[graft.model]] schemas; at scale they
  * are day-partitioned parquet ([[graft.sinks.Sinks.writePartitioned]]),
  * so the `time > asOf - lookback` predicate prunes partitions before the
  * scan.
  */
object FleetMetrics {

  private def window(df: DataFrame, asOf: Column, hours: Int): DataFrame = {
    val lower = asOf - expr(s"INTERVAL $hours HOURS")
    val timed = df.filter(col("time") > lower)
    // Frames read from the day-partitioned store carry p_date =
    // to_date(time) (UTC both sides), so time > lower implies
    // p_date >= to_date(lower). Catalyst can't derive that constraint
    // across columns on its own; adding it here is what turns the time
    // window into actual partition pruning (the hypertable
    // chunk-exclusion analog claimed in Sinks.scala).
    if (df.columns.contains("p_date")) timed.filter(col("p_date") >= to_date(lower))
    else timed
  }

  private def forVehicle(df: DataFrame, vehicleId: Option[Int]): DataFrame =
    vehicleId.fold(df)(id => df.filter(col("vehicle_id") === id))

  /** queries.py:29–42 — interventions/disengagements per vehicle. */
  def interventionsPerVehicle(driving: DataFrame, hours: Int = 24,
      vehicleId: Option[Int] = None, asOf: Column = current_timestamp()): DataFrame =
    forVehicle(window(driving, asOf, hours), vehicleId)
      .groupBy(col("vehicle_id"), col("event_type"))
      .agg(count(lit(1)).as("event_count"))
      .orderBy(col("vehicle_id"), col("event_type"))

  /** queries.py:45–58 — latest alerts, top-N by time. Tie-break beyond
    * `time DESC`: (vehicle_id, alert_type) — per-poll alert batches all
    * share one timestamp, and an un-tiebroken limit would serve a
    * shuffle-dependent subset that changes between refresh ticks over
    * unchanged data (latestTelemetry's determinism rule). */
  def alertsSummary(alerts: DataFrame, limit: Int = 100,
      vehicleId: Option[Int] = None): DataFrame =
    forVehicle(alerts, vehicleId)
      .select(col("time"), col("vehicle_id"), col("alert_type"), col("alert_message"))
      .orderBy(col("time").desc, col("vehicle_id"), col("alert_type"))
      .limit(limit)

  /** queries.py:61–68 — distinct vehicle ids (UI picker). */
  def distinctVehicleIds(telemetry: DataFrame, limit: Int = 200): DataFrame =
    telemetry.select(col("vehicle_id")).distinct()
      .orderBy(col("vehicle_id")).limit(limit)

  /** queries.py:71–83 — latest telemetry row per vehicle (DISTINCT ON).
    * Tie-break beyond `time DESC` is declared as odometer desc (monotone
    * per vehicle) — SURVEY §7 hard-part 2.
    */
  def latestTelemetry(telemetry: DataFrame, vehicleId: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(col("vehicle_id"))
      .orderBy(col("time").desc, col("odometer_km").desc)
    forVehicle(telemetry, vehicleId)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("vehicle_id"))
  }

  /** Per-vehicle km driven in the window: GREATEST(0, max−min odometer)
    * (queries.py:135–139 clamped form). */
  private def kmDriven(telemetry: DataFrame, asOf: Column, hours: Int): DataFrame =
    window(telemetry, asOf, hours)
      .groupBy(col("vehicle_id"))
      .agg(greatest(lit(0.0),
        coalesce(max(col("odometer_km")), lit(0.0)) -
          coalesce(min(col("odometer_km")), lit(0.0))).as("km_driven"))

  private def eventCount(driving: DataFrame, asOf: Column, hours: Int,
      types: Seq[String], as: String): DataFrame =
    window(driving, asOf, hours)
      .filter(col("event_type").isin(types: _*))
      .groupBy(col("vehicle_id"))
      .agg(count(lit(1)).as(as))

  /** queries.py:86–110 — km per intervention (both event types). The
    * aggregated sides are per-vehicle rows: AQE broadcasts the smaller. */
  def kmPerIntervention(telemetry: DataFrame, driving: DataFrame, hours: Int = 24,
      asOf: Column = current_timestamp()): DataFrame = {
    val dist = kmDriven(telemetry, asOf, hours)
    val interv = eventCount(driving, asOf, hours,
      Seq("intervention", "disengagement"), "interventions")
    dist.join(interv, Seq("vehicle_id"), "left")
      .select(col("vehicle_id"), col("km_driven"),
        coalesce(col("interventions"), lit(0L)).as("interventions"),
        when(coalesce(col("interventions"), lit(0L)) > 0,
          col("km_driven") / nullif(col("interventions"), lit(0L)))
          .as("km_per_intervention"))
      .orderBy(col("vehicle_id"))
  }

  /** queries.py:114–127 — perception counts per vehicle/object class,
    * count-descending. */
  def perceptionSummary(perception: DataFrame, hours: Int = 24,
      vehicleId: Option[Int] = None, asOf: Column = current_timestamp()): DataFrame =
    forVehicle(window(perception, asOf, hours), vehicleId)
      .groupBy(col("vehicle_id"), col("object_class"))
      .agg(count(lit(1)).as("detection_count"))
      .orderBy(col("vehicle_id"), col("detection_count").desc, col("object_class"))

  private def ratePer1000(telemetry: DataFrame, driving: DataFrame, hours: Int,
      vehicleId: Option[Int], asOf: Column, eventType: String, outCol: String): DataFrame = {
    val dist = kmDriven(telemetry, asOf, hours)
    val ev = eventCount(driving, asOf, hours, Seq(eventType), "n")
    forVehicle(dist.join(ev, Seq("vehicle_id"), "left"), vehicleId)
      .select(col("vehicle_id"), col("km_driven"),
        coalesce(col("n"), lit(0L)).as(eventType + "s"),
        when(col("km_driven") > 0,
          coalesce(col("n"), lit(0L)).cast("double") /
            nullif(col("km_driven"), lit(0.0)) * 1000.0)
          .as(outCol))
      .orderBy(col("vehicle_id"))
  }

  /** queries.py:130–156 — interventions per 1000 km (lower is better). */
  def interventionRatePer1000Km(telemetry: DataFrame, driving: DataFrame,
      hours: Int = 24, vehicleId: Option[Int] = None,
      asOf: Column = current_timestamp()): DataFrame =
    ratePer1000(telemetry, driving, hours, vehicleId, asOf,
      "intervention", "interventions_per_1000km")

  /** queries.py:159–186 — disengagements per 1000 km. */
  def disengagementRatePer1000Km(telemetry: DataFrame, driving: DataFrame,
      hours: Int = 24, vehicleId: Option[Int] = None,
      asOf: Column = current_timestamp()): DataFrame =
    ratePer1000(telemetry, driving, hours, vehicleId, asOf,
      "disengagement", "disengagements_per_1000km")

  /** queries.py:190–204 — fleet-wide scalar summary (two 1-row aggregates
    * cross-joined). */
  def fleetSelfDrivingSummary(telemetry: DataFrame, driving: DataFrame,
      hours: Int = 24, asOf: Column = current_timestamp()): DataFrame = {
    val totKm = kmDriven(telemetry, asOf, hours)
      .agg(coalesce(sum(col("km_driven")), lit(0.0)).as("total_km_driven"))
    val interv = window(driving, asOf, hours)
      .filter(col("event_type").isin("intervention", "disengagement"))
      .agg(count(lit(1)).as("total_interventions_plus_disengagements"))
    totKm.crossJoin(interv)
      .withColumn("fleet_avg_km_per_intervention",
        when(col("total_interventions_plus_disengagements") > 0,
          col("total_km_driven") / col("total_interventions_plus_disengagements")))
  }

  /** queries.py:207–223 — % of telemetry rows with autopilot engaged. */
  def autopilotEngagementRate(telemetry: DataFrame, hours: Int = 24,
      vehicleId: Option[Int] = None, asOf: Column = current_timestamp()): DataFrame =
    forVehicle(window(telemetry, asOf, hours), vehicleId)
      .groupBy(col("vehicle_id"))
      .agg(count(lit(1)).as("total_records"),
        sum(when(col("autopilot_engaged"), 1L).otherwise(0L)).as("engaged_records"))
      .withColumn("engagement_pct",
        round(lit(100.0) * col("engaged_records") / nullif(col("total_records"), lit(0L)), 2))
      .orderBy(col("vehicle_id"))
}
