package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Typed domain model of the fleet-telemetry pipeline — the five tables of
  * the reference DDL (reference sql/01_schema.sql:7–69) as case classes for
  * `Dataset[T]` use, plus the wire-format schemas the lenient sources parse
  * into (SURVEY.md §1.2–§1.3).
  */
final case class Telemetry(
    time: Timestamp,
    vehicle_id: Int,
    current_speed_kmh: Double,
    speed_limit_violation: Boolean,
    latitude: Double,
    longitude: Double,
    battery_level_pct: Double,
    remaining_range_km: Double,
    autopilot_engaged: Boolean,
    odometer_km: Double,
    start_location: String,
    destination: String)

/** reference sql/01_schema.sql:25–33. */
final case class PerceptionEvent(
    time: Timestamp,
    vehicle_id: Int,
    object_class: String,
    object_distance_m: Double,
    object_speed_kmh: Double,
    object_relative_direction: String,
    confidence: Double)

/** reference sql/01_schema.sql:38–45. */
final case class DrivingEvent(
    time: Timestamp,
    vehicle_id: Int,
    event_type: String,
    event_detail: String,
    latitude: Option[Double],
    longitude: Option[Double])

/** reference sql/01_schema.sql:50–56 (id omitted — surrogate keys are a
  * sink concern, not part of the analytic schema). */
final case class Alert(
    time: Timestamp,
    vehicle_id: Int,
    alert_type: String,
    alert_message: String)

/** reference sql/01_schema.sql:61–67; `metadata` JSONB → typed map. */
final case class MetricRow(
    time_bucket: Timestamp,
    vehicle_id: Int,
    metric_name: String,
    metric_value: Double,
    metadata: Map[String, String])

/** Alert thresholds mirroring reference config/settings.yaml:23–27 (the
  * `metrics:` block) + the hardcoded collision object speed
  * (reference consumer.py:117). */
final case class Thresholds(
    batteryPct: Double = 20.0,
    speedKmh: Double = 65.0,
    collisionDistanceM: Double = 5.0,
    collisionObjectSpeedKmh: Double = 10.0,
    minKmPerIntervention: Double = 1.0)

object Schemas {
  val telemetry: StructType = Encoders.product[Telemetry].schema
  val perception: StructType = Encoders.product[PerceptionEvent].schema
  val driving: StructType = Encoders.product[DrivingEvent].schema
  val alert: StructType = Encoders.product[Alert].schema
  val metric: StructType = Encoders.product[MetricRow].schema

  /** Wire-format telemetry: every field nullable and loosely typed, as the
    * reference's producers emit it (`timestamp` is a "yyyy-MM-dd HH:mm:ss"
    * UTC string, booleans may arrive as "1"/"true"/"yes" — reference
    * waymo_replay.py:25–58, producer.py:89–102). Sources normalize this to
    * [[Telemetry]] via [[graft.sources.FileReplay]].
    */
  val telemetryWire: StructType = StructType.fromDDL(
    """vehicle_id STRING, timestamp STRING, current_speed_kmh STRING,
       speed_limit_violation STRING, latitude STRING, longitude STRING,
       battery_level_pct STRING, remaining_range_km STRING,
       autopilot_engaged STRING, odometer_km STRING,
       start_location STRING, destination STRING""")
}
