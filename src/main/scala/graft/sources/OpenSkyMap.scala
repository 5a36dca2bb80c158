package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OpenSky state-vector → fleet-telemetry projection — the pure-transform
  * half of the reference's live source (reference opensky_source.py:70–98
  * mapping, :101–143 proximity perception). The REST poller itself is
  * environment I/O (zero-egress here); captured payloads parsed to this
  * schema replay through these transforms unchanged.
  */
object OpenSkyMap {

  /** Positional state-vector fields (opensky_source.py:24–34), named. */
  val stateSchema: StructType = StructType.fromDDL(
    """icao24 STRING, callsign STRING, origin_country STRING,
       time_position BIGINT, last_contact BIGINT,
       longitude DOUBLE, latitude DOUBLE, baro_altitude DOUBLE,
       on_ground BOOLEAN, velocity DOUBLE, true_track DOUBLE""")

  /** Stable vehicle id from the ICAO24 hex string:
    * `(int(hex) & 0x7FFFFFFF) % 9999 + 1`, empty/invalid → 1
    * (opensky_source.py:37–42). `conv` handles the hex parse natively.
    */
  def vehicleIdFromIcao24(icao24: Column): Column =
    when(icao24.isNull || trim(icao24) === "", lit(1))
      .otherwise(
        (conv(trim(icao24), 16, 10).cast("long").bitwiseAND(0x7FFFFFFFL) % 9999 + 1)
          .cast("int"))

  /** State vectors → telemetry rows (opensky_source.py:70–98): null-island
    * rows dropped, m/s → km/h, unix seconds → timestamp (null → `asOf`),
    * aircraft placeholders for battery/range/odometer.
    */
  def toTelemetry(states: DataFrame, asOf: Column = current_timestamp()): DataFrame =
    states
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select(
        coalesce(timestamp_seconds(col("time_position")), asOf).as("time"),
        vehicleIdFromIcao24(col("icao24")).as("vehicle_id"),
        round(coalesce(col("velocity"), lit(0.0)) * 3.6, 2).as("current_speed_kmh"),
        (coalesce(col("velocity"), lit(0.0)) * 3.6 > 65.0).as("speed_limit_violation"),
        round(col("latitude"), 6).as("latitude"),
        round(col("longitude"), 6).as("longitude"),
        lit(100.0).as("battery_level_pct"),
        lit(500.0).as("remaining_range_km"),
        lit(true).as("autopilot_engaged"),
        lit(0.0).as("odometer_km"),
        coalesce(col("origin_country"), lit("N/A")).as("start_location"),
        coalesce(nullif(trim(col("callsign")), lit("")), lit("N/A")).as("destination"))

  /** Proximity perception events: for each aircraft, up to 3 others within
    * 50 km planar distance (opensky_source.py:101–143 — reference caps at
    * 3 in input order; we declare nearest-3 as the semantic, SURVEY §7
    * hard-part 3).
    *
    * Scale design (same move as q13): candidates come from a lat/lon grid
    * equi-join — each probe row explodes into its own ~50 km grid cell and
    * the 8 neighbors, so the join never goes quadratic however dense the
    * airspace; the exact distance predicate then prunes the cell
    * candidates.
    *
    * `groupCols` confines pairing to rows sharing those columns (e.g. a
    * `poll_time` key when a replay micro-batch carries several polls —
    * the reference pairs strictly within one poll's states).
    */
  def proximityPerception(states: DataFrame, groupCols: Seq[String] = Nil,
      asOf: Column = current_timestamp()): DataFrame = {
    // Cell widths must cover the maximum coordinate delta a 50 km pair can
    // have under the distance formula below: |Δlat| <= 50/111 ≈ 0.4505°,
    // and |Δlon| <= 50/(111*0.7) ≈ 0.6435° (the 0.7 floor of the
    // longitude scale factor). Narrower cells (e.g. a square 0.45° grid)
    // silently drop true pairs that land two cells apart.
    val cellLatDeg = 0.46
    val cellLonDeg = 0.65
    val keep = groupCols ++ Seq("icao24", "time_position", "latitude", "longitude", "velocity")
    val base = states
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select(keep.map(col): _*)
    val cellLat = floor(col("latitude") / cellLatDeg).cast("long")
    val cellLon = floor(col("longitude") / cellLonDeg).cast("long")
    val probe = base.select(keep.map(col) :+
        explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
          struct((cellLat + dx).as("clat"), (cellLon + dy).as("clon"))): _*)).as("c"): _*)
      .select(keep.map(col) ++ Seq(col("c.clat").as("clat"), col("c.clon").as("clon")): _*)
    val build = base.select(groupCols.map(col) ++ Seq(
      col("icao24").as("o_icao24"),
      col("latitude").as("o_lat"), col("longitude").as("o_lon"),
      col("velocity").as("o_velocity"),
      cellLat.as("clat"), cellLon.as("clon")): _*)
    val dlat = (col("o_lat") - col("latitude")) * 111000.0
    val dlon = (col("o_lon") - col("longitude")) * 111000.0 *
      greatest(lit(0.7), abs(col("latitude")) / 90.0)
    val paired = probe.join(build, groupCols ++ Seq("clat", "clon"))
      .filter(col("o_icao24") =!= col("icao24"))
      .withColumn("dist_m", sqrt(dlat * dlat + dlon * dlon))
      .filter(col("dist_m") <= 50000.0)
    val w = Window.partitionBy((groupCols :+ "icao24").map(col): _*)
      .orderBy(col("dist_m"), col("o_icao24"))
    paired
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(
        // null time_position falls back to `asOf` (toTelemetry's
        // convention) so a captured poll replays deterministically when
        // the caller pins it — not to wall-clock unconditionally
        coalesce(timestamp_seconds(col("time_position")), asOf).as("time"),
        vehicleIdFromIcao24(col("icao24")).as("vehicle_id"),
        lit("aircraft").as("object_class"),
        round(col("dist_m"), 2).as("object_distance_m"),
        round(coalesce(col("o_velocity"), lit(0.0)) * 3.6, 2).as("object_speed_kmh"),
        lit("ahead").as("object_relative_direction"),
        lit(0.95).as("confidence"))
  }
}
