package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** File-replay telemetry source with lenient-schema normalization — the
  * Spark form of the reference's CSV/JSONL replay (reference
  * waymo_replay.py:25–92: per-column defaults, str→bool/float coercions,
  * "yyyy-MM-dd HH:mm:ss" wire timestamps; SURVEY S6 + P14 + P15).
  *
  * Everything is read as strings first (the wire is schemaless), then
  * normalized declaratively — casts and `coalesce` defaults are Catalyst
  * expressions that run inside whole-stage codegen, and the CSV/JSON scans
  * parallelize per file split at any scale.
  */
object FileReplay {

  /** Defaults mirroring reference waymo_replay.py:31–39. */
  private val numericDefaults: Map[String, Double] = Map(
    "current_speed_kmh" -> 0.0,
    "latitude" -> 0.0,
    "longitude" -> 0.0,
    "battery_level_pct" -> 85.0,
    "remaining_range_km" -> 400.0,
    "odometer_km" -> 0.0)

  private def truthy(c: Column): Column =
    lower(trim(c)).isin("true", "1", "yes")

  private def falsy(c: Column): Column =
    lower(trim(c)).isin("false", "0", "no")

  /** Normalize a wire-schema frame (all strings, any subset of columns
    * present) to the telemetry schema. `asOf` replaces the reference's
    * wall-clock fallback for unparseable timestamps (db.py:134–141) so
    * replays are deterministic. `keep` names extra input columns to carry
    * through unchanged (e.g. a wire content hash for ingest dedup).
    */
  def normalize(wire: DataFrame, asOf: Column = current_timestamp(),
      keep: Seq[String] = Nil): DataFrame = {
    val withAll = Schemas.telemetryWire.fieldNames.foldLeft(wire) { (df, f) =>
      if (df.columns.contains(f)) df else df.withColumn(f, lit(null).cast("string"))
    }
    // try_* everywhere: Spark 4's ANSI mode makes plain cast/parse ABORT
    // the batch on one malformed wire value — the opposite of this
    // source's lenient contract (waymo_replay.py defaults). try_cast /
    // try_to_timestamp yield null, and coalesce applies the default.
    withAll.select(keep.map(col) ++ Seq(
      coalesce(try_to_timestamp(col("timestamp"), lit("yyyy-MM-dd HH:mm:ss")), asOf).as("time"),
      // int(float(v)) with default 1 — waymo_replay.py:47
      coalesce(col("vehicle_id").try_cast("double").try_cast("int"), lit(1)).as("vehicle_id"),
      coalesce(col("current_speed_kmh").try_cast("double"), lit(0.0)).as("current_speed_kmh"),
      // str→bool: true/1/yes (waymo_replay.py:52–53); default false
      coalesce(truthy(col("speed_limit_violation")), lit(false)).as("speed_limit_violation"),
      coalesce(col("latitude").try_cast("double"), lit(numericDefaults("latitude"))).as("latitude"),
      coalesce(col("longitude").try_cast("double"), lit(numericDefaults("longitude"))).as("longitude"),
      coalesce(col("battery_level_pct").try_cast("double"), lit(numericDefaults("battery_level_pct"))).as("battery_level_pct"),
      coalesce(col("remaining_range_km").try_cast("double"), lit(numericDefaults("remaining_range_km"))).as("remaining_range_km"),
      // str→bool negated default-true: NOT in false/0/no (waymo_replay.py:54–55)
      coalesce(!falsy(col("autopilot_engaged")), lit(true)).as("autopilot_engaged"),
      coalesce(col("odometer_km").try_cast("double"), lit(numericDefaults("odometer_km"))).as("odometer_km"),
      coalesce(nullif(trim(col("start_location")), lit("")), lit("Waymo")).as("start_location"),
      coalesce(nullif(trim(col("destination")), lit("")), lit("Waymo")).as("destination")): _*)
  }

  /** Read + normalize a telemetry CSV (header row = column names). */
  def readTelemetryCsv(s: SparkSession, path: String,
      asOf: Column = current_timestamp()): DataFrame =
    normalize(s.read.option("header", "true").schema(wireSchemaFor(s, path)).csv(path), asOf)

  /** Read + normalize telemetry JSONL (one JSON object per line). */
  def readTelemetryJsonl(s: SparkSession, path: String,
      asOf: Column = current_timestamp()): DataFrame =
    normalize(s.read.schema(Schemas.telemetryWire).json(path), asOf)

  /** Dispatch by extension, as reference waymo_replay.py:83–92. */
  def readTelemetryFile(s: SparkSession, path: String,
      asOf: Column = current_timestamp()): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) readTelemetryCsv(s, path, asOf)
    else if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson")) readTelemetryJsonl(s, path, asOf)
    else throw new IllegalArgumentException(s"Use .csv or .jsonl file: $path")
  }

  /** CSV needs the wire schema restricted to columns actually present, or
    * Spark fills missing trailing columns positionally. */
  private def wireSchemaFor(s: SparkSession, path: String) = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val header = s.read.option("header", "true").csv(path).columns
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }
}
