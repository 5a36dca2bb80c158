package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Sinks

/** SURVEY §2.7 end-to-end: the three ingestion modes (S3 simulation,
  * S4 OpenSky replay, S6 file replay) land in ONE day-partitioned
  * telemetry store with per-row provenance — the reference's
  * three-producers-one-table topology (producer.py:147–199,
  * opensky_source.py:146–177, waymo_replay.py:95–160 all writing
  * `vehicle_telemetry`), plus the `source_mode` column the reference
  * never kept.
  */
class UnifiedIngestSpec extends SparkSpec {

  test("three real modes unify into one provenance-tagged telemetry store") {
    val asOf = lit("2026-03-01 09:00:00").cast("timestamp")

    val sim = Simulation.telemetry(spark, nVehicles = 3, nTicks = 5, seed = 7L).toDF()

    val oskDir = tmpDir("unified_osk")
    Files.writeString(Paths.get(oskDir, "poll.json"),
      """{"time":1700000000,"states":[""" +
        """["a1","FLA ","US",1700000000,1700000000,10.0,10.0,1000.0,false,50.0,90.0],""" +
        """["b2","FLB ","DE",1700000000,1700000000,10.3,10.3,10.0,false,10.0,0.0]]}""" + "\n")
    val osk = OpenSkyMap.toTelemetry(
      OpenSkyReplay.parseStates(
        spark.read.schema(OpenSkyReplay.payloadSchema).json(oskDir)), asOf)

    val file = FileReplay.readTelemetryCsv(spark,
      getClass.getResource("/telemetry_sample.csv").getPath, asOf)

    val unified = UnifiedIngest.unify(
      "simulation" -> sim, "opensky" -> osk, "file_replay" -> file)
    val out = tmpDir("unified_store")
    Sinks.writePartitioned(unified, out)

    val back = spark.read.parquet(out)
    val byMode = back.groupBy("source_mode").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMode == Map("simulation" -> 15L, "opensky" -> 2L, "file_replay" -> 6L),
      s"per-mode provenance counts survive the store round-trip: $byMode")

    // one schema across modes: the shared telemetry columns are non-null
    // for every row regardless of origin
    assert(back.filter(col("vehicle_id").isNull || col("time").isNull ||
      col("current_speed_kmh").isNull).count() == 0)

    // single-mode reads see exactly their leg's rows (50 and 10 m/s x 3.6)
    val oskSpeeds = back.filter(col("source_mode") === "opensky")
      .select("current_speed_kmh").collect().map(_.getDouble(0)).toSet
    assert(oskSpeeds == Set(180.0, 36.0))
  }

  test("unify tolerates per-mode schema drift by name, never by position") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("vehicle_id", "extra_a")
    val b = Seq((2, 9.5)).toDF("vehicle_id", "extra_b")
    val u = UnifiedIngest.unify("ma" -> a, "mb" -> b).orderBy("vehicle_id")
    assert(u.columns.toSet == Set("vehicle_id", "extra_a", "extra_b", "source_mode"))
    val rows = u.collect()
    assert(rows(0).getAs[String]("extra_a") == "x" && rows(0).isNullAt(rows(0).fieldIndex("extra_b")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("extra_a")) && rows(1).getAs[Double]("extra_b") == 9.5)
  }
}
