package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Captured-payload OpenSky replay: positional parse, per-poll truncation,
  * and the full replay pipeline with per-poll pairing (counts pinned).
  */
class OpenSkyReplaySpec extends SparkSpec {

  // state vector: [icao24, callsign, country, time_position, last_contact,
  //                lon, lat, baro_alt, on_ground, velocity, true_track]
  private def st(icao: String, lon: Double, lat: Double, vel: Double,
      t: Long = 1700000000L): String =
    s"""["$icao","FL$icao ","US",$t,$t,$lon,$lat,1000.0,false,$vel,90.0]"""

  private def payload(time: Long, states: String*): String =
    s"""{"time":$time,"states":[${states.mkString(",")}]}"""

  private def writePayload(dir: String, name: String, body: String): Unit =
    Files.writeString(Paths.get(dir, name), body + "\n")

  test("parseStates: positional typing, null passthrough, poll truncation") {
    val dir = tmpDir("osk_parse")
    writePayload(dir, "p.json", payload(1700000000L,
      st("a1", 10.0, 10.0, 50.0),
      """["b2",null,"DE",null,1700000000,null,null,null,true,10.5,0.0]""",
      st("c3", 20.0, 20.0, 30.0)))
    val raw = spark.read.schema(OpenSkyReplay.payloadSchema).json(dir)
    val parsed = OpenSkyReplay.parseStates(raw).orderBy("icao24").collect()
    assert(parsed.length == 3)
    val a = parsed(0)
    assert(a.getAs[String]("icao24") == "a1")
    assert(a.getAs[Long]("time_position") == 1700000000L)
    assert(a.getAs[Double]("longitude") == 10.0 && a.getAs[Double]("latitude") == 10.0)
    assert(a.getAs[Boolean]("on_ground") == false)
    val b = parsed(1)
    assert(b.getAs[String]("callsign") == null)
    assert(b.isNullAt(b.fieldIndex("longitude")), "JSON null stays SQL null")
    assert(b.getAs[Boolean]("on_ground") == true)
    // reference truncation states[:max_vehicles] keeps input order
    val truncated = OpenSkyReplay.parseStates(raw, maxVehicles = 2)
      .select("icao24").collect().map(_.getString(0)).toSet
    assert(truncated == Set("a1", "b2"))
  }

  test("replay pipeline e2e: polls -> telemetry + per-poll proximity -> collision alerts") {
    val in = tmpDir("osk_in")
    val out = tmpDir("osk_out")
    val ckpt = tmpDir("osk_ckpt")
    // poll 1: a1 and b2 ~3.3 m apart (collision pair), c3 isolated,
    // n4 at null island (dropped from telemetry)
    writePayload(in, "poll1.json", payload(1700000000L,
      st("a1", 10.0, 10.0, 50.0),
      st("b2", 10.0, 10.00003, 10.0),
      st("c3", 20.0, 20.0, 30.0),
      """["n4","FLN ","ES",1700000000,1700000000,null,null,1000.0,false,5.0,0.0]"""))
    // poll 2: a1 and b2 now ~40 km apart (perception pair, no alert).
    // b2's old poll-1 position is 3.3 m from a1's poll-2 position, so any
    // cross-poll pairing would manufacture extra collision alerts.
    writePayload(in, "poll2.json", payload(1700000010L,
      st("a1", 10.0, 10.0, 50.0, t = 1700000010L),
      st("b2", 10.3, 10.3, 10.0, t = 1700000010L)))
    // both polls in ONE micro-batch: pairing must stay within poll_time
    OpenSkyReplay.runReplayPipeline(spark, in, out, ckpt, filesPerTrigger = 2)
      .awaitTermination()

    val tel = spark.read.parquet(s"$out/vehicle_telemetry")
    assert(tel.count() == 5, "3 + 2 states with coordinates")
    assert(tel.filter(col("current_speed_kmh") === 180.0).count() == 2, "50 m/s x 3.6")

    val per = spark.read.parquet(s"$out/perception_events")
    assert(per.count() == 4, "a1<->b2 in each poll; no cross-poll pairs")
    assert(per.filter(col("object_class") =!= "aircraft").count() == 0)

    val al = spark.read.parquet(s"$out/alerts")
    assert(al.count() == 2, "only the 3.3 m poll-1 pair alerts (both directions)")
    assert(al.filter(col("alert_type") === "Collision Risk").count() == 2)
  }
}
