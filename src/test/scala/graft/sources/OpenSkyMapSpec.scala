package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpenSkyMapSpec extends SparkSpec {

  private def state(icao: String, callsign: String, country: String,
      timePos: java.lang.Long, lon: java.lang.Double, lat: java.lang.Double,
      velocity: java.lang.Double): Row =
    Row(icao, callsign, country, timePos, timePos, lon, lat, 10000.0,
      false, velocity, 90.0)

  private def statesDf(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      OpenSkyMap.stateSchema)

  test("state -> telemetry projection: id hash, unit conversion, null drop") {
    val df = OpenSkyMap.toTelemetry(statesDf(
      state("abc123", " UAL123 ", "United States", 1700000000L, -122.0, 37.0, 250.0),
      state("abc123", "X", "US", 1700000000L, null, 37.0, 250.0), // null lon -> dropped
      state("", null, null, null, -120.0, 35.0, null)))           // empty icao, nulls
    val rows = df.orderBy("vehicle_id").collect()
    assert(rows.length == 2)
    // empty icao24 -> vehicle 1 (reference opensky_source.py:38-39)
    assert(rows(0).getInt(1) == 1)
    assert(rows(0).getDouble(2) == 0.0 && !rows(0).getBoolean(3))
    assert(rows(0).getString(10) == "N/A" && rows(0).getString(11) == "N/A")
    // 0xabc123 = 11256099 -> % 9999 + 1 deterministic; 250 m/s = 900 km/h
    val expectedId = ((0xabc123L & 0x7FFFFFFFL) % 9999 + 1).toInt
    assert(rows(1).getInt(1) == expectedId)
    assert(rows(1).getDouble(2) == 900.0 && rows(1).getBoolean(3))
    assert(rows(1).getString(11) == "UAL123")
  }

  test("proximity grid covers longitude pairs near the 50km boundary") {
    // dlon scale at lat 37 is max(0.7, 37/90) = 0.7, so 0.541 deg of
    // longitude = 0.541*111000*0.7 = 42.0 km <= 50 km: a true pair. A
    // square 0.45-deg grid put these two cells apart (0.449 -> cell 0,
    // 0.990 -> cell 2) and silently dropped them; the 0.65-deg longitude
    // cell must catch them.
    val df = OpenSkyMap.proximityPerception(statesDf(
      state("b00001", "A", "X", 1700000000L, 0.449, 37.0, 100.0),
      state("b00002", "B", "X", 1700000000L, 0.990, 37.0, 110.0)))
    val rows = df.collect()
    assert(rows.length == 2, "both directions of the 42km pair")
    assert(rows.forall(r => math.abs(r.getDouble(3) - 42036.54) < 200.0))
  }

  test("proximity perception: within 50km only, nearest-3 cap, no self-pairs") {
    // ~0.1 deg lat ~ 11.1 km; d > 50 km for the far one
    val df = OpenSkyMap.proximityPerception(statesDf(
      state("a00001", "A", "X", 1700000000L, -122.00, 37.00, 100.0),
      state("a00002", "B", "X", 1700000000L, -122.00, 37.10, 110.0),
      state("a00003", "C", "X", 1700000000L, -122.00, 37.20, 120.0),
      state("a00004", "D", "X", 1700000000L, -122.00, 39.00, 130.0), // ~222 km away
      state("a00005", "E", "X", 1700000000L, -122.00, 37.05, 140.0),
      state("a00006", "F", "X", 1700000000L, -122.00, 37.02, 150.0)))
    val rows = df.collect()
    val idOf = (hex: String) => ((java.lang.Long.parseLong(hex, 16) & 0x7FFFFFFFL) % 9999 + 1).toInt
    // far aircraft never appears
    assert(!rows.exists(_.getInt(1) == idOf("a00004")))
    assert(rows.forall(_.getDouble(3) <= 50000.0))
    // per-vehicle cap 3 and a1's nearest-3 are the 2km/5km/11km neighbors
    val a1 = rows.filter(_.getInt(1) == idOf("a00001")).sortBy(_.getDouble(3))
    assert(a1.length == 3)
    assert(a1.map(_.getDouble(3)).toSeq == a1.map(_.getDouble(3)).sorted.toSeq)
    assert(a1.last.getDouble(3) < 12000.0)
    // object speeds are km/h conversions of the neighbor, not self
    assert(a1.head.getDouble(4) == 150.0 * 3.6)
  }
}
