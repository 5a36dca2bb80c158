package graft.sources

import java.sql.Timestamp
import java.util.{Random => JRandom}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{DrivingEvent, PerceptionEvent, Telemetry}

/** Deterministic fleet-simulation generator — the batch core of the
  * reference's producer (reference producer.py:61–131: per-vehicle
  * random-walk speed/battery/position state, one telemetry + one
  * perception + p=0.02 driving event per vehicle per tick).
  *
  * Vehicles are the unit of parallelism: each vehicle's walk is generated
  * sequentially inside one task from its own seeded RNG (`seed * P + id`),
  * so output is identical for a given (seed, nVehicles, nTicks) at any
  * partitioning or cluster size. This is the one place the engine uses
  * imperative per-partition logic — the walk is inherently sequential per
  * key (SURVEY §2.1 S3); everything downstream is declarative.
  *
  * A streaming variant is [[graft.streaming.Pipeline]]'s rate-source hookup;
  * for tests the batch form is canonical.
  */
object Simulation {

  private case class City(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
      name: String, spots: Seq[String])

  /** reference producer.py:30–55. */
  private val cities = Seq(
    City(37.35, 37.50, -122.25, -122.10, "Palo Alto",
      Seq("Tesla HQ", "Stanford University", "University Ave")),
    City(37.70, 37.85, -122.55, -122.35, "San Francisco",
      Seq("Golden Gate Bridge", "Fisherman's Wharf", "SOMA")),
    City(33.90, 34.20, -118.60, -118.20, "Los Angeles",
      Seq("LAX", "Santa Monica Pier", "Downtown LA")))

  private val objectClasses = Seq("car", "pedestrian", "cyclist", "truck", "motorcycle", "bus")
  private val directions = Seq("left", "right", "ahead", "rear")
  private val drivingTypes = Seq("intervention", "disengagement", "lane_change", "hard_brake")

  final case class SimTick(telemetry: Telemetry, perception: PerceptionEvent,
      driving: Option[DrivingEvent])

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0
  private def round3(x: Double): Double = math.round(x * 1000.0) / 1000.0
  private def round6(x: Double): Double = math.round(x * 1000000.0) / 1000000.0

  /** One vehicle's full walk (producer.py:75–131 semantics). */
  private def walk(vehicleId: Int, nTicks: Int, seed: Long, startMillis: Long): Iterator[SimTick] = {
    val rng = new JRandom(seed * 1000003L + vehicleId)
    val city = cities(vehicleId % cities.size)
    val start = city.spots(rng.nextInt(city.spots.size))
    val dest = city.spots(rng.nextInt(city.spots.size))
    var speed = 50.0
    var battery = 80.0
    var lat = (city.latMin + city.latMax) / 2
    var lon = (city.lonMin + city.lonMax) / 2
    var odo = 0.0
    def uniform(lo: Double, hi: Double): Double = lo + rng.nextDouble() * (hi - lo)

    (0 until nTicks).iterator.map { tick =>
      val t = new Timestamp(startMillis + tick * 1000L)
      speed = math.max(20.0, math.min(90.0, speed + uniform(-4, 4)))
      val violation = speed > 65.0
      battery = math.max(0.0, battery - (if (speed <= 60) 0.04 else 0.08))
      val delta = speed * 0.00001
      rng.nextInt(3) match {
        case 0 => lat += delta // straight
        case 1 => lon -= delta // left
        case _ => lon += delta // right
      }
      lat = round6(math.max(city.latMin, math.min(city.latMax, lat)))
      lon = round6(math.max(city.lonMin, math.min(city.lonMax, lon)))
      odo += speed / 3600.0
      val tel = Telemetry(t, vehicleId, round2(speed), violation, lat, lon,
        round2(battery), round2(battery * 5.2), autopilot_engaged = true,
        odo, start, dest)
      val per = PerceptionEvent(t, vehicleId,
        objectClasses(rng.nextInt(objectClasses.size)),
        round2(uniform(2, 120)), round2(uniform(0, 80)),
        directions(rng.nextInt(directions.size)), round3(uniform(0.85, 1.0)))
      val drv = if (rng.nextDouble() < 0.02) {
        val et = drivingTypes(rng.nextInt(drivingTypes.size))
        Some(DrivingEvent(t, vehicleId, et,
          f"Driver $et at speed $speed%.0f km/h", Some(lat), Some(lon)))
      } else None
      SimTick(tel, per, drv)
    }
  }

  def ticks(s: SparkSession, nVehicles: Int, nTicks: Int, seed: Long = 42L,
      startMillis: Long = 1700000000000L): Dataset[SimTick] = {
    import s.implicits._
    s.createDataset(1 to nVehicles)
      .repartition(math.min(nVehicles, s.sparkContext.defaultParallelism))
      .flatMap(walk(_, nTicks, seed, startMillis))
  }

  def telemetry(s: SparkSession, nVehicles: Int, nTicks: Int, seed: Long = 42L,
      startMillis: Long = 1700000000000L): Dataset[Telemetry] = {
    import s.implicits._
    ticks(s, nVehicles, nTicks, seed, startMillis).map(_.telemetry)
  }

  def perception(s: SparkSession, nVehicles: Int, nTicks: Int, seed: Long = 42L,
      startMillis: Long = 1700000000000L): Dataset[PerceptionEvent] = {
    import s.implicits._
    ticks(s, nVehicles, nTicks, seed, startMillis).map(_.perception)
  }

  def driving(s: SparkSession, nVehicles: Int, nTicks: Int, seed: Long = 42L,
      startMillis: Long = 1700000000000L): Dataset[DrivingEvent] = {
    import s.implicits._
    ticks(s, nVehicles, nTicks, seed, startMillis).flatMap(_.driving)
  }
}
