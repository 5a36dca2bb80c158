package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * The streaming form is [[Simulation.streamingTicks]]: the same walk as a
  * `transformWithState` operator whose per-vehicle [[Simulation.WalkState]]
  * (including the explicit LCG state) lives in the checkpointed state
  * store — [[Simulation.rateTicks]] clocks it from the built-in rate
  * source at the reference producer's 1 s cadence. Batch and stream are
  * bit-identical by construction (asserted in SimulationSpec).
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

  /** `java.util.Random`'s exact LCG (the algorithm is specified in its
    * Javadoc), with the 48-bit state as an explicit value — so a walk's
    * randomness can live inside a checkpointed streaming state store and
    * still be bit-identical to the batch generator (asserted against
    * `java.util.Random` in SimulationSpec).
    */
  private[graft] object Lcg {
    private val Mult = 0x5DEECE66DL
    private val Mask = (1L << 48) - 1
    def seeded(seed: Long): Long = (seed ^ Mult) & Mask
    def nextState(state: Long): Long = (state * Mult + 0xBL) & Mask
    private def bits(state: Long, n: Int): Int = (state >>> (48 - n)).toInt
    /** (state', value) pairs mirroring Random.nextInt(bound)/nextDouble. */
    def nextInt(state: Long, bound: Int): (Long, Int) = {
      if ((bound & -bound) == bound) { // power of two
        val s1 = nextState(state)
        (s1, ((bound.toLong * bits(s1, 31)) >> 31).toInt)
      } else {
        var s = state
        while (true) {
          s = nextState(s)
          val b = bits(s, 31)
          val v = b % bound
          if (b - v + (bound - 1) >= 0) return (s, v)
        }
        throw new IllegalStateException("unreachable")
      }
    }
    def nextDouble(state: Long): (Long, Double) = {
      val s1 = nextState(state)
      val s2 = nextState(s1)
      (s2, ((bits(s1, 26).toLong << 27) + bits(s2, 27)) * 1.1102230246251565e-16) // 2^-53
    }
  }

  /** The full per-vehicle walk state between ticks — everything the
    * reference producer keeps in its vehicle objects (producer.py:61–72)
    * plus the RNG state, so one tick's transition is a pure function and
    * the walk can resume from a checkpoint.
    */
  final case class WalkState(rng: Long, tick: Int, speed: Double, battery: Double,
      lat: Double, lon: Double, odo: Double, start: String, dest: String)

  private[sources] def initState(vehicleId: Int, seed: Long): WalkState = {
    val city = cities(vehicleId % cities.size)
    val s0 = Lcg.seeded(seed * 1000003L + vehicleId)
    val (s1, i1) = Lcg.nextInt(s0, city.spots.size)
    val (s2, i2) = Lcg.nextInt(s1, city.spots.size)
    WalkState(s2, 0, 50.0, 80.0,
      (city.latMin + city.latMax) / 2, (city.lonMin + city.lonMax) / 2, 0.0,
      city.spots(i1), city.spots(i2))
  }

  /** One tick transition (producer.py:75–131 semantics), pure in
    * (state → state, emitted tick). */
  private[sources] def step(vehicleId: Int, st: WalkState, startMillis: Long): (WalkState, SimTick) = {
    val city = cities(vehicleId % cities.size)
    var rng = st.rng
    def uniform(lo: Double, hi: Double): Double = {
      val (s, d) = Lcg.nextDouble(rng); rng = s; lo + d * (hi - lo)
    }
    def pick(n: Int): Int = { val (s, v) = Lcg.nextInt(rng, n); rng = s; v }
    val t = new Timestamp(startMillis + st.tick * 1000L)
    val speed = math.max(20.0, math.min(90.0, st.speed + uniform(-4, 4)))
    val violation = speed > 65.0
    val battery = math.max(0.0, st.battery - (if (speed <= 60) 0.04 else 0.08))
    val delta = speed * 0.00001
    var lat = st.lat
    var lon = st.lon
    pick(3) match {
      case 0 => lat += delta // straight
      case 1 => lon -= delta // left
      case _ => lon += delta // right
    }
    lat = round6(math.max(city.latMin, math.min(city.latMax, lat)))
    lon = round6(math.max(city.lonMin, math.min(city.lonMax, lon)))
    val odo = st.odo + speed / 3600.0
    val tel = Telemetry(t, vehicleId, round2(speed), violation, lat, lon,
      round2(battery), round2(battery * 5.2), autopilot_engaged = true,
      odo, st.start, st.dest)
    val per = PerceptionEvent(t, vehicleId,
      objectClasses(pick(objectClasses.size)),
      round2(uniform(2, 120)), round2(uniform(0, 80)),
      directions(pick(directions.size)), round3(uniform(0.85, 1.0)))
    val drv = {
      val (s, d) = Lcg.nextDouble(rng); rng = s
      if (d < 0.02) {
        val et = drivingTypes(pick(drivingTypes.size))
        Some(DrivingEvent(t, vehicleId, et,
          f"Driver $et at speed $speed%.0f km/h", Some(lat), Some(lon)))
      } else None
    }
    (WalkState(rng, st.tick + 1, speed, battery, lat, lon, odo, st.start, st.dest),
      SimTick(tel, per, drv))
  }

  /** One vehicle's full walk (producer.py:75–131 semantics). */
  private def walk(vehicleId: Int, nTicks: Int, seed: Long, startMillis: Long): Iterator[SimTick] = {
    Iterator.iterate(step(vehicleId, initState(vehicleId, seed), startMillis)) {
      case (st, _) => step(vehicleId, st, startMillis)
    }.take(nTicks).map(_._2)
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

  /** "Advance vehicle `vehicle_id` to tick `tick`" pulse — the streaming
    * clock signal. Any pulse stream works (rate source, file stream);
    * pulses are idempotent (a replayed pulse emits nothing) and gaps
    * backfill (a pulse for tick k emits every not-yet-emitted tick ≤ k),
    * so the walk output is exactly the batch walk regardless of trigger
    * boundaries.
    */
  final case class TickPulse(vehicle_id: Int, tick: Int)

  /** The walk as a Spark-4 arbitrary-state streaming operator: per-vehicle
    * [[WalkState]] (including the 48-bit LCG state) in the checkpointed
    * state store, advanced by [[step]] per pulse — the reference
    * producer's live loop (producer.py:147–199), fault-tolerant: a
    * restarted query resumes every walk mid-trajectory, bit-identical.
    * Requires the RocksDB state store provider (see
    * [[graft.streaming.Pipeline.runOdometerProgress]]).
    */
  final class WalkProcessor(seed: Long, startMillis: Long)
      extends StatefulProcessor[Int, TickPulse, SimTick] {
    @transient private var walkSt: ValueState[WalkState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      walkSt = getHandle.getValueState[WalkState]("walk",
        Encoders.product[WalkState], TTLConfig.NONE)
    override def handleInputRows(vid: Int, rows: Iterator[TickPulse],
        timers: TimerValues): Iterator[SimTick] = {
      val target = rows.map(_.tick).max
      var st = if (walkSt.exists()) walkSt.get() else initState(vid, seed)
      val out = Seq.newBuilder[SimTick]
      while (st.tick <= target) {
        val (next, tick) = step(vid, st, startMillis)
        out += tick
        st = next
      }
      walkSt.update(st)
      out.result().iterator
    }
  }

  /** Streaming walk over any pulse stream. */
  def streamingTicks(pulses: Dataset[TickPulse], seed: Long = 42L,
      startMillis: Long = 1700000000000L): Dataset[SimTick] = {
    import pulses.sparkSession.implicits._
    pulses.groupByKey(_.vehicle_id)
      .transformWithState(new WalkProcessor(seed, startMillis),
        TimeMode.None(), OutputMode.Append())
  }

  /** Live hookup: the built-in rate source as the pulse clock — one tick
    * per vehicle per second at `ticksPerSecond = 1`, the reference
    * producer's `time.sleep(1)` cadence (producer.py:181).
    */
  def rateTicks(s: SparkSession, nVehicles: Int, ticksPerSecond: Int = 1,
      seed: Long = 42L, startMillis: Long = 1700000000000L): Dataset[SimTick] = {
    import s.implicits._
    streamingTicks(
      s.readStream.format("rate")
        .option("rowsPerSecond", (nVehicles.toLong * ticksPerSecond).toString)
        .load()
        .select((col("value") % nVehicles + 1).cast("int").as("vehicle_id"),
          (col("value") / nVehicles).cast("int").as("tick"))
        .as[TickPulse],
      seed, startMillis)
  }
}
