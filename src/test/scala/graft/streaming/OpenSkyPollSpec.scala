package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom DataSource V2 poll source: one micro-batch per poll,
  * durable spool replay, checkpointed incremental restart, and the
  * downstream parse contract shared with OpenSkyReplay.
  */
class OpenSkyPollSpec extends SparkSpec {

  private def st(icao: String, lon: Double, lat: Double, vel: Double): String =
    s"""["$icao","FL$icao ","US",1700000000,1700000000,$lon,$lat,1000.0,false,$vel,90.0]"""

  private def payload(time: Long, states: String*): String =
    s"""{"time":$time,"states":[${states.mkString(",")}]}"""

  private def runToDrain(captureDir: String, outDir: String, ckpt: String): Unit = {
    val q = OpenSkyPoll.stateStream(spark, "dir", captureDir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try { q.processAllAvailable() } finally q.stop()
  }

  test("dir-mode poller: one micro-batch per captured poll, spool-backed, incremental restart") {
    val capture = tmpDir("poll_capture")
    val out = tmpDir("poll_out")
    val ckpt = tmpDir("poll_ckpt")
    Files.writeString(Paths.get(capture, "poll_a.json"),
      payload(1700000000L, st("a1", 10.0, 10.0, 50.0), st("b2", 10.3, 10.3, 10.0)))
    Files.writeString(Paths.get(capture, "poll_b.json"),
      payload(1700000010L, st("a1", 10.1, 10.1, 55.0)))

    runToDrain(capture, out, ckpt)
    val first = spark.read.parquet(out)
    assert(first.count() == 3, "2 + 1 states across the two polls")
    assert(first.select("poll_time").distinct().count() == 2,
      "each poll keeps its own payload time")
    assert(first.filter(col("velocity") === 50.0).count() == 1)

    // the spool made the batches durable: every consumed poll is on disk
    val spooled = Files.list(Paths.get(ckpt, "sources", "0", "spool")).count()
    assert(spooled >= 2, s"expected both polls spooled, saw $spooled")

    // restart with the same checkpoint + one NEW captured poll: only the
    // new poll is processed (offsets recovered from spool, no re-reads)
    Files.writeString(Paths.get(capture, "poll_c.json"),
      payload(1700000020L, st("c3", 20.0, 20.0, 30.0), st("d4", 20.3, 20.3, 40.0)))
    runToDrain(capture, out, ckpt)
    val second = spark.read.parquet(out)
    assert(second.count() == 5, "3 prior + 2 new states, nothing duplicated")
    assert(second.filter(col("icao24") === "c3").count() == 1)
  }

  test("restart recovers from a pruned spool (nextN from the last index, not the listing length)") {
    val capture = tmpDir("poll_prune_capture")
    val out = tmpDir("poll_prune_out")
    val ckpt = tmpDir("poll_prune_ckpt")
    Files.writeString(Paths.get(capture, "poll_a.json"),
      payload(1700000000L, st("a1", 10.0, 10.0, 50.0)))
    Files.writeString(Paths.get(capture, "poll_b.json"),
      payload(1700000010L, st("b2", 10.3, 10.3, 10.0)))
    runToDrain(capture, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)
    // simulate commit-time pruning: drop the OLDEST spool entry (the
    // committed prefix); the newest must carry recovery
    val spool = Paths.get(ckpt, "sources", "0", "spool")
    val oldest = Files.list(spool).sorted().findFirst().get()
    Files.delete(oldest)
    Files.writeString(Paths.get(capture, "poll_c.json"),
      payload(1700000020L, st("c3", 20.0, 20.0, 30.0)))
    runToDrain(capture, out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3, "2 prior + 1 new, nothing duplicated or re-read")
    assert(rows.filter(col("icao24") === "c3").count() == 1)
  }

  test("dir-mode watermark: a late file sorting below consumed names is skipped, never double-read") {
    val capture = tmpDir("poll_wm_in")
    val out = tmpDir("poll_wm_out")
    val ckpt = tmpDir("poll_wm_ckpt")
    Files.writeString(Paths.get(capture, "poll_b.json"),
      payload(1700000000L, st("b1", 1, 1, 1)))
    runToDrain(capture, out, ckpt)
    assert(spark.read.parquet(out).count() == 1)

    // arrives late, sorts BEFORE the consumed poll_b.json: the watermark
    // (file-source convention) skips it deterministically — the broken
    // alternative was positional indexing, which would re-read poll_b
    // and never read poll_z
    Files.writeString(Paths.get(capture, "poll_a.json"),
      payload(1700000010L, st("a9", 2, 2, 2)))
    Files.writeString(Paths.get(capture, "poll_z.json"),
      payload(1700000020L, st("z1", 3, 3, 3)))
    runToDrain(capture, out, ckpt)
    val got = spark.read.parquet(out).select("icao24").collect().map(_.getString(0)).toSet
    assert(got == Set("b1", "z1"), s"poll_a skipped, poll_z consumed once: $got")
  }

  test("unified streaming ingest: three source kinds, one query, one provenance-partitioned store") {
    val simDir = tmpDir("uni_sim")
    val pollDir = tmpDir("uni_poll")
    val csvDir = tmpDir("uni_csv")
    val out = tmpDir("uni_out")
    val ckpt = tmpDir("uni_ckpt")

    // leg 1 (simulation twin): JSONL wire rows through the file stream
    Files.writeString(Paths.get(simDir, "b.jsonl"),
      """{"vehicle_id":"1","timestamp":"2026-03-01 08:00:00","current_speed_kmh":"80","speed_limit_violation":"true"}""" + "\n" +
      """{"vehicle_id":"2","timestamp":"2026-03-01 08:00:01","current_speed_kmh":"40","speed_limit_violation":"false"}""" + "\n")
    // leg 2 (live poller): a captured payload through the V2 poll source
    Files.writeString(Paths.get(pollDir, "poll.json"),
      payload(1764576000L, st("a1", 10.0, 10.0, 50.0)))
    // leg 3 (CSV replay): a headered CSV through the streaming csv reader
    Files.writeString(Paths.get(csvDir, "r.csv"),
      "vehicle_id,timestamp,current_speed_kmh\n7,2026-03-01 09:00:00,33\n")

    val simLeg = Pipeline.telemetryFileStream(spark, simDir)
    val pollLeg = graft.sources.OpenSkyMap.toTelemetry(
      OpenSkyPoll.stateStream(spark, "dir", pollDir),
      asOf = lit("2026-03-01 10:00:00").cast("timestamp"))
    val csvLeg = graft.sources.FileReplay.normalize(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vehicle_id", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("current_speed_kmh", org.apache.spark.sql.types.StringType))))
        .option("header", "true").csv(csvDir),
      asOf = lit("2026-03-01 10:00:00").cast("timestamp"))

    Pipeline.runUnifiedIngest(spark,
      Seq("simulation" -> simLeg, "opensky" -> pollLeg, "file_replay" -> csvLeg),
      out, ckpt).awaitTermination()

    val back = spark.read.parquet(out)
    val byMode = back.groupBy("source_mode").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMode == Map("simulation" -> 2L, "opensky" -> 1L, "file_replay" -> 1L), s"got $byMode")
    // provenance is a PARTITION column: per-mode reads prune directories
    val modeDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).toSet
    assert(modeDirs.exists(_.contains("source_mode=opensky")), s"layout: $modeDirs")
    assert(back.filter(col("source_mode") === "opensky").head().getAs[Double]("current_speed_kmh") == 180.0)
  }

  test("per-poll truncation applies within each poll independently") {
    val capture = tmpDir("poll_trunc_in")
    val out = tmpDir("poll_trunc_out")
    val ckpt = tmpDir("poll_trunc_ckpt")
    Files.writeString(Paths.get(capture, "p1.json"),
      payload(1700000000L, st("a1", 1, 1, 1), st("b2", 2, 2, 2), st("c3", 3, 3, 3)))
    Files.writeString(Paths.get(capture, "p2.json"),
      payload(1700000010L, st("d4", 4, 4, 4), st("e5", 5, 5, 5), st("f6", 6, 6, 6)))
    val q = OpenSkyPoll.stateStream(spark, "dir", capture, maxVehicles = 2)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(out).select("icao24").collect().map(_.getString(0)).toSet
    assert(got == Set("a1", "b2", "d4", "e5"),
      "states[:2] per poll, not per stream")
  }
}
