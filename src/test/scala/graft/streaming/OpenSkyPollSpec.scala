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
