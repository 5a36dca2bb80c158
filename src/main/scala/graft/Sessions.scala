package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration, shared by Verify,
  * Bench, and the test suites.
  *
  * - shuffle partitions sized to local cores (the 200 default is wrong for
  *   local mode; on a real cluster this is set per-deployment);
  * - AQE on: runtime coalescing, skew-join splitting, broadcast demotion;
  * - UTC session time zone (oracle parity — FIXTURES.md);
  * - `nanosAsLong`: the driver testdata's `events.ts` is parquet
  *   TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
  *   ([PARQUET_TYPE_ILLEGAL]); reading it as a long and converting in
  *   [[graft.sources.Tables.events]] keeps the scan vectorized.
  */
object Sessions {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Cores default to the whole machine (the deployment target is
    * local[32] — builder brief); `SPARK_GRAFT_CPUS` caps it for
    * reproducible smaller runs (the verify loop uses 8).
    */
  def local(cores: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())): SparkSession = {
    val spark = builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.register(spark)
    spark
  }
}
