package graft.sinks

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch sinks — the write side of the pipeline (SURVEY §2.1 S7–S9).
  *
  * The engine's canonical store is time-partitioned parquet (the Spark
  * analog of the reference's TimescaleDB hypertable chunking,
  * sql/01_schema.sql:22–69): day partitions give Catalyst partition
  * pruning on every `time >` predicate. JDBC and CSV are compatibility
  * sinks mirroring reference db.py:67–129 and scripts/export_results.py.
  */
object Sinks {

  /** Day-partitioned parquet table. Partitioning column is derived, so the
    * data keeps its full-resolution `time`; at 100 TB each day directory
    * splits into many files sized by the writer's task parallelism.
    */
  def writePartitioned(df: DataFrame, path: String, timeCol: String = "time",
      mode: String = "append"): Unit =
    df.withColumn("p_date", to_date(col(timeCol)))
      .write.mode(mode).partitionBy("p_date").parquet(path)

  /** CSV export (reference export_results.py:31–75): single headered file
    * per result, for dashboard-sized frames only — `coalesce(1)` funnels
    * the result through one task, which is the point for a hand-off file
    * and wrong for anything large.
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** JDBC batch sink (reference db.py:67–129: execute_values pages of 500,
    * per-batch transaction). `batchsize` maps the page size; per-partition
    * transactions and retries are the driver's (JDBC connector's) concern.
    * Not executable in this environment (no database) — the streaming and
    * verify paths use parquet.
    */
  def writeJdbc(df: DataFrame, url: String, table: String, user: String,
      password: String, batchSize: Int = 500): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }
}
