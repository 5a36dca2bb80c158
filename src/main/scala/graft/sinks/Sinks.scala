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

  /** Small-file compaction for a parquet table: rewrite to
    * ceil(bytes / targetFileBytes) files (per partition directory when
    * `partitionCols` is set), preserving rows and partitioning. Streaming
    * micro-batch sinks accrete one-file-per-trigger; at 100 TB unmanaged
    * small files dominate scan planning time, and periodic compaction is
    * the standard remedy. Write-to-temp + swap keeps readers from seeing
    * a half-rewritten table (not transactional — that's a table format's
    * job — but never observably empty).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val raw = spark.read.parquet(path)
    // hash-repartition ON the partition columns, or a bare round-robin
    // spreads every table partition's rows over all tasks and partitionBy
    // then writes up to nFiles files per directory — the opposite of
    // compaction
    val df =
      if (partitionCols.nonEmpty) raw.repartition(nFiles, partitionCols.map(col): _*)
      else raw.repartition(nFiles)
    val tmp = path.stripSuffix("/") + "__compacting"
    val old = path.stripSuffix("/") + "__precompact"
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    // swap via rename-aside: the live path is missing only between the
    // two renames (not during the whole rewrite), and a crash leaves the
    // data recoverable at one of the suffixed paths
    fs.delete(new Path(old), true)
    if (!fs.rename(new Path(path), new Path(old)))
      throw new java.io.IOException(s"compaction rename-aside failed: $path -> $old")
    if (!fs.rename(new Path(tmp), new Path(path))) {
      fs.rename(new Path(old), new Path(path)) // restore
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(new Path(old), true)
  }

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
