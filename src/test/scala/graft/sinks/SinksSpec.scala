package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("CSV export round-trips a metric frame with header") {
    import spark.implicits._
    val df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "k", "v")
    val dir = tmpDir("csv_out") + "/export"
    Sinks.exportCsv(df, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.columns.toSeq == Seq("id", "k", "v"))
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq == Seq(1.5, 2.5))
    // single output file (coalesce(1))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".csv")) == 1)
  }

  test("compaction collapses small files, preserves rows and partitioning") {
    val dir = tmpDir("compact") + "/t"
    val tel = graft.sources.Simulation.telemetry(spark, 4, 50, seed = 3).toDF()
    // three appends at full parallelism -> many small files
    (1 to 3).foreach(_ => Sinks.writePartitioned(tel, dir))
    def parquetFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles.size
    val rows = spark.read.parquet(dir).count()
    Sinks.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024,
      partitionCols = Seq("p_date"))
    assert(parquetFiles.size < before)
    assert(parquetFiles.size == 1, "600 tiny rows fit one target-size file")
    val after = spark.read.parquet(dir)
    assert(after.count() == rows)
    assert(after.columns.contains("p_date"), "partition column survives")
  }

  test("compaction rescues files appended by a concurrent writer") {
    val dir = tmpDir("compact_race") + "/t"
    val tel = graft.sources.Simulation.telemetry(spark, 4, 50, seed = 7).toDF()
    (1 to 2).foreach(_ => Sinks.writePartitioned(tel, dir))
    val base = spark.read.parquet(dir).count()
    // the seam fires after the compactor pins its file list == a streaming
    // sink appending mid-rewrite; those rows must survive the swap
    Sinks.compactImpl(spark, dir, 64L * 1024 * 1024, Seq("p_date"),
      () => Sinks.writePartitioned(tel, dir))
    val after = spark.read.parquet(dir)
    assert(after.count() == base + tel.count(),
      "rows appended during compaction must not be deleted with __precompact")
    assert(!new java.io.File(dir + "__precompact").exists())
    assert(!new java.io.File(dir + "__compacting").exists())
  }

  test("partitioned parquet sink prunes by day") {
    val tel = graft.sources.Simulation.telemetry(spark, 2, 10, seed = 1,
      startMillis = 1700000000000L).toDF()
    val dir = tmpDir("pq_out") + "/telemetry"
    Sinks.writePartitioned(tel, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 20)
    val pruned = back.filter(col("p_date") === to_date(lit("2023-11-14")))
    // all simulated rows land on 2023-11-14 (epoch 1700000000)
    assert(pruned.count() == 20)
    assert(back.filter(col("p_date") === to_date(lit("1999-01-01"))).count() == 0)
  }
}
