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
