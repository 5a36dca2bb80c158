package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join == plain join on a pathologically hot key") {
    import spark.implicits._
    // 50k rows, 90% on one key — the shape AQE splits and salting spreads
    val probe = spark.range(50000)
      .select(when($"id" % 10 === 0, $"id" % 100).otherwise(7L).as("k"),
        $"id".as("v"))
    val build = spark.range(100).select($"id".as("k"), ($"id" * 10).as("w"))
    val plain = probe.join(build, Seq("k")).agg(
      count(lit(1)), sum($"v"), sum($"w")).head()
    val salted = SkewJoin.saltedJoin(probe, build, "k", factor = 16).agg(
      count(lit(1)), sum($"v"), sum($"w")).head()
    assert(salted == plain)
  }

  test("salt column does not leak into the output schema") {
    import spark.implicits._
    val probe = Seq((1L, "a"), (1L, "b")).toDF("k", "pv")
    val build = Seq((1L, "x")).toDF("k", "bv")
    val out = SkewJoin.saltedJoin(probe, build, "k", factor = 4)
    assert(out.columns.toSeq == Seq("k", "pv", "bv"))
    assert(out.count() == 2)
  }

  test("salted join spreads the hot key over multiple partitions") {
    import spark.implicits._
    val probe = spark.range(2000).select(lit(7L).as("k"), $"id".as("v"))
    val build = Seq((7L, "hot")).toDF("k", "w")
    val parts = SkewJoin.saltedJoin(probe, build, "k", factor = 8)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1, "single hot key must land on >1 post-join partition")
  }
}
