package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join — the time-series operator Spark's
  * relational algebra lacks natively (QuestDB/kdb's `asof`, DuckDB's
  * `ASOF JOIN`, Flink's temporal table join): every probe row picks up
  * the reference row with the LARGEST time ≤ its own, per key.
  *
  * Spark-first shape (no custom physical operator needed): tag and union
  * the two sides, hash-partition by key, sort each partition by
  * (time, side) — reference before probe at equal times, so `>=`
  * semantics hold — and carry the last non-null reference struct forward
  * with a running `last(..., ignoreNulls)` over ROWS UNBOUNDED PRECEDING
  * (Spark evaluates that frame incrementally, O(n) per partition). Probe
  * rows then ARE their own join result. Cost: ONE shuffle of each side
  * on the key and a per-partition sort — exactly a sort-merge join's
  * exchange plan, with none of the per-key driver loops or theta-join
  * range explosions the naive encodings pay. Skew is bounded by per-key
  * row counts (the same contract as any keyed window).
  *
  * Contract: `time` is non-null on both sides and (key, time) is UNIQUE
  * on the reference side — callers dedup first (e.g. keep the max-id row
  * per (key, time)) so the picked row is deterministic; with duplicates
  * the within-tie choice would be partition-order-dependent.
  */
object AsofJoin {

  /** `probe` ⟕asof `ref` on `key`, backward in `time`: emits every probe
    * row with every reference column EXCEPT the key appended under
    * `prefix` (the reference's own time arrives as e.g. `asof_ts`), null
    * when the key has no reference row at or before the probe time. */
  def asofJoin(probe: DataFrame, ref: DataFrame, key: String, time: String,
      prefix: String = "asof_"): DataFrame = {
    val refCols = ref.columns.filter(_ != key).toSeq
    val refStruct: Column = struct(refCols.map(ref(_)): _*)
    val refStructType = ref.select(refStruct.as("r")).schema.head.dataType
    val probeCols = probe.columns.toSeq

    val refSide = ref.select(
      Seq(ref(key), ref(time).as("__asof_t"), lit(0).as("__asof_side")) ++
        probeCols.filter(_ != key).map(c =>
          lit(null).cast(probe.schema(c).dataType).as(c)) :+
        refStruct.as("__asof_ref"): _*)
    val probeSide = probe.select(
      Seq(probe(key), probe(time).as("__asof_t"), lit(1).as("__asof_side")) ++
        probeCols.filter(_ != key).map(probe(_)) :+
        lit(null).cast(refStructType).as("__asof_ref"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = refSide.unionByName(probeSide)
      .withColumn("__asof_carried", last(col("__asof_ref"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    carried.select(
      probeCols.map(col) ++
        refCols.map(c => col(s"__asof_carried.$c").as(s"$prefix$c")): _*)
  }
}
