package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) two-dimensional data layout + box-query reader
  * — the multi-dimensional generalization of [[Sinks.writePartitioned]]'s
  * one-dimensional time chunking.
  *
  * Sibling of [[Sinks.writeZOrdered]] and deliberately different in
  * mechanism: that operator CLUSTERS files along the curve (quantile
  * buckets, range-disjoint sorted files) and lets ordinary per-column
  * predicate pushdown exploit the tightened min/max stats — no special
  * reader, any filter benefits. THIS module materializes the curve as
  * explicit partition DIRECTORIES plus a covering-cell reader, which
  * buys a provable pruning contract (the exact partition count a box
  * reads is plan-asserted, and q105's oracle pins that pruning loses
  * nothing) at the price of directory-listing overhead. ZOrderBench
  * measures both against a 1-D sort; prefer the clustered form as the
  * default and this form where directory-level isolation matters
  * (per-cell retention/deletes, listing absorbed by a catalog).
  *
  * Day partitioning prunes `time` predicates and nothing else; a query
  * box over TWO selective columns (the reference's dashboards filter
  * vehicle AND time — dashboard.py's per-vehicle windows; the analog
  * here is (user_id, value) over events) scans every partition under any
  * single-column layout. Interleaving the bits of both columns' cell
  * coordinates makes directory prefixes axis-aligned rectangles, so a
  * box query touches only the covering cells: at 16×16 cells a 25%×25%
  * box reads ~1/16 of the store instead of 1/4 (1-D) or 1/1 (unsorted).
  *
  * Layout contract:
  *  - each column is linearly quantized to a `bits`-bit cell coordinate
  *    over its observed [min, max] (the 1-row agg is the only extra
  *    pass); `p_z` = bit-interleaved (Morton) cell id, a LONG partition
  *    column with at most 2^(2·bits) values;
  *  - quantization bounds + column names persist in a 1-row parquet
  *    sidecar under `_zmeta` (underscore-prefixed ⇒ invisible to
  *    partition discovery, same convention as `_SUCCESS`);
  *  - [[boxQuery]] quantizes the box corners with the SAME affine map,
  *    enumerates the covering cell ids driver-side (bounded by the cell
  *    grid, 2^(2·bits) ≤ 4096 at the default 6 bits — a few-element IN
  *    list in practice), prunes partitions through `p_z IN (...)`, and
  *    re-applies the exact box predicate as the residual filter — the
  *    result is layout-independent (q105's DuckDB oracle never sees the
  *    layout), pruning is pure I/O savings.
  *
  * At 100 TB: `bits` sizes directories, not correctness — pick it so a
  * cell holds O(executor-batch) bytes (e.g. 8 bits ⇒ 65 536 cells ⇒
  * ~1.5 GB cells at 100 TB). Quantizing over min/max assumes roughly
  * uniform mass; heavily skewed columns want rank quantization (q54's
  * decile device) feeding the same interleave — the layout contract and
  * reader are unchanged, only the cell map differs.
  */
object ZOrder {

  /** Morton interleave of the low `bits` of two non-negative longs:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Composed
    * from builtin shift/mask ops — 4·bits codegen'd integer ops per row,
    * whole-stage-friendly, no custom kernel needed.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i))
    }

  /** The affine cell map, shared verbatim (same operation order, same
    * IEEE arithmetic) by the write-side Column form and the read-side
    * driver form, so box corners and data rows quantize consistently. */
  private def cellCol(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val k = (1L << bits).toDouble
    val span = hi - lo
    if (span <= 0) lit(0L)
    else least(greatest(floor((c.cast("double") - lo) / span * k), lit(0.0)),
      lit(k - 1.0)).cast("long")
  }

  private def cellVal(v: Double, lo: Double, hi: Double, bits: Int): Long = {
    val k = (1L << bits).toDouble
    val span = hi - lo
    if (span <= 0) 0L
    else math.min(math.max(math.floor((v - lo) / span * k), 0.0), k - 1.0).toLong
  }

  /** Write `df` as a z-ordered parquet store partitioned by the Morton
    * cell of (`colA`, `colB`). One extra 1-row aggregate for the bounds;
    * `repartition(p_z)` gives one write task per cell so every partition
    * directory is a contiguous write; `sortWithinPartitions(p_z)`
    * clusters rows by cell id within a task so each cell writes as one
    * file (p_z is constant inside a cell — there is deliberately no
    * intra-cell ordering; the locality unit is the cell itself). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      bits: Int = 6): Unit = {
    require(bits >= 1 && bits <= 12, s"bits=$bits outside [1,12]")
    val s = df.sparkSession
    import s.implicits._
    // NaN-safe bounds: Spark's max() treats NaN as the largest double, so
    // one NaN row would poison aHi/span and silently re-map every cell
    // (boxQuery would then prune to the wrong cells and return empty).
    // NaN rows themselves are harmless — they land deterministically in
    // the top cell and can never satisfy a finite box's residual filter.
    def nanSafe(c: Column): Column = {
      val d = c.cast("double")
      when(isnan(d), lit(null)).otherwise(d)
    }
    val r = df.agg(
      min(nanSafe(col(colA))), max(nanSafe(col(colA))),
      min(nanSafe(col(colB))), max(nanSafe(col(colB)))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"writeZOrdered: empty input or all-null layout column ($colA/$colB) " +
        "— no quantization bounds exist")
    val (aLo, aHi, bLo, bHi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    df.withColumn("p_z", interleave(
        cellCol(col(colA), aLo, aHi, bits),
        cellCol(col(colB), bLo, bHi, bits), bits))
      .repartition(col("p_z"))
      .sortWithinPartitions(col("p_z"))
      .write.mode("overwrite").partitionBy("p_z").parquet(path)
    Seq((colA, aLo, aHi, colB, bLo, bHi, bits))
      .toDF("col_a", "a_lo", "a_hi", "col_b", "b_lo", "b_hi", "bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zmeta")
  }

  private case class ZMeta(colA: String, aLo: Double, aHi: Double,
      colB: String, bLo: Double, bHi: Double, bits: Int)

  private def readMeta(s: SparkSession, path: String): ZMeta = {
    val r = s.read.parquet(s"$path/_zmeta").head()
    ZMeta(r.getString(0), r.getDouble(1), r.getDouble(2),
      r.getString(3), r.getDouble(4), r.getDouble(5), r.getInt(6))
  }

  /** The covering cell ids of a query box: the product of the two cell
    * ranges the (clamped) box corners quantize to. Monotonicity of the
    * affine map guarantees every in-box row's cell is inside the
    * product, so `p_z IN (covering)` never drops a row — the residual
    * exact predicate only trims cell-boundary overshoot. */
  private def coveringCells(m: ZMeta, aLo: Double, aHi: Double,
      bLo: Double, bHi: Double): Seq[Long] =
    for {
      ca <- cellVal(aLo, m.aLo, m.aHi, m.bits) to cellVal(aHi, m.aLo, m.aHi, m.bits)
      cb <- cellVal(bLo, m.bLo, m.bHi, m.bits) to cellVal(bHi, m.bLo, m.bHi, m.bits)
    } yield {
      var z = 0L
      var i = 0
      while (i < m.bits) {
        z |= ((ca >> i) & 1L) << (2 * i + 1)
        z |= ((cb >> i) & 1L) << (2 * i)
        i += 1
      }
      z
    }

  /** Closed-box query over a [[writeZOrdered]] store: partition-prunes to
    * the covering cells, then applies the exact box predicate. Output is
    * layout-independent (minus the derived `p_z` column, dropped). */
  def boxQuery(s: SparkSession, path: String, aLo: Double, aHi: Double,
      bLo: Double, bHi: Double): DataFrame = {
    val m = readMeta(s, path)
    val base = s.read.parquet(path)
    // a broad box at high `bits` can cover millions of cells — a
    // driver-side Seq + InSet that costs more than the pruning saves
    // (and a box covering most cells prunes almost nothing anyway).
    // The cell COUNT is checked from the four corner quantizations
    // BEFORE materializing anything; past the cap, skip the partition
    // filter: the residual predicate alone is exact, so the result is
    // unchanged — only the I/O saving degrades to the full scan such a
    // box reads regardless
    val nA = cellVal(aHi, m.aLo, m.aHi, m.bits) - cellVal(aLo, m.aLo, m.aHi, m.bits) + 1
    val nB = cellVal(bHi, m.bLo, m.bHi, m.bits) - cellVal(bLo, m.bLo, m.bHi, m.bits) + 1
    val pruned =
      if (nA * nB <= 65536)
        base.filter(col("p_z").isInCollection(coveringCells(m, aLo, aHi, bLo, bHi)))
      else base
    pruned
      .filter(col(m.colA).cast("double").between(aLo, aHi) &&
        col(m.colB).cast("double").between(bLo, bHi))
      .drop("p_z")
  }

}
