package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (builder brief: "salting for skew").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * is the deterministic fallback when one build-side key is so hot that
  * even split shuffle partitions overwhelm a task (the classic
  * null-key / power-law fact table).
  *
  * Mechanics: the probe (large, skewed) side gets a deterministic salt in
  * [0, factor) derived from hashing its whole row; the build side is
  * replicated `factor` times, once per salt value; the join key becomes
  * (key, salt), so the hot key's rows spread over `factor` tasks. Exact
  * same result set as the unsalted join (asserted in SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join `probe.key == build.key` with the probe side salted.
    * `factor` multiplies the build side — keep it small (8–64) and the
    * build side broadcast-sized or modest.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // deterministic per-row salt: hash of all probe columns; pmod keeps
    // it non-negative. Using row content (not rand()) keeps retries and
    // speculative tasks consistent.
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(factor)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
