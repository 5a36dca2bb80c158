package graft

/** Shared numeric reference implementations for specs — one copy, so two
  * suites can never pin contradictory semantics.
  */
object TestNum {

  /** Spark SQL `round(x)` semantics exactly: HALF_UP (away from zero),
    * applied to the double's SHORTEST-DECIMAL representation
    * (`BigDecimal.valueOf`, which is what Spark's Round uses) — NOT
    * `Math.round` (half toward +infinity: disagrees on negative exact
    * halves) and NOT `new BigDecimal(double)` (exact-binary: can differ
    * on values whose shortest print is shorter than their binary
    * expansion).
    */
  def sparkRound(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Full-matrix DTW reference (same recurrence + sentinel as the
    * `DtwDist` kernel and the q122 oracle). */
  def dtwNaive(a: Seq[Long], b: Seq[Long]): Long = {
    val Inf = 1000000000000000L
    val dp = Array.fill(a.length + 1, b.length + 1)(Inf)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(a.length)(b.length)
  }
}
