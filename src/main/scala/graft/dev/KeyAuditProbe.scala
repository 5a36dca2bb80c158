package graft.dev

import graft.Sessions
import org.apache.spark.sql.functions._

/** Collision audit for the r15 gram-key narrowing (VERDICT r14 #3):
  * q65/q86 key word-8-grams by `TextOps.gram8Keys` (xxhash64 over the
  * 8-word tuple, 8 bytes) while the oracles key by md5(gram-string)
  * (128 bit). The results are identical iff the xxhash64 key is
  * injective over the corpus's DISTINCT grams — any collision would
  * merge two grams' df counts and surface as a wrong n_dup_spans /
  * flagged-position set.
  *
  * This probe computes, in one pass over a corpus:
  *   - distinct md5(gram-string) keys   (the oracle identity),
  *   - distinct xxhash64-tuple keys     (the engine identity),
  *   - distinct (md5, xx64) PAIRS.
  * All three equal  ⇔  the two key spaces are bijective on this corpus
  * ⇔ zero collisions (in either direction). Run at the largest corpus
  * on hand (x1000) — the driver SFs are additionally covered by the
  * oracle hash gate itself.
  *
  *   sbt "runMain graft.dev.KeyAuditProbe /root/repo/tmp_scale/x1000"
  */
object KeyAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    import s.implicits._
    val t0 = System.nanoTime()
    // zip the r14 oracle-identity keys with the ACTUAL production
    // expression (TextOps.gram8Keys), position by position — auditing a
    // re-implementation would prove nothing about the shipped code
    val pairs = graft.sources.Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 8)
      .select(explode(arrays_zip(
        transform(sequence(lit(0), size($"ws") - 8),
          i => unhex(md5(concat_ws(" ", slice($"ws", i + 1, lit(8)))))),
        graft.queries.TextOps.gram8Keys($"ws"))).as("g"))
      .select($"g.0".as("m"), $"g.1".as("x"))
    val r = pairs.agg(
      count_distinct($"m").as("n_md5"),
      count_distinct($"x").as("n_xx64"),
      count_distinct($"m", $"x").as("n_pairs")).head()
    val (nm, nx, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val verdict = if (nm == nx && nx == np) "BIJECTIVE (zero collisions)"
                  else "COLLISION DETECTED — fall back to the md5 key"
    println(f"[keyaudit] dir=$dir distinct_md5=$nm distinct_xx64=$nx " +
      f"distinct_pairs=$np  $verdict  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    s.stop()
    if (!(nm == nx && nx == np)) sys.exit(1)
  }
}
