package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): run every declared query on
  * `SPARK_GRAFT_SF_DIR` and emit ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - a warmup pass runs every query once at sf0.001 first, so JIT /
  *    codegen / executor startup cost doesn't land on whichever query
  *    happens to run first in the measured pass;
  *  - each measured query is fully executed through a `noop`-format write
  *    (every output column is materialized — `.count()` would let Catalyst
  *    prune projections and under-report);
  *  - failures are NOT swallowed into a fake timing: a failed query is
  *    reported as -1 with its name in `failed`, and the process exit code
  *    is non-zero so a broken round shows up red, not "fast".
  */
object Bench {
  private def runOnce(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String): Either[String, Unit] =
    try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); Right(()) }
    catch { case e: Throwable => Left(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}") }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local()

    // warmup must not silently no-op (a missing warm dir would hand the
    // first measured query all the JIT/codegen startup cost)
    val warmFailures = SparkEntry.queries.toSeq
      .flatMap { case (name, fn) => runOnce(spark, name, fn, warmDir).left.toOption }
    if (warmFailures.nonEmpty)
      System.err.println(s"[bench] WARNING: ${warmFailures.size} warmup failures " +
        s"(warm dir $warmDir) — first measured timings may include startup cost; " +
        s"first: ${warmFailures.head}")

    // best-of-2: single-run timings on this box vary ±50% (JIT, page
    // cache); the minimum is the stable estimate of plan cost
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = runOnce(spark, name, fn, sfDir)
        (r, (System.nanoTime() - t0) / 1e9)
      }
      times.collectFirst { case (Left(err), _) => err } match {
        case Some(err) =>
          System.err.println(s"[bench] FAIL $err"); failed ::= name; name -> -1.0
        case None => name -> times.map(_._2).min
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
