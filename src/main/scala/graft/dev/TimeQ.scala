package graft.dev

import graft.{Sessions, SparkEntry}

/** Single-query timing CLI for the optimization loop: run one declared
  * query N times through the bench's noop-sink execution and print each
  * run's seconds — isolates a query from the full Bench sweep so an
  * iteration cycle is seconds, not minutes.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.dev.TimeQ q18_neardup_jaccard 3"
  *
  * Optional 3rd arg `warmDir`: execute the SAME query once on that
  * (smaller) dataset first, untimed — a rep-1 attribution experiment
  * (VERDICT r13 #4). The warm run pays every DATA-INDEPENDENT
  * first-execution cost (JIT/C2 compilation of the kernel and codegen
  * classes, janino compilation, committer/Derby init) but none of the
  * measured SF's artifacts (IndexCache keys on the data dir), so
  *   rep1_cold − rep1_warm  = the JIT/codegen share of the rep-1 delta
  *   rep1_warm − best       = the measured SF's artifact share.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQ <query> [runs] [warmDir]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val s = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    // per-rep artifact itemization: IndexCache's own build timer, so a
    // rep's wall splits into (billed artifact builds) + (everything
    // else) with no estimation
    var artsBefore = graft.queries.IndexCache.buildSeconds
    def artDelta(): String = {
      val now = graft.queries.IndexCache.buildSeconds
      val delta = now.map { case (k, v) =>
        k -> (v - artsBefore.getOrElse(k, 0.0))
      }.filter(_._2 > 0.001)
      artsBefore = now
      if (delta.isEmpty) ""
      else delta.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=$v%.2f" }
        .mkString("  [artifacts: ", " ", f" | total=${delta.values.sum}%.2f s]")
    }
    args.lift(2).foreach { warmDir =>
      val t0 = System.nanoTime()
      fn(s, warmDir).write.format("noop").mode("overwrite").save()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[timeq] $name warm-up on $warmDir: ${(System.nanoTime() - t0) / 1e9}%.3f s (untimed rep)${artDelta()}")
    }
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(s, d).write.format("noop").mode("overwrite").save()
      // drop cached/localCheckpointed RDDs between reps (ScaleBench note:
      // accumulation across a sweep OOMed at large inputs)
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s${artDelta()}")
    }
    s.stop()
  }
}
