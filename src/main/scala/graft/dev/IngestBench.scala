package graft.dev

/** Isolated re-measurement of the bench's streaming-ingest leg (r6
  * VERDICT item 5: the full-sweep number dipped −10% in a run that also
  * logged 2× spreads on two queries — decide noise vs regression):
  * N reps of exactly [[graft.Bench.measureIngest]] in a quiet JVM, with
  * the same cached-RDD release between reps as TimeQ/ScaleBench. Rep 1
  * carries JIT/codegen warmup; the steady estimate is the max rows/s of
  * the later reps.
  *
  *   sbt "runMain graft.dev.IngestBench 4"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val s = graft.Sessions.local()
    (1 to reps).foreach { i =>
      val (rows, sec) = graft.Bench.measureIngest(s)
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[ingest] rep $i: rows=$rows sec=$sec%.3f rows_per_sec=${rows / sec}%.0f")
    }
    s.stop()
  }
}
