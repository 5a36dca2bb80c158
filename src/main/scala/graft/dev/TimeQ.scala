package graft.dev

import graft.{Sessions, SparkEntry}

/** Single-query timing CLI for the optimization loop: run one declared
  * query N times through the bench's noop-sink execution and print each
  * run's seconds — isolates a query from the full Bench sweep so an
  * iteration cycle is seconds, not minutes.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.dev.TimeQ q18_neardup_jaccard 3"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQ <query> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val s = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(s, d).write.format("noop").mode("overwrite").save()
      // drop cached/localCheckpointed RDDs between reps (ScaleBench note:
      // accumulation across a sweep OOMed at large inputs)
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    s.stop()
  }
}
