package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.LangId

/** Leg-by-leg timing of q149's lifecycle (dev tool): which of
  * append / remove / refit / compile / score carries the wall-clock,
  * so the optimization lands on the measured leg instead of a guess.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.dev.NbUnlearnProbe 3"
  */
object NbUnlearnProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val s = graft.Sessions.local()
    import s.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[nbprobe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"[nbprobe] === rep $i")
      val docs = graft.sources.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val raw = t("raw(cached)")(LangId.nbRawCached(s, d))
      val appended = t("append")(LangId.appendToNbRaw(raw,
        docs.filter($"doc_id" % 10 === 8).select($"doc_id", $"lang", $"text")))
      val pruned = t("remove")(LangId.removeFromNbRaw(appended,
        docs.filter($"doc_id" % 7 === 0).select($"doc_id")))
      val m = t("refit")(LangId.nbModelOf(pruned))
      t("compile")(m.compiled)
      val test = t("test-ckpt")(docs.filter($"doc_id" % 10 === 9)
        .select($"doc_id", $"lang", $"text").localCheckpoint())
      t("score+agg") {
        LangId.langIdScoreDocs(test.select($"doc_id", $"text"), m)
          .join(test.select($"doc_id", $"lang"), Seq("doc_id"))
          .select($"lang", $"lang_pred")
          .groupBy($"lang", $"lang_pred").agg(count(lit(1)).as("n_docs"))
          .orderBy($"lang", $"lang_pred")
          .write.format("noop").mode("overwrite").save()
      }
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    s.stop()
  }
}
