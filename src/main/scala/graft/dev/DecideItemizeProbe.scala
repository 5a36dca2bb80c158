package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.{Admission, LangId, TextOps, VectorOps}

/** Itemization of `Admission.decide`'s store probes (VERDICT r14 #5:
  * decide grew 3.05 s (x100) → 18.4 s (x1000) at a FIXED 1,000-doc
  * batch — name which store lookup breaks the batch bound). Each leg
  * below is timed as its own job against the same seeded state the
  * AdmissionProbe uses, so the wall splits into per-store shapes:
  *
  *   cdc      — batch LEFT JOIN hash store BY doc_id (store scanned,
  *              batch broadcast);
  *   hdist    — `st.hashes.select(h).distinct()` (the exact-dup screen's
  *              build side: a corpus-sized EXCHANGE, the one
  *              corpus-proportional shuffle in decide);
  *   ndprobe  — lexical near-dup probe against the stored inverted
  *              index (posting scan, keyed join);
  *   embprobe — IVF probe against the stored vector index (cell scan).
  *
  *   sbt "runMain graft.dev.DecideItemizeProbe /root/repo/tmp_scale x100,x1000 3"
  */
object DecideItemizeProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/repo/tmp_scale")
    val scales = (if (args.length > 1) args(1) else "x100,x1000").split(',')
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = graft.Sessions.local()
    import s.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    scales.foreach { sc =>
      val d = s"$root/$sc"
      val state = java.nio.file.Files
        .createTempDirectory("graft_decprobe").toString + "/state"
      Admission.cloneSeededState(s, d, state)
      val st = Admission.readDedupState(s, state)
      val batch = graft.sources.Tables.documents(s, d)
        .filter($"doc_id" < 1000)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"source",
          $"lang", $"text")
        .withColumn("embedding", lit(null).cast("array<float>"))
        .localCheckpoint()
      val b = Admission.normalize(batch)
        .withColumn("h", md5(coalesce($"text", lit(""))))
        .localCheckpoint()
      val legs: Seq[(String, () => Unit)] = Seq(
        "cdc" -> (() => noop(b.join(
          st.hashes.select($"doc_id", $"h".as("h_stored")),
          Seq("doc_id"), "left"))),
        "hdist" -> (() => noop(b.join(
          st.hashes.select($"h").distinct(), Seq("h"), "left_semi"))),
        "ndprobe" -> (() => noop(TextOps.dedupAgainstIndex(
          b.select($"doc_id", $"text"), st.idx, 0.5))),
        "embprobe" -> (() => noop(VectorOps.dedupVecAgainstIndex(
          b.filter($"embedding".isNotNull)
            .select($"doc_id".as("vec_id"), $"embedding"), st.vecIdx, 0.4))))
      val keep = s.sparkContext.getPersistentRDDs.keySet
      val best = legs.map { case (name, run) =>
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          run()
          s.sparkContext.getPersistentRDDs
            .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
          (System.nanoTime() - t0) / 1e9
        }
        name -> ts.min
      }
      println(f"[decitem] $sc%-5s " +
        best.map { case (n, t) => f"$n=$t%7.3f s" }.mkString("  "))
    }
    s.stop()
  }
}
