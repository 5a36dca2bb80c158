package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.Admission

/** Evidence harness for the admission pipeline's 100 TB cost claim
  * (VERDICT r12 #5; Bm25AppendProbe's design applied to the composed
  * cascade): deciding + appending one arriving micro-batch must cost
  * ∝ BATCH (+ bounded index probes), NOT corpus — the q180/q181 query
  * rows can't show this because their %-split fixture batches grow
  * with the corpus.
  *
  * Here the arriving batch is FIXED at 1,000 docs (copies of stored
  * docs 0..999 under fresh ids, so they exercise the dedup probes
  * against real near-collisions) while the corpus grows x1 → x10 →
  * x100. Per scale it times, against the per-JVM seeded state artifact
  * (built OUTSIDE the timer — the deployment's one-time cost):
  *
  *  - `decide`: the full cascade verdict for the batch (CDC probe,
  *    NB quality, three eval screens, hash/MinHash/IVF probes);
  *  - `append`: the admitted survivors landing in all six stores;
  *  - `compact`: folding a 1,000-tombstone ledger into every store —
  *    the amortized per-compaction bill (this one IS corpus-
  *    proportional by design: one store rewrite).
  *
  *   sbt "runMain graft.dev.AdmissionProbe /root/repo/tmp_scale x1,x10,x100 3"
  */
object AdmissionProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/repo/tmp_scale")
    val scales = (if (args.length > 1) args(1) else "x1,x10,x100").split(',')
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = graft.Sessions.local()
    import s.implicits._
    scales.foreach { sc =>
      val d = s"$root/$sc"
      val nCorpus = graft.sources.Tables.documents(s, d).count()
      // seeded state + screens: the one-time deployment artifacts,
      // untimed (IndexCache-shared across reps)
      val scr = Admission.screens(s, d)
      val batch = graft.sources.Tables.documents(s, d)
        .filter($"doc_id" < 1000)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"source",
          $"lang", $"text")
        .withColumn("embedding", lit(null).cast("array<float>"))
        .localCheckpoint()
      val keep = s.sparkContext.getPersistentRDDs.keySet
      def dropRepRdds(): Unit = s.sparkContext.getPersistentRDDs
        .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
      val times = (1 to reps).map { _ =>
        val state = java.nio.file.Files
          .createTempDirectory("graft_admprobe").toString + "/state"
        Admission.cloneSeededState(s, d, state)
        val t0 = System.nanoTime()
        val dec = Admission.decide(batch,
          Admission.readDedupState(s, state), scr)
        val t1 = System.nanoTime()
        val admitted = Admission.normalize(batch).join(
          dec.filter($"status" === "admitted").select($"doc_id"),
          Seq("doc_id"), "left_semi")
        Admission.appendAdmitted(s, state, 0L, admitted)
        val t2 = System.nanoTime()
        // tombstone 1,000 REAL stored ids so the fold removes true
        // store rows (the appended fresh ids would anti-join their own
        // batch partition only)
        batch.select(($"doc_id" - 1000000000L).as("doc_id"))
          .write.mode("overwrite").parquet(s"$state/tombstones/batch=9")
        graft.streaming.Pipeline.compactAdmissionState(s, state)
        val t3 = System.nanoTime()
        val out = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        dropRepRdds()
        out
      }
      def best(f: ((Double, Double, Double)) => Double) = times.map(f).min
      println(f"[admprobe] $sc%-5s corpus=$nCorpus%7d batch=1000  " +
        f"decide=${best(_._1)}%7.3f s  append=${best(_._2)}%7.3f s  " +
        f"compact=${best(_._3)}%7.3f s")
    }
    s.stop()
  }
}
