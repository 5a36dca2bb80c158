package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.Admission

/** Evidence harness for the compaction-frequency amortization claim
  * (VERDICT r13 #3): the tombstone ledger's whole point is that ONE
  * `compactAdmissionState` store rewrite folds MANY accumulated
  * takedown/revision batches, so the per-batch amortized cost falls
  * ∝ 1/N toward the floor of one rewrite. SCALE.md asserted it; this
  * measures it.
  *
  * Per N ∈ `ns`: clone the per-JVM seeded state artifact (untimed, the
  * deployment's one-time cost), append N ledger batches of 1,000
  * DISJOINT stored ids each (real store rows — doc_id % 10 < 8 — so
  * every store family anti-joins true victims and the BM25/card
  * recomputes see a genuinely shrunken corpus), then time ONE
  * compactAdmissionState pass over the whole ledger. Reported:
  * total fold seconds (min of reps) and total/N, the per-batch
  * amortized bill.
  *
  *   sbt "runMain graft.dev.CompactionProbe /root/repo/tmp_scale x100 1,10,100 3"
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/repo/tmp_scale")
    val scale = args.lift(1).getOrElse("x100")
    val ns = args.lift(2).getOrElse("1,10,100").split(',').map(_.toInt).toSeq
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val s = graft.Sessions.local()
    import s.implicits._
    val d = s"$root/$scale"
    val docs = graft.sources.Tables.documents(s, d)
    val nCorpus = docs.count()
    // disjoint 1,000-victim batches: batch b takes the stored ids in
    // [b·1250, (b+1)·1250) — exactly 1,000 of each 1,250-id stripe are
    // stored under the % 10 < 8 split
    val maxN = ns.max
    require(maxN * 1250L < nCorpus, s"corpus too small for $maxN batches")
    val stored = docs.select($"doc_id")
      .filter($"doc_id" % 10 < 8 && $"doc_id" < maxN * 1250L)
      .localCheckpoint()
    // per-rep cleanup must not evict the shared victim snapshot
    // (AdmissionProbe's keep-set rule)
    val keep = s.sparkContext.getPersistentRDDs.keySet
    def dropRepRdds(): Unit = s.sparkContext.getPersistentRDDs
      .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
    ns.foreach { n =>
      val times = (1 to reps).map { _ =>
        val state = java.nio.file.Files
          .createTempDirectory("graft_cprobe").toString + "/state"
        Admission.cloneSeededState(s, d, state)
        (0 until n).foreach { b =>
          stored.filter($"doc_id" >= b * 1250L && $"doc_id" < (b + 1) * 1250L)
            .write.mode("overwrite").parquet(s"$state/tombstones/batch=${100 + b}")
        }
        val t0 = System.nanoTime()
        graft.streaming.Pipeline.compactAdmissionState(s, state)
        val sec = (System.nanoTime() - t0) / 1e9
        dropRepRdds()
        sec
      }
      val best = times.min
      println(f"[cprobe] $scale%-5s corpus=$nCorpus%7d n_batches=$n%3d " +
        f"victims=${n * 1000}%6d  fold=$best%7.3f s  per_batch=${best / n}%7.3f s" +
        f"  (all: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    s.stop()
  }
}
