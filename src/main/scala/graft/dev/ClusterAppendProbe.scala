package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Evidence harness for q135's cost claim (dev tool): incremental
  * cluster maintenance must cost ∝ SNAPSHOT size, not corpus size.
  *
  * The q135 query itself can't show this — its `%10 >= 8` split makes
  * the "snapshot" 20% of whatever corpus it runs on. This probe holds
  * the snapshot FIXED (1,000 docs: copies of stored docs 0..999 shifted
  * to fresh ids, so every one has a guaranteed stored near-duplicate and
  * the touched-component path does real work) while the corpus grows
  * x1 → x10 → x100, and times ONLY the serving legs a daily append pays:
  * index probe (new×old pairs), snapshot-internal LSH, and
  * appendToClusters. Artifacts (full-corpus clustering + full-corpus
  * MinHash index) are built outside the timer — they are the one-time
  * cost the incremental path exists to amortize.
  *
  *   sbt "runMain graft.dev.ClusterAppendProbe /root/repo/tmp_scale x1,x10,x100 3"
  */
object ClusterAppendProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val scales = (if (args.length > 1) args(1) else "x1,x10,x100").split(',')
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = graft.Sessions.local()
    import s.implicits._
    scales.foreach { sc =>
      val d = s"$root/$sc"
      val docs = graft.sources.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val nCorpus = docs.count()
      // artifacts, untimed: "yesterday's" full-corpus labeling + index
      val labels = TextOps.dedupClustersCached(s, d).localCheckpoint()
      val shingled = TextOps.shingleDocs(docs).persist()
      val idx = try {
        val built = TextOps.buildMinHashIndex(shingled)
        graft.queries.TextOps.MinHashIndex(
          built.bands.localCheckpoint(), built.shingles.localCheckpoint())
      } finally shingled.unpersist()
      // fixed 1,000-doc snapshot: stored docs 0..999 under fresh ids —
      // every snapshot doc has an exact stored duplicate, so admission
      // and the touched-component merge both do real work
      val snapshot = docs.filter($"doc_id" < 1000)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"text")
        .localCheckpoint()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val newOld = TextOps.dedupAgainstIndex(snapshot, idx)
          .select($"new_doc_id".as("u"), $"old_doc_id".as("v"))
        val fresh = TextOps.shingleDocs(snapshot).persist()
        val newNew =
          try TextOps.nearDupPairsLshFromShingled(fresh)
            .select($"i".as("u"), $"j".as("v"))
          finally fresh.unpersist()
        val n = TextOps.appendToClusters(labels, newOld.unionByName(newNew)).count()
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, n)
      }
      println(f"[capp] $sc%-5s corpus=$nCorpus%7d snapshot=1000 labeled=${times.head._2}%7d " +
        s"serve=[${times.map(t => f"${t._1}%.2f").mkString(" ")}] s")
    }
    s.stop()
  }
}
