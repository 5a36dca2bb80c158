package graft.dev

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Evidence harness for q137's cost claim (dev tool —
  * [[ClusterAppendProbe]]'s design applied to the retrieval artifact):
  * appending a snapshot to the raw BM25 postings store and serving a
  * bounded request set must cost ∝ SNAPSHOT + vocabulary + one postings
  * scan — NOT corpus re-tokenization.
  *
  * The q137 query's `%10` split can't show this (its "snapshot" is 20%
  * of whatever corpus it runs on). Here the snapshot is FIXED at 1,000
  * docs (copies of stored docs 0..999 under fresh ids) while the corpus
  * grows x1 → x10 → x100. Per scale it times:
  *
  *  - `append+serve`: appendToBm25Raw (snapshot tokenize + vocab-bounded
  *    df merge) + bm25RawTopK over the merged postings — the daily cost
  *    the incremental path pays. The stored artifact is built OUTSIDE
  *    the timer (the one-time cost it amortizes).
  *  - `rebuild+serve`: bm25RawStats over the full union corpus + the
  *    same serve — what a deployment without the append path re-pays
  *    every snapshot.
  *
  *   sbt "runMain graft.dev.Bm25AppendProbe /root/repo/tmp_scale x1,x10,x100 3"
  */
object Bm25AppendProbe {
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
      // "yesterday's" artifact over the stored corpus, untimed
      val p0 = TextOps.bm25RawPostings(docs).localCheckpoint()
      val (n0, l0) = TextOps.bm25TotalsOf(p0)
      val stored = TextOps.Bm25Raw(
        p0, TextOps.bm25DfOf(p0).localCheckpoint(), n0, l0)
      val snapshot = docs.filter($"doc_id" < 1000)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"text")
        .localCheckpoint()
      val qrows = TextOps.bm25RawQueryRows(s, d)
      // per-rep cleanup must spare the untimed artifacts: unpersist only
      // RDDs the rep itself checkpointed, or rep 2 reads dead blocks
      val keep = s.sparkContext.getPersistentRDDs.keySet
      def dropRepRdds(): Unit = s.sparkContext.getPersistentRDDs
        .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
      val appendTimes = (1 to reps).map { _ =>
        val t = System.nanoTime()
        val merged = TextOps.appendToBm25Raw(stored, snapshot)
        val n = TextOps.bm25RawTopK(merged, qrows, 5).count()
        val out = ((System.nanoTime() - t) / 1e9, n)
        dropRepRdds()
        out
      }
      val union = docs.select($"doc_id", $"text").unionByName(snapshot)
      val rebuildTimes = (1 to reps).map { _ =>
        val t = System.nanoTime()
        val pu = TextOps.bm25RawPostings(union).localCheckpoint()
        val (nu, lu) = TextOps.bm25TotalsOf(pu)
        val rebuilt = TextOps.Bm25Raw(pu, TextOps.bm25DfOf(pu), nu, lu)
        val n = TextOps.bm25RawTopK(rebuilt, qrows, 5).count()
        val out = ((System.nanoTime() - t) / 1e9, n)
        dropRepRdds()
        out
      }
      println(f"[bm25probe] $sc%-5s corpus=$nCorpus%7d snapshot=1000 " +
        f"queries=${qrows.length}%3d rows=${appendTimes.head._2}%5d " +
        f"append+serve=${appendTimes.map(_._1).map(t => f"$t%.2f").mkString("/")} s " +
        f"rebuild+serve=${rebuildTimes.map(_._1).map(t => f"$t%.2f").mkString("/")} s")
    }
    s.stop()
  }
}
