package graft.dev

import org.apache.spark.sql.functions._

/** One-off volume probe for the q136 frame-admission path: frame
  * counts, distinct-hash counts, probe/bucket volumes at a given SF
  * dir — the numbers the MIH selectivity argument rests on. */
object FrameProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp_vol100")
    val s = graft.Sessions.local()
    import s.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val stored = graft.multimodal.Multimodal.asMedia(
      graft.sources.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .filter($"doc_id" % 10 < 8))
    val arriving = graft.multimodal.Multimodal.asMedia(
      graft.sources.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .filter($"doc_id" % 10 >= 8))
    val sf = t("stored frames")(
      graft.queries.MultimodalQ.frameHashes(stored).persist())
    val af = t("arriving frames")(
      graft.queries.MultimodalQ.frameHashes(arriving).persist())
    println(s"[probe] stored_frames=${t("count sf")(sf.count())} " +
      s"stored_hashes=${t("distinct sf")(sf.select($"h").distinct().count())}")
    println(s"[probe] arriving_frames=${t("count af")(af.count())} " +
      s"arriving_hashes=${t("distinct af")(af.select($"h").distinct().count())}")
    val oldBands = graft.queries.MultimodalQ.mihBands(sf)
      .select($"band", $"bv", $"h").distinct().persist()
    println(s"[probe] old_band_rows=${t("old bands")(oldBands.count())}")
    val hot = oldBands.groupBy($"band", $"bv").agg(count(lit(1)).as("c"))
    t("hot buckets")(hot.orderBy($"c".desc).limit(5).collect()
      .foreach(r => println(s"[probe] hot bucket $r")))
    s.stop()
  }
}
