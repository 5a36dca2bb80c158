package graft.dev
import graft.Sessions
object MemberFrac {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    val d = args(0)
    val members = graft.SparkEntry.queries("q47_dedup_clusters")(s, d).count()
    val docs = graft.sources.Tables.documents(s, d).count()
    println(s"[memberfrac] dir=$d members=$members docs=$docs frac=${members.toDouble / docs}")
    s.stop()
  }
}
