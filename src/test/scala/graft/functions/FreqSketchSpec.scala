package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Misra–Gries sketch guarantees (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012). The sketch's raw
  * counts are stream-order-dependent, so these tests pin the ORDER-FREE
  * invariants q67b's correctness rests on:
  *
  *   (1) est <= true count (counts only lose decrements);
  *   (2) true count − est <= N/(k+1) after any update/merge tree;
  *   (3) hence every item with true count > N/(k+1) is present.
  */
class FreqSketchSpec extends SparkSpec {

  /** Drive the aggregate directly (update per item, merge across
    * simulated partitions, one serialize round-trip) and return the
    * final (token -> est) map. */
  private def sketch(k: Int, partitions: Seq[Seq[String]]): Map[String, Long] = {
    val agg = expressions.FreqSketch(BoundReference(0, StringType, nullable = true), k)
    val partials = partitions.map { part =>
      var buf = agg.createAggregationBuffer()
      part.foreach { t =>
        buf = agg.update(buf, InternalRow(UTF8String.fromString(t)))
      }
      // serialize round-trip: what shuffle/final-merge actually sees
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.reduceLeft((a, b) => agg.merge(a, b))
    import scala.jdk.CollectionConverters._
    merged.asScala.map { case (t, c) => t -> c.longValue() }.toMap
  }

  private def check(k: Int, partitions: Seq[Seq[String]]): Unit = {
    val est = sketch(k, partitions)
    val stream = partitions.flatten
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val err = n / (k + 1)
    assert(est.size <= k, s"sketch holds ${est.size} > k=$k counters")
    est.foreach { case (t, e) =>
      val c = exact.getOrElse(t, 0L)
      assert(e <= c, s"overestimate: $t est=$e > true=$c")
      assert(c - e <= err, s"error bound: $t true=$c est=$e err>$err")
    }
    exact.foreach { case (t, c) =>
      if (c > err)
        assert(est.contains(t), s"heavy hitter lost: $t true=$c > N/(k+1)=$err")
    }
  }

  test("MG bounds hold under decrement pressure (k=4, skewed stream)") {
    // 3 heavies + 40 distinct light tokens force constant decrements
    val stream = Seq.fill(60)("alpha") ++ Seq.fill(35)("beta") ++
      Seq.fill(20)("gamma") ++ (1 to 40).map(i => s"rare$i")
    // single partition, worst-case adversarial order: heavies first,
    // then the long light tail decrementing them
    check(4, Seq(stream))
    check(4, Seq(new scala.util.Random(7).shuffle(stream)))
  }

  test("MG bounds hold across merges of unequal partials (k=8)") {
    val p1 = Seq.fill(100)("hot") ++ (1 to 50).map(i => s"a$i")
    val p2 = (1 to 80).map(i => s"b${i % 20}") // 20 tokens x 4 each
    val p3 = Seq.fill(30)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 30).map(i => s"c$i")
    check(8, Seq(p1, p2, p3))
  }

  test("exact when distinct tokens <= k (no decrement ever fires)") {
    val parts = Seq(
      Seq("x", "y", "x", "z"),
      Seq("y", "y", "z", "x", "x"))
    val est = sketch(8, parts)
    assert(est == Map("x" -> 4L, "y" -> 3L, "z" -> 2L))
  }

  test("null inputs are skipped, not counted") {
    val agg = expressions.FreqSketch(BoundReference(0, StringType, nullable = true), 4)
    var buf = agg.createAggregationBuffer()
    buf = agg.update(buf, InternalRow(UTF8String.fromString("a")))
    buf = agg.update(buf, InternalRow(null))
    buf = agg.update(buf, InternalRow(UTF8String.fromString("a")))
    assert(agg.deserialize(agg.serialize(buf)).get("a") == 2L)
    assert(buf.size == 1)
  }

  test("registered freq_sketch(k=256) over documents: exact on a small vocabulary") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // sf0.001 documents: vocabulary < 256, so the sketch must be EXACT
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("token"))
    val sk = toks.agg(expressions.freq_sketch($"token").as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.token", $"e.est")
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val joined = sk.join(exact, "token")
      .where($"est" =!= $"cnt")
    assert(joined.count() == 0, "sketch not exact despite vocab <= k")
    assert(sk.count() == exact.count())
  }
}
