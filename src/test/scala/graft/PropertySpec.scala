package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.FileReplay

/** Property tests (SURVEY §5): totality and invariants over generated
  * inputs rather than fixtures. Uses raw ScalaCheck generators with
  * seeded deterministic sampling (the scalatest bridge artifact isn't in
  * the offline cache, and deterministic cases suit this repo's
  * reproducibility contract anyway). Spark jobs per case are expensive,
  * so each property runs 10 generated cases.
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(42L + i))
        b <- gb.apply(Gen.Parameters.default, Seed(1042L + i))
      } body(a, b)
    }

  private val wireCell: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("not-a-number"),
    Gen.choose(-1000.0, 1000.0).map(_.toString),
    Gen.oneOf("true", "false", "1", "0", "yes", "no", "TRUE", "garbage"),
    Gen.const("2026-03-01 08:00:00"), Gen.const("9999-99-99 99:99:99"))

  test("property: FileReplay.normalize is total over arbitrary wire rows") {
    val fields = graft.model.Schemas.telemetryWire.fieldNames
    forAll(Gen.listOfN(8, Gen.listOfN(fields.length, wireCell))) { rowCells =>
      val rows = rowCells.map(cells => Row(cells: _*))
      val wire = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(fields.map(StructField(_, StringType, nullable = true))))
      val out = FileReplay.normalize(wire,
        lit("2026-01-01 00:00:00").cast("timestamp")).collect()
      // never throws, never drops, never nulls the normalized columns
      assert(out.length == rows.length)
      assert(out.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
      assert(out.forall(r => r.getString(10) != null && r.getString(10).nonEmpty))
    }
  }

  test("property: alert union count == sum of per-rule match counts") {
    import graft.rules.{Rule, RuleEngine}
    val eventGen = for {
      v <- Gen.choose(-50.0, 250.0)
      t <- Gen.oneOf("click", "view", "error")
    } yield (v, t)
    forAll(Gen.listOfN(30, eventGen)) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((v, t), i) => (i.toLong, v, t) }
        .toDF("id", "value", "event_type")
      val rules = Seq(
        Rule("high", col("value") > 150.0, concat(lit("h"), col("id"))),
        Rule("err", col("event_type") === "error", concat(lit("e"), col("id"))))
      val alerts = RuleEngine.alerts(df, rules, col("id").cast("timestamp"), col("id"), "id")
      val expected = evs.count(_._1 > 150.0) + evs.count(_._2 == "error")
      assert(alerts.count() == expected)
    }
  }

  test("property: quantized_cosine is symmetric, bounded, 1 on itself") {
    val vecGen = Gen.listOfN(16, Gen.choose(-8.0f, 8.0f))
      .suchThat(_.exists(x => math.abs(x) > 0.01f))
    forAll2(vecGen, vecGen) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.functions.expressions.quantized_cosine(col("a"), col("b")).as("ab"),
        graft.functions.expressions.quantized_cosine(col("b"), col("a")).as("ba"),
        graft.functions.expressions.quantized_cosine(col("a"), col("a")).as("aa")).head()
      assert(r.getDouble(0) == r.getDouble(1), "symmetric")
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9, "bounded")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, "self-cosine is 1")
    }
  }

  test("property: word_shingles count and membership") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x")
    forAll(Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))) { ws =>
      import spark.implicits._
      val text = ws.mkString(" ")
      val out = Seq(text).toDF("t")
        .select(graft.functions.expressions.word_shingles(col("t")).as("sh"))
        .head().getSeq[String](0)
      if (ws.length < 3) assert(out.isEmpty)
      else {
        assert(out.nonEmpty && out.length <= ws.length - 2, "distinct <= total 3-grams")
        assert(out.forall(s => text.contains(s)), "every shingle is a substring")
        assert(out.distinct.length == out.length, "distinct")
      }
    }
  }

  test("property: word_stats matches a naive Scala reference on arbitrary token lists") {
    val word = Gen.oneOf("a", "bb", "ccc", "d", "")
    forAll(Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, word)), n = 15) { ws =>
      import spark.implicits._
      val text = ws.mkString(" ")
      val toks = text.split(" ", -1).toSeq // reference tokenization incl. empties
      val row = Seq(text).toDF("t")
        .select(graft.functions.expressions.word_stats(col("t")).as("st"))
        .select("st.n_words", "st.n_distinct", "st.top_c", "st.total2", "st.d2")
        .head()
      assert(row.getLong(0) == toks.length.toLong)
      assert(row.getLong(1) == toks.distinct.length.toLong)
      assert(row.getLong(2) == toks.groupBy(identity).values.map(_.size).max.toLong)
      assert(row.getLong(3) == (toks.length - 1).toLong)
      assert(row.getLong(4) == toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq.distinct.length.toLong)
    }
  }

  test("property: connected components equals union-find on random graphs") {
    import spark.implicits._
    // random undirected edge lists, including path-like graphs (the
    // worst case for naive label propagation) and self-contained cliques
    val edgeGen: Gen[List[(Long, Long)]] = for {
      nV <- Gen.choose(2, 40)
      nE <- Gen.choose(1, 50)
      edges <- Gen.listOfN(nE, for {
        a <- Gen.choose(0L, nV.toLong - 1)
        b <- Gen.choose(0L, nV.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    forAll(edgeGen, n = 6) { edges =>
      if (edges.nonEmpty) {
        val got = graft.queries.TextOps
          .connectedComponents(edges.toDF("u", "v"), maxIters = 24)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = verts.map { v =>
          val root = find(v)
          v -> verts.filter(find(_) == root).min
        }.toMap
        assert(got == expected, s"edges=$edges")
      }
    }
  }

  test("property: winnow fingerprints are within the hash modulus") {
    forAll(Gen.choose(11, 120).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))) { text =>
      import spark.implicits._
      val fps = Seq(text).toDF("t")
        .select(graft.functions.expressions.winnow_fingerprint(col("t")).as("f"))
        .head().getSeq[Long](0)
      assert(fps.nonEmpty)
      assert(fps.forall(f => f >= 0 && f < 1000000007L))
      assert(fps.distinct.length == fps.length)
    }
  }

  test("property: sorted_intersect_count == distinct-set intersection size") {
    val arrGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-30L, 30L)).map(_.sorted))
    forAll2(arrGen, arrGen) { (a, b) =>
      import spark.implicits._
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.expressions.sorted_intersect_count(col("a"), col("b")))
        .head().getLong(0)
      assert(got == (a.toSet intersect b.toSet).size.toLong)
    }
  }

  test("property: decSumFast/decAvgFast == decSum/decAvg on arbitrary 2-decimal money") {
    // the fast path's whole claim is bit-identity under the <=4-decimal
    // contract; pin it on random 2-decimal values of money-like magnitude
    // (positives and negatives, many partitions so partial-agg order varies)
    val moneyGen = Gen.listOfN(300,
      Gen.choose(-50000000L, 50000000L).map(c => c / 100.0))
    forAll(moneyGen, n = 5) { vals =>
      import spark.implicits._
      val df = vals.toDF("x").repartition(7)
      val r = df.agg(
        graft.queries.decSum(col("x")).as("slow"),
        graft.queries.decSumFast(col("x")).as("fast"),
        graft.queries.decAvg(col("x")).as("aslow"),
        graft.queries.decAvgFast(col("x")).as("afast")).head()
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"sum diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"avg diverged: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("property: dupFraction matches a naive in-memory reference") {
    val occGen = Gen.listOfN(120, for {
      doc <- Gen.choose(0L, 8L)
      key <- Gen.choose(0, 12).map(i => s"k$i")
    } yield (doc, key))
    forAll(occGen, n = 5) { occ =>
      import spark.implicits._
      val got = graft.queries.TextOps.dupFraction(occ.toDF("doc_id", "key"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val byKeyDocs = occ.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
      val exp = occ.groupBy(_._1).map { case (doc, rows) =>
        doc -> (rows.size.toLong,
          rows.count(r => byKeyDocs(r._2) >= 2).toLong)
      }
      assert(got == exp)
      // the r15 explicit-totals overload (q65/q73 supply arithmetic
      // per-doc counts instead of paying a second counting pass) must
      // be row-identical when handed exactly occ's per-doc row counts
      val totals = occ.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      val got2 = graft.queries.TextOps.dupFraction(occ.toDF("doc_id", "key"),
          totals.toDF("doc_id", "n_spans"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got2 == exp)
    }
  }

  test("property: bpe_encode kernel == independent naive greedy reference") {
    import graft.functions.expressions
    val tokenGen = Gen.choose(1, 2)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // duplicate pairs allowed (first rank must win); multi-char sides only
    // fire when earlier merges create them — both paths exercised
    val mergesGen = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.zip(tokenGen, tokenGen)))
    val textGen = Gen.listOfN(60,
      Gen.frequency(5 -> Gen.oneOf('a', 'b', 'c'), 1 -> Gen.const(' ')))
      .map(_.mkString)
    forAll2(Gen.listOfN(8, textGen), mergesGen) { (texts, merges) =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = df.select($"id", expressions.bpe_encode($"text", merges).as("toks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == NaiveBpe.encode(t, merges),
          s"text='$t' merges=$merges")
      }
    }
  }

  test("property: Lcg matches java.util.Random for arbitrary seeds and bounds") {
    forAll2(Gen.long, Gen.listOfN(40, Gen.choose(1, 64)), n = 5) { (seed, bounds) =>
      val jr = new java.util.Random(seed)
      var st = graft.sources.Simulation.Lcg.seeded(seed)
      bounds.foreach { bound =>
        val (s1, v) = graft.sources.Simulation.Lcg.nextInt(st, bound)
        assert(v == jr.nextInt(bound)); st = s1
        val (s2, d) = graft.sources.Simulation.Lcg.nextDouble(st)
        assert(d == jr.nextDouble()); st = s2
      }
    }
  }

  test("property: bigram span kernels == transform/concat_ws + xxhash64 reference") {
    import graft.functions.expressions
    import org.apache.spark.sql.functions._
    // spaces weighted heavily: empty words, leading/trailing/multiple
    // separators are the edge cases; a multi-byte char guards the
    // byte-scan's UTF-8 safety claim
    val textGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.frequency(4 -> Gen.oneOf('a', 'b', 'c'), 2 -> Gen.const(' '),
        1 -> Gen.const('é'))).map(_.mkString))
    forAll(Gen.listOfN(12, textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val w = split($"text", " ")
      val ref = df.select($"id",
          when(size(w) >= 2, transform(sequence(lit(1), size(w) - 1),
            i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
            .otherwise(array()).as("bgs"))
        .withColumn("hs", transform($"bgs", b => xxhash64(b)))
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[String](1), r.getSeq[Long](2))).toMap
      val got = df.select($"id",
          expressions.bigram_spans($"text").as("sp"),
          expressions.bigram_hashes($"text").as("hs"))
        .collect().map { r =>
          val sp = r.getSeq[org.apache.spark.sql.Row](1)
          r.getLong(0) -> (sp.map(_.getString(0)), sp.map(_.getLong(1)),
            r.getSeq[Long](2))
        }.toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (refBgs, refHs) = ref(i.toLong)
        val (gotBgs, gotSpanHs, gotHs) = got(i.toLong)
        assert(gotBgs == refBgs, s"text='$t' spans")
        assert(gotSpanHs == refHs, s"text='$t' span hashes")
        assert(gotHs == refHs, s"text='$t' bare hashes")
      }
    }
  }

  test("property: dtw_dist is symmetric, zero iff equal-as-aligned, triangle-ish bounds") {
    val serGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-500L, 500L)))
    forAll2(serGen, serGen) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.functions.expressions.dtw_dist(col("a"), col("b")).as("ab"),
        graft.functions.expressions.dtw_dist(col("b"), col("a")).as("ba"),
        graft.functions.expressions.dtw_dist(col("a"), col("a")).as("aa")).head()
      assert(r.getLong(0) == r.getLong(1), "symmetric (cost is symmetric)")
      assert(r.getLong(2) == 0L, "self-distance 0")
      assert(r.getLong(0) >= 0L, "non-negative")
      // an upper bound: align everything to one element
      val ub = (a.map(x => math.abs(x - b.head)).sum
        + b.tail.map(y => math.abs(a.last - y)).sum)
      assert(r.getLong(0) <= ub, "bounded by the corner alignment")
    }
  }

  test("property: sorted_intersect is commutative, sorted, and counts agree") {
    val arrGen = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 30L))).map(_.sorted)
    forAll2(arrGen, arrGen) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.functions.expressions.sorted_intersect(col("a"), col("b")).as("ab"),
        graft.functions.expressions.sorted_intersect(col("b"), col("a")).as("ba"),
        graft.functions.expressions.sorted_intersect_count(col("a"), col("b")).as("c"))
        .head()
      val ab = r.getSeq[Long](0)
      assert(ab == r.getSeq[Long](1), "commutative")
      assert(ab == ab.sorted && ab.distinct == ab, "sorted distinct")
      assert(ab.length.toLong == r.getLong(2), "count law")
      assert(ab.toSet == (a.toSet & b.toSet), "set semantics")
    }
  }
}
