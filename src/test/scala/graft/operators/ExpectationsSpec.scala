package graft.operators

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {

  private def auditMap(df: org.apache.spark.sql.DataFrame,
      s: Expectations.Suite): Map[(String, String), (Long, Boolean)] =
    s.audit(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap

  test("row-local checks: null tolerance is explicit, counts are exact") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "zz"), (9L, null), (20L, "a"))
      .toDF("v", "s")
    val m = auditMap(df, Expectations.suite
      .notNull("v")
      .inRange("v", 0, 10)                          // 20 violates; null tolerated
      .inRange("v", 0, 10, nullIsViolation = true)  // 20 AND the null
      .isIn("s", Seq("a", "b"))                     // zz violates; null tolerated
      .matches("s", "^[ab]$", nullIsViolation = true)) // zz and the null
    assert(m(("not_null", "v")) == (1L, false))
    // two in_range rows on the same column collapse to one sorted key each —
    // distinguishable by count here: tolerant=1, strict=2
    val ranges = m.keys.filter(_._1 == "in_range")
    assert(ranges.size == 1, "same (check, column) pair")
    // the two in_range entries share a key; verify via full rows instead
    val rows = Expectations.suite
      .inRange("v", 0, 10)
      .inRange("v", 0, 10, nullIsViolation = true)
      .audit(df).collect().map(r => (r.getLong(2), r.getBoolean(3))).toSeq
    assert(rows.map(_._1).sorted == Seq(1L, 2L))
    assert(m(("is_in", "s")) == (1L, false))
    assert(m(("matches", "s")) == (2L, false))
  }

  test("inRange: a present unparseable value violates regardless of null policy") {
    import spark.implicits._
    val df = Seq("5", "fast", null, "200").toDF("v")
    // tolerant: "fast" and "200" violate, null passes
    val tolerant = Expectations.suite.inRange("v", 0, 100).audit(df).head()
    assert(tolerant.getLong(2) == 2 && !tolerant.getBoolean(3))
    // strict: the null joins them
    val strict = Expectations.suite
      .inRange("v", 0, 100, nullIsViolation = true).audit(df).head()
    assert(strict.getLong(2) == 3)
    // annotate tags the garbage row
    val tags = Expectations.suite.inRange("v", 0, 100).annotate(df)
      .collect().map(r => Option(r.getString(0)) -> r.getSeq[String](1).toSet).toMap
    assert(tags(Some("fast")) == Set("in_range:v"))
    assert(tags(Some("5")).isEmpty && tags(None).isEmpty)
  }

  test("unique: duplicated keys count every carrying row; empty frame passes") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val m = auditMap(df, Expectations.suite.unique("k"))
    assert(m(("unique", "k")) == (5L, false), "2+3 rows carry duplicated keys")
    val clean = Seq(1L, 2L, 3L).toDF("k")
    assert(auditMap(clean, Expectations.suite.unique("k"))(("unique", "k")) == (0L, true))
    val empty = Seq.empty[Long].toDF("k")
    assert(auditMap(empty, Expectations.suite.unique("k"))(("unique", "k")) == (0L, true))
  }

  test("row-local checks on an empty frame audit as 0 violations / passed") {
    import spark.implicits._
    // regression pin (ADVICE r8): sum() over zero rows is NULL — an empty
    // micro-batch must report passing zeros, not null-filled audit rows
    val empty = Seq.empty[(Long, String)].toDF("v", "s")
    val m = auditMap(empty,
      Expectations.suite.notNull("v").inRange("v", 0, 10).isIn("s", Seq("a")))
    assert(m(("not_null", "v")) == (0L, true))
    assert(m(("in_range", "v")) == (0L, true))
    assert(m(("is_in", "s")) == (0L, true))
  }

  test("one aggregate pass for all row-local checks (single scan, no shuffle-per-check)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "s")
    val plan = Expectations.suite
      .notNull("v").inRange("v", 0, 10).isIn("s", Seq("a", "b"))
      .audit(df).queryExecution.sparkPlan.toString
    // all three checks compile into ONE HashAggregate pair over one scan
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan of the frame, plan:\n$plan")
  }
}
