package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Law-level pins on the composed admission cascade ([[Admission]]) —
  * the StreamingSpec pins stream == batch end-to-end; these pin the
  * DECISION SEMANTICS themselves against independent machinery. */
class AdmissionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val comp = Admission.batchComposition(spark, sf0001)
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("statuses partition every arrival; engineered CDC rows classify") {
    val (b0, dec0) = comp(0)
    assert(dec0.count() == b0.count(), "one decision per arrival")
    assert(dec0.groupBy($"doc_id").count().filter($"count" > 1).count() == 0,
      "decision per doc_id is unique")
    // engineered rows: stored %50==0 arrived byte-identical, %50==1
    // arrived with ' zz' appended
    val redel = dec0.filter($"doc_id" % 10 < 8 && $"doc_id" % 50 === 0)
    assert(redel.count() > 0 &&
      redel.filter($"status" =!= "redelivered").count() == 0)
    val revis = dec0.filter($"doc_id" % 10 < 8 && $"doc_id" % 50 === 1)
    assert(revis.count() > 0 &&
      revis.filter($"status" =!= "revised").count() == 0)
    // every genuinely-new arrival lands in exactly one later stage
    val newStatuses = dec0.filter($"doc_id" % 10 === 8)
      .select($"status").distinct().as[String].collect().toSet
    assert(newStatuses.subsetOf(Set("quality_rejected", "contaminated",
      "exact_dup", "near_dup", "embed_dup", "admitted")))
  }

  test("admitted docs are hash-new vs the store and hash-unique in batch") {
    val storedH = docs.filter($"doc_id" % 10 < 8)
      .select(md5(coalesce($"text", lit(""))).as("h")).distinct()
    comp.foreach { case (b, dec) =>
      val admH = Admission.normalize(b)
        .join(dec.filter($"status" === "admitted").select($"doc_id"),
          Seq("doc_id"), "left_semi")
        .select(md5(coalesce($"text", lit(""))).as("h"))
      assert(admH.join(storedH, Seq("h"), "left_semi").count() == 0,
        "admitted content hash already in the stored corpus")
      assert(admH.groupBy($"h").count().filter($"count" > 1).count() == 0,
        "two admitted docs in one batch share a content hash")
    }
  }

  test("near-dup verdicts agree with a brute-force jaccard check") {
    // independent machinery: ALL (arrival x stored) pairs verified by
    // exact jaccard — a near_dup rejection must have a >= 0.5 partner
    // in the state it probed; an admitted doc must have none
    val (b0, dec0) = comp(0)
    val sh = TextOps.shingleDocs(docs.select($"doc_id", $"text"))
      .localCheckpoint()
    val newIds = dec0.filter($"doc_id" % 10 === 8).select($"doc_id")
    val cand = newIds.select($"doc_id".as("i"))
      .crossJoin(docs.filter($"doc_id" % 10 < 8).select($"doc_id".as("j")))
    val bf = TextOps.verifyPairs(cand, sh, 0.5)
      .select($"i".as("doc_id")).distinct()
    val ndRejected = dec0.filter($"status" === "near_dup").select($"doc_id")
    assert(ndRejected.join(bf, Seq("doc_id"), "left_anti").count() == 0,
      "near_dup rejection without a brute-force >= 0.5 stored partner")
    val admitted = dec0.filter($"status" === "admitted").select($"doc_id")
    assert(admitted.join(bf, Seq("doc_id"), "left_semi").count() == 0,
      "admitted doc has a brute-force >= 0.5 stored partner")
  }

  test("contamination verdicts match the standalone q179-style screens") {
    val (b0, dec0) = comp(0)
    def isEval(c: org.apache.spark.sql.Column) = c % 29 === 0 && c < 5300L
    // exact leg recomputed independently: shared distinct shingles with
    // the eval content
    val sh = TextOps.shingleDocs(docs.select($"doc_id", $"text"))
    val evalH = sh.filter(isEval($"doc_id"))
      .select(explode($"hs").as("h")).distinct()
    val exactFlag = sh.select($"doc_id", explode($"hs").as("h"))
      .join(evalH, Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .filter($"n" >= 8).select($"doc_id")
    // every exact-leg hit among quality-pass batch-0 docs must be
    // terminal-flagged contaminated (the cascade puts decon before
    // the dedup stages)
    val qPassIds = dec0.filter($"status".isin("contaminated", "exact_dup",
      "near_dup", "embed_dup", "admitted")).select($"doc_id")
    val mustFlag = qPassIds.join(exactFlag, Seq("doc_id"), "left_semi")
    val contaminated = dec0.filter($"status" === "contaminated")
      .select($"doc_id")
    assert(mustFlag.join(contaminated, Seq("doc_id"), "left_anti")
      .count() == 0, "exact-leg contamination not flagged")
  }
}
