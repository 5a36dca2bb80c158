package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in a single scan —
  * the admission contract a training-data pipeline checks before a
  * snapshot is allowed to feed anything downstream (the Deequ/dbt-test
  * pattern re-expressed Spark-first). The reference validates shape
  * per-record at ingest (consumer.py's `.get()` defaults,
  * waymo_replay.py's coercions); this is the set-oriented form: declare
  * the contract once, get one violation-count row per expectation.
  *
  * Scale shape: every row-local expectation (null, range, membership,
  * pattern) compiles to a conditional-count COLUMN in ONE aggregate over
  * one scan of the frame — adding expectations adds map-side counters,
  * never passes. The only non-row-local check, `unique`, needs its own
  * key-count aggregate (a groupBy on the key — the exact-dedup shuffle
  * shape, 16-byte keys when callers pre-hash); it is evaluated in the
  * same job via a union of the two small summaries. Output is
  * expectations-bounded (one row each), so the driver never holds data.
  *
  * Row-local checks count VIOLATIONS (null fails notNull; a null fails
  * inRange/isIn/matches only when the column is also notNull-declared —
  * null-tolerant by default, SQL three-valued semantics made explicit
  * with the `nullIsViolation` flag).
  */
object Expectations {

  private[operators] sealed trait Check {
    def name: String
    def col: String
  }
  private final case class NotNull(col: String) extends Check {
    val name = "not_null"
  }
  private final case class InRange(col: String, lo: Double, hi: Double,
      nullIsViolation: Boolean) extends Check {
    val name = "in_range"
  }
  private final case class IsIn(col: String, values: Seq[String],
      nullIsViolation: Boolean) extends Check {
    val name = "is_in"
  }
  private final case class Matches(col: String, regex: String,
      nullIsViolation: Boolean) extends Check {
    val name = "matches"
  }
  private final case class Unique(col: String) extends Check {
    val name = "unique"
  }

  /** Builder: accumulate expectations, then [[Suite.audit]] a frame. */
  final case class Suite(private val checks: Vector[Check] = Vector.empty) {
    def notNull(c: String): Suite = copy(checks :+ NotNull(c))
    def inRange(c: String, lo: Double, hi: Double,
        nullIsViolation: Boolean = false): Suite =
      copy(checks :+ InRange(c, lo, hi, nullIsViolation))
    def isIn(c: String, values: Seq[String],
        nullIsViolation: Boolean = false): Suite =
      copy(checks :+ IsIn(c, values, nullIsViolation))
    def matches(c: String, regex: String,
        nullIsViolation: Boolean = false): Suite =
      copy(checks :+ Matches(c, regex, nullIsViolation))
    def unique(c: String): Suite = copy(checks :+ Unique(c))

    private def violation(c: Check): Column = c match {
      case NotNull(col0) => col(col0).isNull
      case InRange(col0, lo, hi, nv) =>
        // a PRESENT value that doesn't parse as a number is always a
        // violation — conflating cast-null with real null would report
        // garbage (e.g. "fast" in a numeric column) as in-range.
        // try_cast: ANSI mode makes a plain cast ABORT the job on the
        // first malformed value (FileReplay.normalize's note)
        val parsed = col(col0).try_cast("double")
        val unparseable = col(col0).isNotNull && parsed.isNull
        val out = unparseable || parsed < lo || parsed > hi
        // FALSE && NULL = FALSE, so the isNotNull guard alone suffices
        // (same null-guard shape as IsIn/Matches below)
        if (nv) col(col0).isNull || out
        else col(col0).isNotNull && out
      case IsIn(col0, vs, nv) =>
        val out = !col(col0).isInCollection(vs)
        if (nv) col(col0).isNull || out else out && col(col0).isNotNull
      case Matches(col0, re, nv) =>
        val out = !col(col0).rlike(re)
        if (nv) col(col0).isNull || out else out && col(col0).isNotNull
      case _: Unique =>
        throw new IllegalStateException("unique is not row-local")
    }

    /** Row-level annotation: every row gains a `violations` column —
      * the array of `name:column` tags of the row-local checks it
      * fails (empty ⇒ the row passes the contract). ONE codegen'd
      * projection, no aggregate — this is the split point for
      * quarantine routing (the streaming expectation gate): rows with
      * an empty array proceed, the rest land in the dead-letter store
      * with their reasons attached. `unique` is not row-local and is
      * rejected here (a single row cannot know its key's multiplicity;
      * uniqueness on a stream is the watermarked-dedup store's job —
      * Pipeline.runDedupedAlertPipeline). */
    def annotate(df: DataFrame): DataFrame = {
      require(checks.nonEmpty, "annotate with an empty expectation suite")
      require(!checks.exists(_.isInstanceOf[Unique]),
        "unique is not row-local; annotate supports row-local checks only")
      df.withColumn("violations",
        filter(array(checks.map(c =>
          when(violation(c), lit(s"${c.name}:${c.col}"))): _*),
          x => x.isNotNull))
    }

    /** One (check, column, n_violations, passed) row per expectation,
      * SORTED by (check, column) — deterministic output order, NOT
      * declaration order. Two same-type checks on the same column are
      * therefore indistinguishable in the result; callers that need to
      * map rows back to individual declarations (e.g. two `inRange`
      * bounds on one column) should give them distinct columns or audit
      * them in separate suites. Row-local checks ride one aggregate
      * pass; each `unique` adds one key-count aggregate on its column. */
    def audit(df: DataFrame): DataFrame = {
      require(checks.nonEmpty, "audit of an empty expectation suite")
      val s = df.sparkSession
      import s.implicits._
      val rowLocal = checks.filter(!_.isInstanceOf[Unique])
      val uniques = checks.collect { case u: Unique => u }
      val parts = Seq.newBuilder[DataFrame]
      if (rowLocal.nonEmpty) {
        // one row out of the single-pass aggregate, unpivoted via stack
        // coalesce: sum() over zero rows is NULL — an empty frame (e.g.
        // an empty micro-batch) must audit as 0 violations / passed,
        // matching the unique branch's coalesce
        val aggs = rowLocal.zipWithIndex.map { case (c, i) =>
          coalesce(sum(when(violation(c), 1L).otherwise(0L)), lit(0L)).as(s"v$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = rowLocal.zipWithIndex.flatMap { case (c, i) =>
          Seq(lit(c.name), lit(c.col), col(s"v$i"))
        }
        parts += one.select(stack(lit(rowLocal.size) +: stackArgs: _*)
          .as(Seq("check", "column", "n_violations")))
      }
      uniques.foreach { u =>
        // violations = rows carrying a duplicated key (nulls count as a
        // key like SQL GROUP BY; 2 copies = 2 violating rows)
        parts += df.groupBy(col(u.col)).agg(count(lit(1)).as("n"))
          .filter($"n" > 1)
          .agg(coalesce(sum($"n"), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("check"), lit(u.col).as("column"),
            $"n_violations")
      }
      parts.result().reduce(_ unionByName _)
        .withColumn("passed", $"n_violations" === 0L)
        .orderBy($"check", $"column")
    }
  }

  def suite: Suite = Suite()
}
