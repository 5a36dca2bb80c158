package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One telemetry table from all three ingestion modes — SURVEY §2.7's
  * single declared use of union: the reference runs three producers
  * (simulated fleet producer.py:147–199, OpenSky poller
  * opensky_source.py:146–177, CSV/JSONL replay waymo_replay.py:95–160)
  * into one topic family and one `vehicle_telemetry` hypertable, with no
  * record of which producer a row came from. The unified table keeps that
  * single-table shape and ADDS provenance: every row carries a
  * `source_mode` tag, so per-mode data-quality questions ("is the replay
  * feed drifting from live?") stay answerable downstream.
  *
  * `unionByName(allowMissingColumns = true)` is the deliberate choice
  * over positional union: the three sources evolve independently (the
  * reference's OpenSky leg has no battery telemetry, its replay leg no
  * perception), and a column added to one mode must not silently shift
  * positions or break the others — missing columns become nulls, names
  * bind the schema. Tag-then-union is a zero-shuffle plan: each leg stays
  * a narrow map over its own scan, and the union is purely logical
  * (Catalyst concatenates the partitions), so the unified table costs
  * nothing beyond its inputs at any scale.
  */
object UnifiedIngest {

  val SourceModeCol = "source_mode"

  /** Tag each mode's frame with its name and union them by column name.
    * Later writes partitioned by (day, source_mode) keep per-mode file
    * pruning — a reader asking for one mode never scans the others.
    */
  def unify(modes: (String, DataFrame)*): DataFrame = {
    require(modes.nonEmpty, "unify needs at least one ingestion mode")
    modes.map { case (mode, df) => df.withColumn(SourceModeCol, lit(mode)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
