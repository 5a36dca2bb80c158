package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory; `oracleSql` carries
  * the DuckDB-equivalent SQL for every SQL-expressible query (the driver's
  * correctness gate). Families register themselves in [[registry]].
  */
object SparkEntry {

  private def registry: Map[String, Q] =
    Relational.all ++
      graft.queries.TextOps.all ++
      graft.queries.VectorOps.all ++
      graft.queries.Domain.all ++
      graft.queries.MultimodalQ.all ++
      graft.queries.Windowed.all ++
      graft.queries.Retrieval.all ++
      graft.queries.GraphOps.all ++
      graft.queries.LangId.all ++
      graft.queries.Admission.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql.trim }
}
