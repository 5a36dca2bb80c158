package graft.sources

import graft.SparkSpec

/** The plain-SQL surface: every table registered as a temp view, typed
  * loaders applied (events nanos handling), kernels callable inline —
  * the way the reference's users actually query (queries.py SQL strings).
  */
class TablesSpec extends SparkSpec {

  test("registerViews: every table queryable from spark.sql, events.ts typed") {
    Tables.registerViews(spark, sf0001)
    // all ten views exist and scan
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1, s"view $n")
    }
    // the events view went through the typed loader: ts is a TIMESTAMP,
    // not the raw nanos long
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    assert(t == org.apache.spark.sql.types.TimestampType, s"events.ts is $t")
    // a metric query in plain SQL agrees with the DataFrame form
    val sqlCount = spark.sql(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity > 30").head().getLong(0)
    val dfCount = Tables.lineitem(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 30).count()
    assert(sqlCount == dfCount)
    // engine kernels compose with the views in one SQL statement
    val ws = spark.sql(
      "SELECT word_stats(text).n_words AS n FROM documents ORDER BY doc_id LIMIT 1")
      .head().getLong(0)
    assert(ws > 0)
  }
}
