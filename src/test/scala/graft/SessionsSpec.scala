package graft

/** Session-construction contracts (Sessions.scala). */
class SessionsSpec extends SparkSpec {

  test("decSumFast headroom contract: beyond-headroom flag requires ANSI") {
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      // flag unset → no constraint, whatever ANSI is
      spark.conf.set("spark.sql.ansi.enabled", "false")
      Sessions.checkDecSumContract(spark)
      // flag set + ANSI on → the declared deployment is safe
      spark.conf.set("spark.graft.decSumFast.beyondHeadroom", "true")
      spark.conf.set("spark.sql.ansi.enabled", "true")
      Sessions.checkDecSumContract(spark)
      // flag set + ANSI off → the silent-wrap configuration is refused
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val e = intercept[IllegalArgumentException](Sessions.checkDecSumContract(spark))
      assert(e.getMessage.contains("decSumFast"))
      assert(e.getMessage.contains("ansi"))
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.conf.unset("spark.graft.decSumFast.beyondHeadroom")
    }
  }
}
