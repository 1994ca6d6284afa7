package graft

/** Error-model parity (SURVEY.md §7 "known hard spots": the reference throws
  * on division by zero, invalid casts, missing map keys, out-of-range
  * subscripts — Spark 4 ANSI mode matches; each error has a try_ escape
  * hatch, like the reference's TRY). */
class ErrorSemanticsSpec extends SparkSpec {

  private def fails(sql: String): Boolean =
    try { spark.sql(sql).collect(); false }
    catch { case _: Throwable => true }

  test("ANSI mode is on and errors match the reference model") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    assert(fails("SELECT 1/0"), "integer division by zero must throw")
    assert(fails("SELECT CAST('abc' AS INT)"), "bad cast must throw")
    assert(fails("SELECT CAST(128 AS TINYINT)"), "overflow cast must throw")
    assert(fails("SELECT element_at(array(1, 2), 5)"), "array index out of bounds must throw")
    // documented delta vs the reference: Trino map subscript throws on a
    // missing key; Spark 4 element_at returns null even under ANSI
    val missing = spark.sql("SELECT element_at(map('a', 1), 'b')").collect()(0)
    assert(missing.isNullAt(0))
  }

  test("try_ variants suppress exactly those errors to null") {
    val r = spark.sql(
      """SELECT try_divide(1, 0), TRY_CAST('abc' AS INT), TRY_CAST(128 AS TINYINT),
         try_element_at(map('a', 1), 'b'), try_element_at(array(1, 2), 5)""").collect()(0)
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"position $i not null"))
  }
}
