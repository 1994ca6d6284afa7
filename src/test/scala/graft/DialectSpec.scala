package graft

import graft.sqlx.TrinoDialect

/** Unit semantics of the Trino-dialect pre-rewriter (graft.sqlx.TrinoDialect)
  * and the ALL ROWS PER MATCH operator surface. */
class DialectSpec extends SparkSpec {

  test("TRY lowering classifies cast / element_at / division bodies") {
    assert(TrinoDialect.rewrite("SELECT TRY(CAST(x AS INT)) FROM t")
      .contains("TRY_CAST(x AS INT)"))
    assert(TrinoDialect.rewrite("SELECT TRY(element_at(a, 5)) FROM t")
      .contains("try_element_at(a, 5)"))
    assert(TrinoDialect.rewrite("SELECT TRY(a / b) FROM t")
      .contains("try_divide(a, b)"))
    // division wins even when the left operand is itself a CAST
    assert(TrinoDialect.rewrite("SELECT TRY(CAST(a AS INT) / (b - 1)) FROM t")
      .contains("try_divide(CAST(a AS INT), (b - 1))"))
    // already-Spark TRY_CAST is left alone
    assert(TrinoDialect.rewrite("SELECT TRY_CAST(x AS INT) FROM t")
      .contains("TRY_CAST(x AS INT)"))
    intercept[IllegalArgumentException] {
      TrinoDialect.rewrite("SELECT TRY(some_udf(x)) FROM t")
    }
  }

  test("function renames are word-bounded and leave look-alikes alone") {
    val out = TrinoDialect.rewrite(
      "SELECT format('%s', a), format_datetime(ts, 'y'), date_format(ts, 'y'), strpos(s, 'x') FROM t")
    assert(out.contains("format_string('%s', a)"))
    assert(out.contains("format_datetime(ts, 'y')"))
    assert(out.contains("date_format(ts, 'y')"))
    assert(out.contains("instr(s, 'x')"))
  }

  test("FETCH FIRST and UNNEST rewrites") {
    assert(TrinoDialect.rewrite("SELECT * FROM t FETCH FIRST 7 ROWS ONLY").contains("LIMIT 7"))
    val un = TrinoDialect.rewrite("SELECT w FROM t CROSS JOIN UNNEST(split(s, ' ')) AS u (w)")
    assert(un.contains("LATERAL VIEW explode(split(s, ' ')) u AS w"), un)
  }

  test("allRowsPerMatch emits classifier and per-partition match numbers") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    // one partition: values 5,3,1,4,6 → D D U U (one V match over rows 1..4)
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 1.0), (1L, 4L, 4.0), (1L, 5L, 6.0))
      .toDF("k", "ord", "v")
    val down: graft.plans.RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) < p(i - 1).getDouble(2)
    val up: graft.plans.RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) > p(i - 1).getDouble(2)
    val out = graft.plans.MatchRecognize.allRowsPerMatch(
        df, "k", "ord", "D+ U+", Map("D" -> down, "U" -> up), Seq("ord", "v"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(out.toSeq == Seq((2L, 1L, "D"), (3L, 1L, "D"), (4L, 1L, "U"), (5L, 1L, "U")))
  }

  test("match recognize rejects a non-bigint partition key with a clear error") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0)).toDF("k", "ord", "v")
    val e = intercept[IllegalArgumentException] {
      graft.plans.MatchRecognize.allRowsPerMatch(
        df, "k", "ord", "A", Map.empty, Seq("ord"))
    }
    assert(e.getMessage.contains("must be BIGINT"))
  }
}
