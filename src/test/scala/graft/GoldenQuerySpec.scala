package graft

import org.apache.spark.sql.Row

/** Golden checks at sf0.001: every registered query executes, produces rows,
  * and spot values match independently computed expectations
  * (≈ reference AbstractTestQueries vs the H2 oracle; the full DuckDB
  * hash-compare runs driver-side at sf0.01). */
class GoldenQuerySpec extends SparkSpec {

  test("every SparkEntry query runs and returns rows at sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).count()
    }
    val empty = counts.filter(_._2 == 0).keys.toSeq.sorted
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("every query has either an oracle or a documented engine-specific hash") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
  }

  test("entry flagship matches hand-checked aggregate") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    val af = rows.find(r => r.getString(0) == "A" && r.getString(1) == "F").get
    assert(af.getAs[Long]("count_order") == 510L)
    assert(math.abs(af.getAs[Double]("sum_qty") - 13096.0) < 1e-9)
  }

  test("q6 filter aggregation is stable") {
    val r = operators.Relational.q6_filter(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_rows") > 0)
    assert(r.getAs[Double]("revenue") > 0.0)
  }

  test("semi and anti joins partition orders exactly") {
    import spark.implicits._
    val o = operators.table(spark, sfDir, "orders").count()
    val semi = operators.table(spark, sfDir, "orders")
      .join(operators.table(spark, sfDir, "lineitem").select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_semi").count()
    val anti = operators.table(spark, sfDir, "orders")
      .join(operators.table(spark, sfDir, "lineitem").select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_anti").count()
    assert(semi + anti == o)
  }

  test("grouping sets row count = detail + subtotal + grand total") {
    val df = operators.Aggregates.q_groupingsets(spark, sfDir)
    val byLevel = df.groupBy("g1", "g2").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(byLevel((0, 0)) == 6)  // (returnflag, linestatus) pairs
    assert(byLevel((0, 1)) == 3)  // returnflag subtotals
    assert(byLevel((1, 1)) == 1)  // grand total
  }

  test("set ops respect multiset algebra") {
    val unionAll = operators.SetOps.q_union_all(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    val c = operators.table(spark, sfDir, "customer").count()
    val s2 = operators.table(spark, sfDir, "supplier").count()
    assert(unionAll == c + s2)
  }
}
