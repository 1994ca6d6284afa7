package graft

/** Error-bound assertions for sketch-based aggregates. The driver-side oracle
  * now checks these via exact columns + within-bound booleans (see Approx/Misc
  * scaladoc); this spec re-asserts the raw estimates directly so a bound
  * regression fails fast locally (reference tests the same way:
  * ApproximateCountDistinctAggregation error-bound tests). */
class ApproxSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("q_approx_agg bound booleans hold and exact columns are sane") {
    val rows = operators.Misc.q_approx_agg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("distinct_ok"), s"flag=${r.getString(0)} distinct out of bound")
      assert(r.getAs[Boolean]("median_ok"), s"flag=${r.getString(0)} median out of bound")
      assert(r.getAs[Double]("median") > 0.0)
      assert(r.getAs[Long]("exact_orders") <= r.getAs[Long]("n"))
    }
  }

  test("approx_count_distinct estimate itself is within 5% of exact") {
    val r = operators.table(spark, sfDir, "lineitem")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("apx"),
        countDistinct($"l_orderkey").as("exact"))
      .collect()(0)
    val (apx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(apx - exact) / exact < 0.05, s"apx=$apx exact=$exact")
  }

  test("approx median sits near the true median") {
    val li = operators.table(spark, sfDir, "lineitem")
    val trueMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val m = li.agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)))
      .collect()(0).getDouble(0)
    assert(m > 0 && math.abs(m - trueMedian) / trueMedian < 0.25)
  }
}
