package graft

/** Error-bound assertions for sketch-based aggregates (no cross-engine oracle —
  * HLL++/qdigest hashes are engine-specific; reference tests the same way:
  * ApproximateCountDistinctAggregation error-bound tests). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    operators.Misc.q_approx_agg(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag=${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("approx median sits inside the value range and near true median") {
    import spark.implicits._
    val li = operators.table(spark, sfDir, "lineitem")
    val trueMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    operators.Misc.q_approx_agg(spark, sfDir).collect().foreach { r =>
      val m = r.getAs[Double]("approx_median")
      assert(m > 0 && math.abs(m - trueMedian) / trueMedian < 0.25)
    }
  }
}
