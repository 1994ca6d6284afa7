package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches._

/** Error-bound + exactness specs for the digest/heavy-hitter sketches
  * (≈ reference TestTDigestAggregation / TestApproximateMostFrequent). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("tdigest quantiles track exact percentiles within 2%") {
    val li = operators.table(spark, sfDir, "lineitem")
    val exact = li.select(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))"))
      .collect()(0).getSeq[Double](0)
    val est = li.agg(tdigestQuantiles($"l_extendedprice", Seq(0.25, 0.5, 0.75)))
      .collect()(0).getSeq[Double](0)
    exact.zip(est).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.02, s"exact=$e est=$a")
    }
  }

  test("tdigest quantile_at_value inverts value_at_quantile within 2% rank error") {
    val li = operators.table(spark, sfDir, "lineitem")
    val vs = li.agg(tdigestQuantiles($"l_extendedprice", Seq(0.25, 0.5, 0.75)))
      .collect()(0).getSeq[Double](0)
    val ranks = li.agg(tdigestQuantilesAtValues($"l_extendedprice", vs))
      .collect()(0).getSeq[Double](0)
    Seq(0.25, 0.5, 0.75).zip(ranks).foreach { case (q, r) =>
      assert(math.abs(r - q) < 0.02, s"q=$q rank=$r")
    }
    // rank fractions against the exact empirical CDF
    val n = li.count().toDouble
    vs.zip(ranks).foreach { case (v, r) =>
      val exact = li.filter($"l_extendedprice" <= v).count() / n
      assert(math.abs(r - exact) < 0.02, s"v=$v rank=$r exact=$exact")
    }
    // boundary behavior
    val edges = li.agg(tdigestQuantilesAtValues($"l_extendedprice", Seq(-1e18, 1e18)))
      .collect()(0).getSeq[Double](0)
    assert(edges(0) == 0.0 && edges(1) == 1.0)
  }

  test("tdigest is merge-stable across partitionings") {
    val li = operators.table(spark, sfDir, "lineitem").select($"l_quantity")
    def med(parts: Int): Double =
      li.repartition(parts).agg(tdigestQuantiles($"l_quantity", Seq(0.5)))
        .collect()(0).getSeq[Double](0).head
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).collect()(0).getDouble(0)
    Seq(1, 8).foreach { p =>
      assert(math.abs(med(p) - exact) / exact < 0.05, s"parts=$p med=${med(p)} exact=$exact")
    }
  }

  test("hll sketch estimates and merged union stay within bound of exact") {
    val rows = operators.Approx.q_approx_hll(spark, sfDir).collect()
    val exactTotal = operators.table(spark, sfDir, "lineitem")
      .select(countDistinct($"l_orderkey")).collect()(0).getLong(0)
    val merged = rows.find(_.getString(0) == "ALL_MERGED").get
    assert(merged.getLong(1) == exactTotal, "merged row must carry the global exact count")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"), s"${r.getString(0)}: estimate out of bound")
    }
  }

  test("custom SQL function registry exposes every declared function") {
    graft.functions.Registry.registerAll(spark)
    graft.functions.Registry.customFunctions.foreach { fn =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)), s"missing $fn")
    }
    // and they evaluate through SQL
    assert(spark.sql("SELECT word_stem('connections')").collect()(0).getString(0) == "connect")
    assert(spark.sql("SELECT poly_fingerprint('abc')").collect()(0).getLong(0) ==
      "abc".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
  }

  test("space-saving with tight capacity still surfaces the heavy hitter") {
    // skewed stream: 'hot' dominates; capacity 2 << 11 distinct values
    val data = (1 to 500).map(_ => "hot") ++ (1 to 10).flatMap(i => Seq.fill(5)(s"cold$i"))
    val out = data.toDF("v").agg(approxMostFrequent($"v", k = 1, capacity = 2))
      .collect()(0).getString(0)
    assert(out.startsWith("hot:"), s"heavy hitter lost: $out")
  }

  test("space-saving is exact when capacity covers the domain") {
    val data = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c")
    val out = data.toDF("v").repartition(4)
      .agg(approxMostFrequent($"v", k = 3, capacity = 16)).collect()(0).getString(0)
    assert(out == "a:7,b:5,c:3", out)
  }

  test("tdigest VALUE flow: agg → merge → scalar extractors, incl. SQL names") {
    graft.functions.Registry.registerAll(spark)
    val df = (1 to 4000).map(_.toDouble).toDF("x")
      .withColumn("g", ($"x" % 4).cast("int"))
    df.createOrReplaceTempView("td_flow")
    // per-group digests merged == digest of everything (within rank error)
    val row = spark.sql(
      """WITH per_g AS (
           SELECT g, tdigest_agg(x) AS d FROM td_flow GROUP BY g),
         m AS (SELECT merge_tdigest(d) AS u FROM per_g)
         SELECT value_at_quantile(u, 0.5D) AS med,
                quantile_at_value(u, value_at_quantile(u, 0.5D)) AS inv,
                values_at_quantiles(u, array(0.25D, 0.5D, 0.75D)) AS vs
         FROM m""").head()
    assert(math.abs(row.getDouble(0) - 2000.0) <= 80.0, row.getDouble(0).toString)
    assert(math.abs(row.getDouble(1) - 0.5) <= 0.02)
    val vs = row.getSeq[Double](2)
    assert(vs.length == 3 && vs == vs.sorted)
    assert(math.abs(vs(0) - 1000.0) <= 80.0 && math.abs(vs(2) - 3000.0) <= 80.0)
  }
}
