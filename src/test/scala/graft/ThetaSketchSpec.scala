package graft

import org.apache.spark.sql.functions._
import graft.functions.ThetaSketch
import graft.functions.ThetaSketch._

/** Theta sketch family specs (reference plugin/trino-datasketches —
  * TestThetaSketchAggregationFunction shape: exactness below K, bounded
  * error above, mergeability, set algebra). */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(ds: org.apache.spark.sql.DataFrame,
      col: org.apache.spark.sql.Column): Sketch =
    ThetaSketch.deserialize(
      ds.agg(thetaSketchAgg(xxhash64(col))).collect()(0).getSeq[Long](0).toArray)

  test("estimate is EXACT below K distinct values") {
    val ds = spark.range(0, 1000).toDF("v")
    val sk = sketchOf(ds, $"v")
    assert(sk.estimate == 1000.0)
    assert(sk.theta == -1L) // full hash space retained
  }

  test("estimate is within 4*RSE above K, state is bounded by K") {
    val n = 200000
    val ds = spark.range(0, n).toDF("v")
    val sk = sketchOf(ds, $"v")
    assert(sk.entries.length == K, s"retained=${sk.entries.length}")
    val rse = 1.0 / math.sqrt(K - 1)
    assert(math.abs(sk.estimate - n) <= n * 4 * rse,
      s"est=${sk.estimate} exact=$n")
  }

  test("union of split halves equals the single-pass sketch bit-for-bit") {
    val all = spark.range(0, 50000).toDF("v")
    val one = sketchOf(all, $"v")
    val lo = sketchOf(all.filter($"v" < 25000), $"v")
    val hi = sketchOf(all.filter($"v" >= 25000), $"v")
    val merged = ThetaSketch.union(lo, hi)
    assert(merged.serialize.toSeq == one.serialize.toSeq)
  }

  test("merge is partitioning-invariant through the aggregate") {
    val ds = spark.range(0, 30000).toDF("v")
    def ser(parts: Int): Seq[Long] =
      ds.repartition(parts).agg(thetaSketchAgg(xxhash64($"v")))
        .collect()(0).getSeq[Long](0)
    assert(ser(1) == ser(16))
  }

  test("set algebra is exact on exact-mode sketches") {
    val a = sketchOf(spark.range(0, 3000).toDF("v"), $"v")      // [0, 3000)
    val b = sketchOf(spark.range(2000, 4000).toDF("v"), $"v")   // [2000, 4000)
    assert(ThetaSketch.union(a, b).estimate == 4000.0)
    assert(ThetaSketch.intersect(a, b).estimate == 1000.0)
    assert(ThetaSketch.aNotB(a, b).estimate == 2000.0)
    assert(ThetaSketch.aNotB(b, a).estimate == 1000.0)
  }

  test("set algebra holds error bounds in estimation mode") {
    val a = sketchOf(spark.range(0, 60000).toDF("v"), $"v")      // [0, 60k)
    val b = sketchOf(spark.range(40000, 100000).toDF("v"), $"v") // [40k, 100k)
    val rse = 1.0 / math.sqrt(K - 1)
    def ok(est: Double, exact: Double, sig: Double = 5.0): Unit =
      assert(math.abs(est - exact) <= exact * sig * rse + 1,
        s"est=$est exact=$exact")
    ok(ThetaSketch.union(a, b).estimate, 100000)
    ok(ThetaSketch.intersect(a, b).estimate, 20000, sig = 12.0)
    ok(ThetaSketch.aNotB(a, b).estimate, 40000, sig = 10.0)
  }

  test("SQL surface: agg, union aggregate, scalar algebra, cardinality") {
    graft.functions.Registry.registerAll(spark)
    spark.range(0, 20000).selectExpr("id % 4 AS g", "id AS v")
      .createOrReplaceTempView("theta_in")
    val perG = spark.sql(
      """SELECT g, theta_sketch_agg(xxhash64(CAST(v AS STRING))) AS sk,
                count(DISTINCT v) AS n
         FROM theta_in GROUP BY g""")
    perG.createOrReplaceTempView("theta_g")
    val merged = spark.sql(
      """SELECT theta_sketch_cardinality(theta_sketch_union(sk)) AS est,
                sum(n) AS exact
         FROM theta_g""").collect()(0)
    assert(math.abs(merged.getDouble(0) - merged.getLong(1)) <=
      merged.getLong(1) * 0.06)
    // scalar two-sketch ops on two groups (disjoint value sets)
    val pair = spark.sql(
      """SELECT theta_sketch_cardinality(theta_sketch_union_of(a.sk, b.sk)) AS u,
                theta_sketch_cardinality(theta_sketch_intersect_of(a.sk, b.sk)) AS i,
                theta_sketch_cardinality(theta_sketch_a_not_b(a.sk, b.sk)) AS d,
                a.n AS na, b.n AS nb
         FROM theta_g a JOIN theta_g b ON a.g = 0 AND b.g = 1""").collect()(0)
    assert(math.abs(pair.getDouble(0) - (pair.getLong(3) + pair.getLong(4))) <=
      (pair.getLong(3) + pair.getLong(4)) * 0.07)
    assert(pair.getDouble(1) <= (pair.getLong(3) + pair.getLong(4)) * 0.03)
    assert(math.abs(pair.getDouble(2) - pair.getLong(3)) <= pair.getLong(3) * 0.10)
    // intersection AGGREGATE: intersect all four group sketches (disjoint → ~0)
    val inter = spark.sql(
      "SELECT theta_sketch_cardinality(theta_sketch_intersection(sk)) FROM theta_g")
      .collect()(0).getDouble(0)
    assert(inter <= 20000 * 0.01, s"disjoint intersection est=$inter")
  }
}
