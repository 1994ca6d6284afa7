package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Sketches._

/** Sketch-aggregate queries (SURVEY.md §2.4: qdigest/tdigest +
  * approx_most_frequent; see graft.functions.Sketches).
  *
  * Oracle convention for approximate aggregates: exact reference values are
  * output columns (DuckDB reproduces them) and each estimate becomes a
  * within-error-bound boolean (DuckDB expects TRUE) — the hash compare then
  * verifies the exact plumbing and the approximation guarantee together.
  * q_approx_topk runs the space-saving sketch with capacity ≥ |distinct|,
  * where its counts are provably exact — so the oracle can hash-check the
  * sketch output against plain SQL top-k.
  */
object Approx {

  /** T-digest quantiles, oracle-checked: exact quantiles are emitted as
    * columns (DuckDB `quantile_cont` reproduces Spark's exact `percentile`
    * bit-for-bit under round-6) and the t-digest estimates as a single
    * within-1%-relative-error boolean (DuckDB expects TRUE). The exact
    * percentile columns are the sf0.01 correctness device; the scale path
    * is the t-digest itself. */
  def q_approx_quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ok = (1 to 3).map(i =>
      abs(element_at($"qs", i) - element_at($"eqs", i)) <=
        element_at($"eqs", i) * 0.01).reduce(_ && _)
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        tdigestQuantiles($"l_extendedprice", Seq(0.25, 0.5, 0.75)).as("qs"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("eqs"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        round(element_at($"eqs", 1), 6).as("q25"),
        round(element_at($"eqs", 2), 6).as("q50"),
        round(element_at($"eqs", 3), 6).as("q75"),
        ok.as("tdigest_ok"),
        $"n")
      .orderBy($"l_returnflag")
  }
  val qApproxQuantilesSql: String =
    """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
         round(quantile_cont(l_extendedprice, 0.50), 6) AS q50,
         round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
         TRUE AS tdigest_ok,
         count(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Weighted approx_percentile (reference approx_percentile(x, w, q) —
    * TDigestAggregationFunction's weighted overload): the exact weighted
    * quantiles come from Spark's percentile-with-frequency and are replayed
    * by DuckDB as quantile_cont over the weight-expanded multiset
    * (generate_series join) — bit-exact; the weighted t-digest estimate is
    * the usual within-1% boolean. */
  def q_approx_quantiles_weighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ok = (1 to 3).map(i =>
      abs(element_at($"qs", i) - element_at($"eqs", i)) <=
        element_at($"eqs", i) * 0.01).reduce(_ && _)
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        tdigestQuantilesWeighted($"l_extendedprice", $"l_linenumber".cast("double"),
          Seq(0.25, 0.5, 0.75)).as("qs"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), l_linenumber)").as("eqs"),
        sum($"l_linenumber").as("w"))
      .select($"l_returnflag",
        round(element_at($"eqs", 1), 6).as("wq25"),
        round(element_at($"eqs", 2), 6).as("wq50"),
        round(element_at($"eqs", 3), 6).as("wq75"),
        ok.as("tdigest_weighted_ok"),
        $"w")
      .orderBy($"l_returnflag")
  }
  val qApproxQuantilesWeightedSql: String =
    """WITH e AS (
         SELECT l_returnflag, l_extendedprice,
           unnest(range(1, CAST(l_linenumber AS BIGINT) + 1)) AS rep
         FROM lineitem)
       SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS wq25,
         round(quantile_cont(l_extendedprice, 0.50), 6) AS wq50,
         round(quantile_cont(l_extendedprice, 0.75), 6) AS wq75,
         TRUE AS tdigest_weighted_ok,
         count(*) AS w
       FROM e GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** HLL sketch state as a column (reference approx_set / merge /
    * cardinality — HyperLogLogType sketches flowing between aggregations):
    * per-group sketches, estimates, and a re-aggregated union of the group
    * sketches — the state-merge surface, not just the one-shot estimate.
    * Oracle-checked via exact counts + error-bound booleans; SketchSpec
    * additionally bounds the raw estimates. */
  def q_approx_hll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
    val sk = li
      .groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"),
        countDistinct($"l_orderkey").as("exact_orders"))
    val perFlag = sk.select($"l_returnflag", $"exact_orders",
      (abs(hll_sketch_estimate($"sk") - $"exact_orders") <=
        $"exact_orders" * 0.06).as("est_ok"))
    // union of the per-group sketch STATES, estimated after the merge — the
    // state-flow surface; checked against the global exact distinct count
    val merged = sk.agg(hll_union_agg($"sk").as("u"))
      .crossJoin(li.agg(countDistinct($"l_orderkey").as("exact_all")))
      .select(lit("ALL_MERGED").as("l_returnflag"),
        $"exact_all".as("exact_orders"),
        (abs(hll_sketch_estimate($"u") - $"exact_all") <=
          $"exact_all" * 0.06).as("est_ok"))
    perFlag.unionAll(merged).orderBy($"l_returnflag")
  }
  val qApproxHllSql: String =
    """SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
              TRUE AS est_ok
       FROM lineitem GROUP BY l_returnflag
       UNION ALL
       SELECT 'ALL_MERGED', CAST(count(DISTINCT l_orderkey) AS BIGINT), TRUE FROM lineitem
       ORDER BY l_returnflag"""

  def q_approx_topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .groupBy($"lang")
      .agg(
        approxMostFrequent($"source", k = 3, capacity = 64).as("top_sources"),
        countDistinct($"source").as("n_sources"))
      .orderBy($"lang")
  }
  val qApproxTopkSql: String =
    """WITH c AS (
         SELECT lang, source, count(*) AS cnt FROM documents GROUP BY 1, 2),
       r AS (
         SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rn
         FROM c)
       SELECT lang,
         string_agg(CASE WHEN rn <= 3 THEN source || ':' || cnt END, ',' ORDER BY rn) AS top_sources,
         count(*) AS n_sources
       FROM r GROUP BY lang ORDER BY lang"""

  /** Set-digest family (reference type/setdigest/: make_set_digest,
    * cardinality, intersection_cardinality, jaccard_index) via a mergeable
    * KMV sketch (graft.functions.SetDigest). Digests are built per return
    * flag and compared pairwise; the oracle carries the exact set statistics
    * and expects every estimator's error-bound boolean to be TRUE. */
  def q_agg_setdigest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.SetDigest._
    val li = table(s, dir, "lineitem")
    val digests = li.groupBy($"l_returnflag")
      .agg(
        makeSetDigest(xxhash64($"l_orderkey")).as("dig"),
        countDistinct($"l_orderkey").as("exact_n"))
    val sets = li.select($"l_returnflag".as("f"), $"l_orderkey".as("k")).distinct()
    val inter = sets.as("x").join(sets.as("y"), $"x.k" === $"y.k" && $"x.f" < $"y.f")
      .groupBy($"x.f".as("fa"), $"y.f".as("fb")).agg(count(lit(1)).as("inter_n"))
    digests.as("a").join(digests.as("b"), $"a.l_returnflag" < $"b.l_returnflag")
      .select($"a.l_returnflag".as("flag_a"), $"b.l_returnflag".as("flag_b"),
        $"a.dig".as("dig_a"), $"b.dig".as("dig_b"),
        $"a.exact_n".as("n_a"), $"b.exact_n".as("n_b"))
      .join(inter, $"flag_a" === $"fa" && $"flag_b" === $"fb")
      .withColumn("exact_j", $"inter_n".cast("double") / ($"n_a" + $"n_b" - $"inter_n"))
      .select($"flag_a", $"flag_b", $"n_a", $"n_b",
        round($"exact_j", 6).as("exact_jaccard"),
        (abs(digestCardinality($"dig_a") - $"n_a") <= $"n_a" * 0.15).as("card_a_ok"),
        (abs(digestCardinality($"dig_b") - $"n_b") <= $"n_b" * 0.15).as("card_b_ok"),
        (abs(jaccardIndex($"dig_a", $"dig_b") - $"exact_j") <= 0.08).as("jaccard_ok"),
        (abs(intersectionCardinality($"dig_a", $"dig_b") - $"inter_n") <=
          $"inter_n" * 0.25 + lit(50.0)).as("inter_ok"))
      .orderBy($"flag_a", $"flag_b")
  }
  val qAggSetdigestSql: String =
    """WITH sets AS (SELECT DISTINCT l_returnflag AS f, l_orderkey AS k FROM lineitem),
       counts AS (SELECT f, count(*) AS n FROM sets GROUP BY f),
       inter AS (
         SELECT x.f AS fa, y.f AS fb, count(*) AS inter_n
         FROM sets x JOIN sets y ON x.k = y.k AND x.f < y.f GROUP BY 1, 2)
       SELECT fa AS flag_a, fb AS flag_b, ca.n AS n_a, cb.n AS n_b,
         round(inter_n * 1.0 / (ca.n + cb.n - inter_n), 6) AS exact_jaccard,
         TRUE AS card_a_ok, TRUE AS card_b_ok, TRUE AS jaccard_ok, TRUE AS inter_ok
       FROM inter JOIN counts ca ON fa = ca.f JOIN counts cb ON fb = cb.f
       ORDER BY flag_a, flag_b"""

  /** t-digest as a first-class VALUE (reference tdigest type:
    * TDigestAggregationFunction → MergeTDigestAggregation →
    * TDigestFunctions value_at_quantile/quantile_at_value): per-group
    * digest STATES flow through a merge re-aggregation, and the scalar
    * extractors read the struct — the decoupled state surface, not the
    * fused agg+extract of q_approx_quantiles. Oracle device: exact counts
    * anchor the rows; the estimates are pinned by error-bound and
    * inversion booleans (and SketchSpec bounds the raw values). */
  def q_approx_tdigest_flow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Sketches.{tdigestAgg, tdigestMerge}
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    def valueAt(d: org.apache.spark.sql.Column, q: Double) =
      column(graft.ext.TDigestValueAtQuantile(expression(d), expression(lit(q))))
    def quantAt(d: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      column(graft.ext.TDigestQuantileAtValue(expression(d), expression(v)))
    def valuesAt(d: org.apache.spark.sql.Column, qs: Seq[Double]) =
      column(graft.ext.TDigestValuesAtQuantiles(expression(d),
        expression(array(qs.map(lit): _*).cast("array<double>"))))
    val li = table(s, dir, "lineitem")
    val sk = li.groupBy($"l_returnflag")
      .agg(tdigestAgg($"l_extendedprice").as("d"),
        count(lit(1)).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
    val perFlag = sk.select($"l_returnflag", $"n",
      (abs(valueAt($"d", 0.5) - $"exact_med") <= $"exact_med" * 0.05).as("med_ok"),
      (abs(quantAt($"d", valueAt($"d", 0.5)) - 0.5) <= lit(0.05)).as("inv_ok"),
      (valuesAt($"d", Seq(0.25, 0.5, 0.75)) ===
        array_sort(valuesAt($"d", Seq(0.25, 0.5, 0.75)))).as("mono_ok"))
    // merge the per-group digest STATES and extract from the merged digest
    val merged = sk.agg(tdigestMerge($"d").as("u"), sum($"n").as("n"))
      .crossJoin(li.agg(expr("percentile(l_extendedprice, 0.5)").as("gmed")))
      .select(lit("ALL_MERGED").as("l_returnflag"), $"n",
        (abs(valueAt($"u", 0.5) - $"gmed") <= $"gmed" * 0.05).as("med_ok"),
        lit(true).as("inv_ok"), lit(true).as("mono_ok"))
    perFlag.unionAll(merged).orderBy($"l_returnflag")
  }
  val qApproxTdigestFlowSql: String =
    """SELECT l_returnflag, count(*) AS n,
         TRUE AS med_ok, TRUE AS inv_ok, TRUE AS mono_ok
       FROM lineitem GROUP BY l_returnflag
       UNION ALL
       SELECT 'ALL_MERGED', count(*), TRUE, TRUE, TRUE FROM lineitem
       ORDER BY l_returnflag"""

  /** Theta sketch family (reference plugin/trino-datasketches: theta_sketch_agg,
    * theta_sketch_union, theta_sketch_cardinality — plus the set algebra that
    * distinguishes theta from HLL: intersection and A-not-B). Sketches are built
    * per return flag, merged as STATES via the union aggregate, and compared
    * pairwise through the scalar set ops; the oracle carries exact set
    * statistics and expects every estimator's error-bound boolean TRUE.
    * K = 4096 → RSE ≈ 1.6%, so the 6% cardinality bound is ~4σ. */
  def q_agg_theta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.ThetaSketch._
    val li = table(s, dir, "lineitem")
    val digests = li.groupBy($"l_returnflag")
      .agg(thetaSketchAgg(xxhash64($"l_orderkey")).as("sk"),
        countDistinct($"l_orderkey").as("exact_n"))
    // merged union of the per-group sketch STATES vs the global exact count
    val mergedOk = digests.agg(thetaSketchUnion($"sk").as("u"))
      .crossJoin(li.agg(countDistinct($"l_orderkey").as("exact_all")))
      .select((abs(thetaSketchCardinality($"u") - $"exact_all") <=
        $"exact_all" * 0.06).as("merged_ok"))
    val sets = li.select($"l_returnflag".as("f"), $"l_orderkey".as("k")).distinct()
    val inter = sets.as("x").join(sets.as("y"), $"x.k" === $"y.k" && $"x.f" < $"y.f")
      .groupBy($"x.f".as("fa"), $"y.f".as("fb")).agg(count(lit(1)).as("inter_n"))
    digests.as("a").join(digests.as("b"), $"a.l_returnflag" < $"b.l_returnflag")
      .select($"a.l_returnflag".as("flag_a"), $"b.l_returnflag".as("flag_b"),
        $"a.sk".as("sk_a"), $"b.sk".as("sk_b"),
        $"a.exact_n".as("n_a"), $"b.exact_n".as("n_b"))
      .join(inter, $"flag_a" === $"fa" && $"flag_b" === $"fb")
      .crossJoin(mergedOk)
      .select($"flag_a", $"flag_b", $"n_a", $"n_b", $"inter_n",
        (abs(thetaSketchCardinality($"sk_a") - $"n_a") <= $"n_a" * 0.06).as("card_a_ok"),
        (abs(thetaSketchCardinality($"sk_b") - $"n_b") <= $"n_b" * 0.06).as("card_b_ok"),
        (abs(thetaSketchCardinality(thetaSketchUnion2($"sk_a", $"sk_b")) -
          ($"n_a" + $"n_b" - $"inter_n")) <=
          ($"n_a" + $"n_b" - $"inter_n") * 0.06 + lit(50.0)).as("union_ok"),
        (abs(thetaSketchCardinality(thetaSketchIntersect2($"sk_a", $"sk_b")) -
          $"inter_n") <= $"inter_n" * 0.25 + lit(50.0)).as("inter_ok"),
        (abs(thetaSketchCardinality(thetaSketchANotB($"sk_a", $"sk_b")) -
          ($"n_a" - $"inter_n")) <=
          ($"n_a" - $"inter_n") * 0.25 + lit(50.0)).as("anotb_ok"),
        $"merged_ok")
      .orderBy($"flag_a", $"flag_b")
  }
  val qAggThetaSql: String =
    """WITH sets AS (SELECT DISTINCT l_returnflag AS f, l_orderkey AS k FROM lineitem),
       counts AS (SELECT f, count(*) AS n FROM sets GROUP BY f),
       inter AS (
         SELECT x.f AS fa, y.f AS fb, count(*) AS inter_n
         FROM sets x JOIN sets y ON x.k = y.k AND x.f < y.f GROUP BY 1, 2)
       SELECT fa AS flag_a, fb AS flag_b, ca.n AS n_a, cb.n AS n_b, inter_n,
         TRUE AS card_a_ok, TRUE AS card_b_ok, TRUE AS union_ok,
         TRUE AS inter_ok, TRUE AS anotb_ok, TRUE AS merged_ok
       FROM inter JOIN counts ca ON fa = ca.f JOIN counts cb ON fb = cb.f
       ORDER BY flag_a, flag_b"""

  val queries: Map[String, Q] = Map(
    "q_approx_tdigest_flow" -> q_approx_tdigest_flow _,
    "q_agg_theta" -> q_agg_theta _,
    "q_approx_quantiles" -> q_approx_quantiles _,
    "q_approx_quantiles_weighted" -> q_approx_quantiles_weighted _,
    "q_approx_hll" -> q_approx_hll _,
    "q_agg_setdigest" -> q_agg_setdigest _,
    "q_approx_topk" -> q_approx_topk _)

  val oracles: Map[String, String] = Map(
    "q_approx_tdigest_flow" -> qApproxTdigestFlowSql,
    "q_agg_theta" -> qAggThetaSql,
    "q_approx_topk" -> qApproxTopkSql,
    "q_approx_quantiles_weighted" -> qApproxQuantilesWeightedSql,
    "q_agg_setdigest" -> qAggSetdigestSql,
    "q_approx_quantiles" -> qApproxQuantilesSql,
    "q_approx_hll" -> qApproxHllSql)
}
