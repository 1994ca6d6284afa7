package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Sketches._

/** Sketch-aggregate queries (SURVEY.md §2.4: qdigest/tdigest +
  * approx_most_frequent; see graft.functions.Sketches).
  *
  * q_approx_quantiles is rows-only checked (digest interpolation is
  * engine-specific; SketchSpec bounds the error against exact percentiles).
  * q_approx_topk runs the space-saving sketch with capacity ≥ |distinct|,
  * where its counts are provably exact — so the oracle can hash-check the
  * sketch output against plain SQL top-k.
  */
object Approx {

  def q_approx_quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        tdigestQuantiles($"l_extendedprice", Seq(0.25, 0.5, 0.75)).as("qs"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        round(element_at($"qs", 1), 2).as("q25"),
        round(element_at($"qs", 2), 2).as("q50"),
        round(element_at($"qs", 3), 2).as("q75"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** HLL sketch state as a column (reference approx_set / merge /
    * cardinality — HyperLogLogType sketches flowing between aggregations):
    * per-group sketches, estimates, and a re-aggregated union of the group
    * sketches — the state-merge surface, not just the one-shot estimate.
    * Rows-only check (sketch hashing is engine-specific); SketchSpec bounds
    * the estimates against exact counts. */
  def q_approx_hll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"),
        countDistinct($"l_orderkey").as("exact_orders"))
    val perFlag = sk.select($"l_returnflag",
      hll_sketch_estimate($"sk").as("est_orders"), $"exact_orders")
    val merged = sk.agg(hll_union_agg($"sk").as("u"), sum($"exact_orders").as("sum_exact"))
      .select(lit("ALL_MERGED").as("l_returnflag"),
        hll_sketch_estimate($"u").as("est_orders"),
        lit(null).cast("long").as("exact_orders"))
    perFlag.unionAll(merged).orderBy($"l_returnflag")
  }

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

  val queries: Map[String, Q] = Map(
    "q_approx_quantiles" -> q_approx_quantiles _,
    "q_approx_hll" -> q_approx_hll _,
    "q_approx_topk" -> q_approx_topk _)

  val oracles: Map[String, String] = Map(
    "q_approx_topk" -> qApproxTopkSql)
}
