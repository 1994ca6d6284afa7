package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining operator-inventory items (SURVEY.md §2.9, §2.11, approx aggs §2.4).
  *
  *  - sequence TVF (reference: operator/table/SequenceFunction.java:58) →
  *    spark.range + sequence()/explode.
  *  - map functions (reference: MapConstructor.java:52, map_from_entries,
  *    transform_values et al.) → built-in map_* functions; output flattened to
  *    strings for engine-portable comparison.
  *  - approx_distinct / approx_percentile (reference:
  *    ApproximateCountDistinctAggregation.java:45, QuantileDigestAggregationFunction.java:41)
  *    → approx_count_distinct (HLL++) / approx_percentile; sketches are
  *    engine-specific so ApproxSpec asserts error bounds instead of an oracle.
  */
object Misc {

  /** Numeric-range TVF + per-row sequence explosion. */
  def q_tvf_sequence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.range(1, 101).toDF("i")
      .withColumn("j", explode(sequence(lit(1L), $"i")))
      .groupBy($"i")
      .agg(count(lit(1)).as("n"), sum($"j").as("total"))
      .orderBy($"i")
  }
  val qTvfSequenceSql: String =
    """WITH base AS (SELECT range AS i FROM range(1, 101)),
       x AS (SELECT i, unnest(range(1, CAST(i + 1 AS INT))) AS j FROM base)
       SELECT i, count(*) AS n, CAST(sum(j) AS BIGINT) AS total
       FROM x GROUP BY i ORDER BY i"""

  /** Map construction + iteration, flattened to a deterministic string. */
  def q_map_fns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"lang")
      .agg(map_from_entries(sort_array(collect_list(struct($"source", $"cnt")))).as("m"))
      .select($"lang",
        size(map_keys($"m")).cast("long").as("n_sources"),
        array_join(transform(map_entries($"m"), e =>
          concat(e.getField("key"), lit(":"), e.getField("value"))), ",").as("hist"),
        try_element_at($"m", lit("src1")).as("src1_cnt"))
      .orderBy($"lang")
  }
  val qMapFnsSql: String =
    """WITH c AS (
         SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source)
       SELECT lang, count(*) AS n_sources,
         string_agg(source || ':' || cnt, ',' ORDER BY source) AS hist,
         CAST(max(CASE WHEN source = 'src1' THEN cnt END) AS BIGINT) AS src1_cnt
       FROM c GROUP BY lang ORDER BY lang"""

  /** Approximate aggregates, oracle-checked: the exact reference values are
    * emitted as columns (DuckDB reproduces them) and each approximate value is
    * emitted as a within-error-bound boolean (DuckDB expects TRUE) — so the
    * hash compare verifies both the exact plumbing and the approximation
    * guarantee. ApproxSpec additionally bounds the raw estimates. The exact
    * percentile reference is a correctness-gate device (sf0.01); the scale
    * path for quantiles is q_agg_percentile_approx / the t-digest Aggregator. */
  def q_approx_agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("apx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("apx_median"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
        count(lit(1)).as("n"))
      .select($"l_returnflag", $"exact_orders", $"n",
        (abs($"apx_orders" - $"exact_orders") <= $"exact_orders" * 0.06).as("distinct_ok"),
        (abs($"apx_median" - $"exact_median") <= $"exact_median" * 0.01).as("median_ok"),
        round($"exact_median", 6).as("median"))
      .orderBy($"l_returnflag")
  }
  val qApproxAggSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, count(*) AS n,
         TRUE AS distinct_ok, TRUE AS median_ok,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS median
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Materialized view create + materialized read (graft.catalog
    * .MaterializedView over CowTable storage; reference
    * ConnectorMaterializedViewDefinition / CreateMaterializedViewTask). The
    * defining query is reference-dialect SQL; reading the view serves the
    * stored CowTable snapshot, which the oracle recomputes directly.
    * Refresh/staleness semantics are spec-verified in CowTableSpec. */
  def q_mv_read(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mv_q").toString
    val mv = graft.catalog.MaterializedView.create(s, root,
      """SELECT o_orderpriority, count(*) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM orders GROUP BY o_orderpriority""", dir)
    mv.read().orderBy($"o_orderpriority")
  }
  val qMvReadSql: String =
    """SELECT o_orderpriority, count(*) AS cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val queries: Map[String, Q] = Map(
    "q_tvf_sequence" -> q_tvf_sequence _,
    "q_map_fns" -> q_map_fns _,
    "q_mv_read" -> q_mv_read _,
    "q_approx_agg" -> q_approx_agg _)

  val oracles: Map[String, String] = Map(
    "q_tvf_sequence" -> qTvfSequenceSql,
    "q_map_fns" -> qMapFnsSql,
    "q_mv_read" -> qMvReadSql,
    "q_approx_agg" -> qApproxAggSql)
}
