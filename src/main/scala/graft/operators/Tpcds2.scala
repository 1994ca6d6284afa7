package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 2 (round-8 breadth; reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q14.sql, q23.sql, q47.sql, q51.sql, q78.sql). Five more structurally
  * distinct shapes over the TPC-H-ish fixtures:
  *
  *  - q14: INTERSECT-driven cross-channel item set + scalar average gate.
  *  - q23: "frequent items" and "best customers" derived semi-join filters
  *    with a scalar max-spend threshold.
  *  - q47: per-series moving deviation — group-wide sum/count window vs the
  *    row value, with lag/lead neighbors.
  *  - q51: cumulative per-channel series FULL OUTER joined, running
  *    comparison.
  *  - q78: returns-excluded per-channel aggregates ratio-joined.
  *
  * Oracle-determinism: thresholds that TPC-DS states as ratios
  * (`> avg(...)`, `> 0.95 * max(...)`, `±10% of avg`) are CROSS-MULTIPLIED
  * into exact DECIMAL/BIGINT comparisons, so no engine-specific float
  * division decides a row's membership; output money stays DECIMAL until a
  * final correctly-rounded DOUBLE cast (package.scala convention). */
object Tpcds2 {

  private def channel(s: SparkSession) = {
    import s.implicits._
    when($"l_linenumber" % 3 === 0, "store")
      .when($"l_linenumber" % 3 === 1, "web")
      .otherwise("catalog")
  }
  private val channelSql =
    "CASE l_linenumber % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END"

  /** q14 shape: items sold in ALL three channels (two INTERSECTs), fact rows
    * over those items gated by "price above the overall average", grouped by
    * (channel, brand). The average gate is cross-multiplied
    * (price·N > Σprice) so membership is decided in exact arithmetic. */
  def q_ds_cross_channel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
    val ch = channel(s)
    val crossItems = li.filter(ch === "store").select($"l_partkey")
      .intersect(li.filter(ch === "web").select($"l_partkey"))
      .intersect(li.filter(ch === "catalog").select($"l_partkey"))
    val totals = li.agg(count(lit(1)).as("n_all"),
      sum(dec($"l_extendedprice")).as("sum_all"))
    li.select(ch.as("channel"), $"l_partkey", $"l_extendedprice")
      .join(crossItems.distinct(), Seq("l_partkey"), "left_semi")
      .crossJoin(broadcast(totals))
      .filter(dec($"l_extendedprice") * $"n_all" > $"sum_all")
      .join(broadcast(table(s, dir, "part").select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"channel", $"p_brand")
      .agg(count(lit(1)).as("sales_cnt"),
        asDouble(sum(dec($"l_extendedprice"))).as("sales_amt"))
      .orderBy($"channel", $"p_brand")
  }
  val qDsCrossChannelSql: String =
    s"""WITH cross_items AS (
         SELECT l_partkey FROM lineitem WHERE $channelSql = 'store'
         INTERSECT
         SELECT l_partkey FROM lineitem WHERE $channelSql = 'web'
         INTERSECT
         SELECT l_partkey FROM lineitem WHERE $channelSql = 'catalog'),
       t AS (
         SELECT count(*) AS n_all,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_all
         FROM lineitem)
       SELECT $channelSql AS channel, p_brand,
         count(*) AS sales_cnt,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sales_amt
       FROM lineitem, t
       JOIN part ON l_partkey = p_partkey
       WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
         AND CAST(l_extendedprice AS DECIMAL(12,2)) * n_all > sum_all
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q23 shape: fact rows filtered to frequently-sold items AND
    * best customers (spend·4 > max_spend·3), summed per order month. Both
    * filters are groupBy-derived semi joins; the max-spend threshold is a
    * 1-row broadcast scalar exactly like the reference's max_csales CTE. */
  def q_ds_frequent_best(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
    val ord = table(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val frequent = li.groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 35).select($"l_partkey")
    val spend = table(s, dir, "orders").groupBy($"o_custkey")
      .agg(sum(dec($"o_totalprice")).as("csales"))
    val maxSpend = spend.agg(max($"csales").as("max_csales"))
    val best = spend.crossJoin(broadcast(maxSpend))
      .filter($"csales" * 4 > $"max_csales" * 3).select($"o_custkey")
    li.select($"l_orderkey", $"l_partkey", $"l_extendedprice")
      .join(frequent, Seq("l_partkey"), "left_semi")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(best, Seq("o_custkey"), "left_semi")
      .groupBy(year($"o_orderdate").cast("long").as("d_year"),
        month($"o_orderdate").cast("long").as("d_moy"))
      .agg(count(lit(1)).as("sales_cnt"),
        asDouble(sum(dec($"l_extendedprice"))).as("sales_amt"))
      .orderBy($"d_year", $"d_moy")
  }
  val qDsFrequentBestSql: String =
    """WITH frequent AS (
         SELECT l_partkey FROM lineitem GROUP BY 1 HAVING count(*) > 35),
       spend AS (
         SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS csales
         FROM orders GROUP BY 1),
       best AS (
         SELECT o_custkey FROM spend, (SELECT max(csales) AS max_csales FROM spend)
         WHERE csales * 4 > max_csales * 3)
       SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year,
         CAST(month(o_orderdate) AS BIGINT) AS d_moy,
         count(*) AS sales_cnt,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sales_amt
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_partkey IN (SELECT l_partkey FROM frequent)
         AND o_custkey IN (SELECT o_custkey FROM best)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q47 shape: monthly sales per brand; rows deviating >10% from
    * their (brand, year) mean, with the neighboring months' sales alongside.
    * The deviation test |sales·n − Σ| · 10 > Σ is exact; the year mean is
    * reported as its exact (Σ, n) pair instead of a lossy division. */
  def q_ds_moving_dev(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = table(s, dir, "lineitem")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(table(s, dir, "part").select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", year($"o_orderdate").cast("long").as("d_year"),
        month($"o_orderdate").cast("long").as("d_moy"))
      .agg(sum(dec($"l_extendedprice")).as("sales"))
    val wYear = Window.partitionBy($"p_brand", $"d_year")
    val wSeq = Window.partitionBy($"p_brand").orderBy($"d_year", $"d_moy")
    monthly
      .withColumn("year_sum", sum($"sales").over(wYear))
      .withColumn("year_cnt", count(lit(1)).over(wYear))
      .withColumn("lag_sales", lag($"sales", 1).over(wSeq))
      .withColumn("lead_sales", lead($"sales", 1).over(wSeq))
      .filter(abs($"sales" * $"year_cnt" - $"year_sum") * 10 > $"year_sum")
      .select($"p_brand", $"d_year", $"d_moy",
        asDouble($"sales").as("sales"),
        asDouble($"year_sum").as("year_sum"),
        $"year_cnt",
        asDouble($"lag_sales").as("lag_sales"),
        asDouble($"lead_sales").as("lead_sales"))
      .orderBy($"p_brand", $"d_year", $"d_moy")
  }
  val qDsMovingDevSql: String =
    """WITH monthly AS (
         SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS d_year,
           CAST(month(o_orderdate) AS BIGINT) AS d_moy,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2, 3),
       w AS (
         SELECT *,
           sum(sales) OVER (PARTITION BY p_brand, d_year) AS year_sum,
           count(*) OVER (PARTITION BY p_brand, d_year) AS year_cnt,
           lag(sales, 1) OVER (PARTITION BY p_brand ORDER BY d_year, d_moy) AS lag_sales,
           lead(sales, 1) OVER (PARTITION BY p_brand ORDER BY d_year, d_moy) AS lead_sales
         FROM monthly)
       SELECT p_brand, d_year, d_moy,
         CAST(sales AS DOUBLE) AS sales,
         CAST(year_sum AS DOUBLE) AS year_sum,
         year_cnt,
         CAST(lag_sales AS DOUBLE) AS lag_sales,
         CAST(lead_sales AS DOUBLE) AS lead_sales
       FROM w
       WHERE abs(sales * year_cnt - year_sum) * 10 > year_sum
       ORDER BY p_brand, d_year, d_moy"""

  /** q51 shape: store and web monthly series per brand FULL OUTER
    * joined on (mfgr, month-seq), cumulative sums compared where the web
    * running total overtakes the store's. */
  def q_ds_cumulative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(table(s, dir, "part").select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .withColumn("ym", (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long"))
    val ch = channel(s)
    def series(name: String) = li.filter(ch === name)
      .groupBy($"p_brand", $"ym").agg(sum(dec($"l_extendedprice")).as(s"${name}_sales"))
    val joined = series("web").withColumnRenamed("p_brand", "w_mfgr").withColumnRenamed("ym", "w_ym")
      .join(series("store").withColumnRenamed("p_brand", "s_mfgr").withColumnRenamed("ym", "s_ym"),
        $"w_mfgr" === $"s_mfgr" && $"w_ym" === $"s_ym", "full_outer")
      .select(coalesce($"w_mfgr", $"s_mfgr").as("mfgr"),
        coalesce($"w_ym", $"s_ym").as("ym"),
        $"web_sales", $"store_sales")
    val wCum = Window.partitionBy($"mfgr").orderBy($"ym")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("web_cum", sum(coalesce($"web_sales", dec(lit(0)))).over(wCum))
      .withColumn("store_cum", sum(coalesce($"store_sales", dec(lit(0)))).over(wCum))
      .filter($"web_cum" > $"store_cum")
      .select($"mfgr", $"ym",
        asDouble($"web_cum").as("web_cum"), asDouble($"store_cum").as("store_cum"))
      .orderBy($"mfgr", $"ym")
  }
  val qDsCumulativeSql: String =
    s"""WITH base AS (
         SELECT p_brand, CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           $channelSql AS channel, CAST(l_extendedprice AS DECIMAL(12,2)) AS price
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey),
       web AS (
         SELECT p_brand, ym, sum(price) AS web_sales FROM base
         WHERE channel = 'web' GROUP BY 1, 2),
       store AS (
         SELECT p_brand, ym, sum(price) AS store_sales FROM base
         WHERE channel = 'store' GROUP BY 1, 2),
       j AS (
         SELECT coalesce(web.p_brand, store.p_brand) AS mfgr,
           coalesce(web.ym, store.ym) AS ym, web_sales, store_sales
         FROM web FULL OUTER JOIN store
           ON web.p_brand = store.p_brand AND web.ym = store.ym),
       c AS (
         SELECT mfgr, ym,
           sum(coalesce(web_sales, 0)) OVER
             (PARTITION BY mfgr ORDER BY ym ROWS UNBOUNDED PRECEDING) AS web_cum,
           sum(coalesce(store_sales, 0)) OVER
             (PARTITION BY mfgr ORDER BY ym ROWS UNBOUNDED PRECEDING) AS store_cum
         FROM j)
       SELECT mfgr, ym, CAST(web_cum AS DOUBLE) AS web_cum,
         CAST(store_cum AS DOUBLE) AS store_cum
       FROM c WHERE web_cum > store_cum
       ORDER BY mfgr, ym"""

  /** q78 shape: returns-excluded (l_returnflag <> 'R') per-year-and-item
    * store vs web aggregates, inner-joined where both channels sold, with
    * the store/web quantity ratio as a correctly-rounded double. */
  def q_ds_returns_excluded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter($"l_returnflag" =!= "R")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn("d_year", year($"o_orderdate").cast("long"))
    val ch = channel(s)
    def side(name: String, p: String) = li.filter(ch === name)
      .groupBy($"d_year", $"l_partkey")
      .agg(sum($"l_quantity").cast("long").as(s"${p}_qty"),
        sum(dec($"l_extendedprice")).as(s"${p}_amt"))
    side("store", "ss")
      .join(side("web", "ws"), Seq("d_year", "l_partkey"))
      .select($"d_year", $"l_partkey", $"ss_qty", $"ws_qty",
        round($"ss_qty".cast("double") / $"ws_qty", 6).as("qty_ratio"),
        asDouble($"ss_amt").as("ss_amt"), asDouble($"ws_amt").as("ws_amt"))
      .orderBy($"d_year", $"l_partkey")
  }
  val qDsReturnsExcludedSql: String =
    s"""WITH base AS (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year, l_partkey,
           $channelSql AS channel, l_quantity,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_returnflag <> 'R'),
       ss AS (
         SELECT d_year, l_partkey, CAST(sum(l_quantity) AS BIGINT) AS ss_qty,
           sum(price) AS ss_amt
         FROM base WHERE channel = 'store' GROUP BY 1, 2),
       ws AS (
         SELECT d_year, l_partkey, CAST(sum(l_quantity) AS BIGINT) AS ws_qty,
           sum(price) AS ws_amt
         FROM base WHERE channel = 'web' GROUP BY 1, 2)
       SELECT d_year, l_partkey, ss_qty, ws_qty,
         round(CAST(ss_qty AS DOUBLE) / ws_qty, 6) AS qty_ratio,
         CAST(ss_amt AS DOUBLE) AS ss_amt, CAST(ws_amt AS DOUBLE) AS ws_amt
       FROM ss JOIN ws USING (d_year, l_partkey)
       ORDER BY d_year, l_partkey"""

  val queries: Map[String, Q] = Map(
    "q_ds_cross_channel" -> q_ds_cross_channel _,
    "q_ds_frequent_best" -> q_ds_frequent_best _,
    "q_ds_moving_dev" -> q_ds_moving_dev _,
    "q_ds_cumulative" -> q_ds_cumulative _,
    "q_ds_returns_excluded" -> q_ds_returns_excluded _)

  val oracles: Map[String, String] = Map(
    "q_ds_cross_channel" -> qDsCrossChannelSql,
    "q_ds_frequent_best" -> qDsFrequentBestSql,
    "q_ds_moving_dev" -> qDsMovingDevSql,
    "q_ds_cumulative" -> qDsCumulativeSql,
    "q_ds_returns_excluded" -> qDsReturnsExcludedSql)
}
