package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-DS-shape mini-suite (VERDICT r6 "what's missing" #3): the reference
  * ships ~99 TPC-DS texts as its second macro benchmark
  * (reference: testing/trino-benchmark-queries/src/main/resources/sql/trino/
  * tpcds/q05.sql, q35.sql, q74.sql, q76.sql, q67.sql) — these five adapt the
  * structurally-distinct shapes to the TPC-H-ish fixtures: multi-channel
  * UNION fact join (q76), padded sales/returns UNION + ROLLUP (q5),
  * correlated multi-EXISTS demographic slice (q35), year-over-year
  * channel-growth self-join (q74), and ROLLUP + rank-within-channel (q67).
  *
  * The fixtures have no separate channel fact tables, so the channel device
  * is `l_linenumber % 3` (store/web/catalog) — deterministic and skew-free.
  * Scale discipline as everywhere: money through exact DECIMAL, dims
  * broadcast, one fact shuffle per aggregate, ROLLUP via Expand exactly as
  * the reference plans grouping sets (MarkDistinct/Expand equivalence noted
  * at Aggregates.scala).
  */
object Tpcds {

  private def channel(s: SparkSession) = {
    import s.implicits._
    when($"l_linenumber" % 3 === 0, "store")
      .when($"l_linenumber" % 3 === 1, "web")
      .otherwise("catalog")
  }
  private val channelSql =
    "CASE l_linenumber % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END"

  /** q76 shape: UNION ALL of channel-tagged fact slices → dim joins → count +
    * sum per (channel, col_name, year, quarter, category). The three slices
    * come from one fact table here, so the dim joins sit above the union —
    * same semantics, one scan and one broadcast instead of three. */
  def q_ds_multichannel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val slices = Seq(
      ("store", "l_suppkey", 0), ("web", "l_partkey", 1), ("catalog", "l_orderkey", 2))
      .map { case (ch, colName, m) =>
        table(s, dir, "lineitem").filter($"l_linenumber" % 3 === m)
          .select(lit(ch).as("channel"), lit(colName).as("col_name"),
            $"l_orderkey", $"l_partkey", $"l_extendedprice")
      }.reduce(_ unionByName _)
    slices
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(table(s, dir, "part").select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"channel", $"col_name",
        year($"o_orderdate").cast("long").as("d_year"),
        quarter($"o_orderdate").cast("long").as("d_qoy"),
        $"p_type".as("category"))
      .agg(count(lit(1)).as("sales_cnt"),
        asDouble(sum(dec($"l_extendedprice"))).as("sales_amt"))
      .orderBy($"channel", $"col_name", $"d_year", $"d_qoy", $"category")
  }
  val qDsMultichannelSql: String =
    s"""SELECT channel, col_name,
         CAST(year(o_orderdate) AS BIGINT) AS d_year,
         CAST(quarter(o_orderdate) AS BIGINT) AS d_qoy,
         p_type AS category,
         count(*) AS sales_cnt,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sales_amt
       FROM (
         SELECT 'store' AS channel, 'l_suppkey' AS col_name, l_orderkey, l_partkey, l_extendedprice
         FROM lineitem WHERE l_linenumber % 3 = 0
         UNION ALL
         SELECT 'web', 'l_partkey', l_orderkey, l_partkey, l_extendedprice
         FROM lineitem WHERE l_linenumber % 3 = 1
         UNION ALL
         SELECT 'catalog', 'l_orderkey', l_orderkey, l_partkey, l_extendedprice
         FROM lineitem WHERE l_linenumber % 3 = 2)
       JOIN orders ON l_orderkey = o_orderkey
       JOIN part ON l_partkey = p_partkey
       GROUP BY 1, 2, 3, 4, 5
       ORDER BY 1, 2, 3, 4, 5"""

  /** q5 shape: sales and returns as zero-padded UNION ALL branches of one
    * channel relation, rolled up over (channel, nation). */
  def q_ds_rollup_channels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(table(s, dir, "customer").select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(table(s, dir, "nation").select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
    val zero = lit(0).cast(DecimalType(12, 2))
    val sales = li.filter($"l_returnflag" =!= "R")
      .select(channel(s).as("channel"), $"n_name",
        dec($"l_extendedprice").as("sales_price"), zero.as("return_amt"))
    val returns = li.filter($"l_returnflag" === "R")
      .select(channel(s).as("channel"), $"n_name",
        zero.as("sales_price"), dec($"l_extendedprice").as("return_amt"))
    sales.unionByName(returns)
      .rollup($"channel", $"n_name")
      .agg(asDouble(sum($"sales_price")).as("sales"),
        asDouble(sum($"return_amt")).as("returns"),
        asDouble(sum(dec($"sales_price") - dec($"return_amt"))).as("profit"))
      .orderBy($"channel".asc_nulls_first, $"n_name".asc_nulls_first)
  }
  val qDsRollupChannelsSql: String =
    s"""SELECT channel, n_name,
         CAST(sum(sales_price) AS DOUBLE) AS sales,
         CAST(sum(return_amt) AS DOUBLE) AS returns,
         CAST(sum(CAST(sales_price AS DECIMAL(12,2)) - CAST(return_amt AS DECIMAL(12,2))) AS DOUBLE) AS profit
       FROM (
         SELECT $channelSql AS channel, n_name,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS sales_price,
           CAST(0 AS DECIMAL(12,2)) AS return_amt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag <> 'R'
         UNION ALL
         SELECT $channelSql, n_name,
           CAST(0 AS DECIMAL(12,2)),
           CAST(l_extendedprice AS DECIMAL(12,2))
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R')
       GROUP BY ROLLUP (channel, n_name)
       ORDER BY channel NULLS FIRST, n_name NULLS FIRST"""

  /** q35 shape: demographic slice gated by one required EXISTS and a
    * disjunction of two more, aggregated per (nation, segment). The averages
    * are emitted as exact-sum / count so both engines divide identically. */
  def q_ds_correlated_exists(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
      .join(broadcast(table(s, dir, "nation").select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
    val o96 = table(s, dir, "orders")
      .filter(year($"o_orderdate") === 1996 && quarter($"o_orderdate") < 4)
      .select($"o_custkey")
    val urgent = table(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("u_custkey"))
    val returned = table(s, dir, "orders")
      .join(table(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey"), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("r_custkey"))
    // EXISTS a AND (EXISTS b OR EXISTS c) — the disjunction is a semi-join
    // on the union of the two probe key sets (distinct-free: semi-join
    // semantics dedup internally)
    c.join(o96, $"c_custkey" === $"o_custkey", "left_semi")
      .join(urgent.select($"u_custkey".as("k"))
          .unionByName(returned.select($"r_custkey".as("k"))),
        $"c_custkey" === $"k", "left_semi")
      .groupBy($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        asDouble(min(dec($"c_acctbal"))).as("min_bal"),
        asDouble(max(dec($"c_acctbal"))).as("max_bal"),
        asDouble(sum(dec($"c_acctbal"))).as("sum_bal"))
      .withColumn("avg_bal", $"sum_bal" / $"cnt")
      .orderBy($"n_name", $"c_mktsegment")
  }
  val qDsCorrelatedExistsSql: String =
    """SELECT n_name, c_mktsegment, cnt, min_bal, max_bal, sum_bal,
         sum_bal / cnt AS avg_bal
       FROM (
         SELECT n_name, c_mktsegment, count(*) AS cnt,
           CAST(min(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
           CAST(max(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND year(o_orderdate) = 1996 AND quarter(o_orderdate) < 4)
           AND (EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             OR EXISTS (SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                        WHERE o_custkey = c_custkey AND l_returnflag = 'R'))
         GROUP BY n_name, c_mktsegment)
       ORDER BY n_name, c_mktsegment"""

  /** q74 shape: per-customer year totals per channel (store = even line
    * numbers, web = odd), self-joined 1996 vs 1997, keeping customers whose
    * web growth ratio beats their store growth ratio. */
  def q_ds_yoy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val yearTotal = table(s, dir, "lineitem")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .filter(year($"o_orderdate").isin(1996, 1997))
      .groupBy($"o_custkey".as("customer_id"),
        year($"o_orderdate").cast("long").as("yr"),
        when($"l_linenumber" % 2 === 0, "s").otherwise("w").as("sale_type"))
      .agg(sum(dec($"l_extendedprice")).as("year_total"))
    def slice(t: String, y: Int, alias: String) =
      yearTotal.filter($"sale_type" === t && $"yr" === y)
        .select($"customer_id".as(s"${alias}_cust"), $"year_total".as(s"${alias}_total"))
    slice("s", 1996, "s96").join(slice("s", 1997, "s97"), $"s96_cust" === $"s97_cust")
      .join(slice("w", 1996, "w96"), $"s96_cust" === $"w96_cust")
      .join(slice("w", 1997, "w97"), $"s96_cust" === $"w97_cust")
      .filter($"s96_total" > 0 && $"w96_total" > 0)
      .withColumn("web_ratio", asDouble($"w97_total") / asDouble($"w96_total"))
      .withColumn("store_ratio", asDouble($"s97_total") / asDouble($"s96_total"))
      .filter($"web_ratio" > $"store_ratio")
      .select($"s96_cust".as("customer_id"), $"web_ratio", $"store_ratio")
      .orderBy($"customer_id")
  }
  val qDsYoySql: String =
    """WITH year_total AS (
         SELECT o_custkey AS customer_id,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CASE WHEN l_linenumber % 2 = 0 THEN 's' ELSE 'w' END AS sale_type,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS year_total
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE year(o_orderdate) IN (1996, 1997)
         GROUP BY 1, 2, 3)
       SELECT s96.customer_id AS customer_id,
         CAST(w97.year_total AS DOUBLE) / CAST(w96.year_total AS DOUBLE) AS web_ratio,
         CAST(s97.year_total AS DOUBLE) / CAST(s96.year_total AS DOUBLE) AS store_ratio
       FROM year_total s96
       JOIN year_total s97 ON s96.customer_id = s97.customer_id
       JOIN year_total w96 ON s96.customer_id = w96.customer_id
       JOIN year_total w97 ON s96.customer_id = w97.customer_id
       WHERE s96.sale_type = 's' AND s96.yr = 1996
         AND s97.sale_type = 's' AND s97.yr = 1997
         AND w96.sale_type = 'w' AND w96.yr = 1996
         AND w97.sale_type = 'w' AND w97.yr = 1997
         AND s96.year_total > 0 AND w96.year_total > 0
         AND CAST(w97.year_total AS DOUBLE) / CAST(w96.year_total AS DOUBLE)
           > CAST(s97.year_total AS DOUBLE) / CAST(s96.year_total AS DOUBLE)
       ORDER BY customer_id"""

  /** q67 shape: revenue rolled up over the (year, month) hierarchy inside
    * each channel, then ranked within the channel, top 5 kept. */
  def q_ds_rollup_rank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = table(s, dir, "lineitem")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select(channel(s).as("ch"),
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        $"l_extendedprice")
    val rolled = base
      .groupBy($"ch", $"yr", $"mo")
      .agg(sum(dec($"l_extendedprice")).as("rev0"))
      .rollup($"ch", $"yr", $"mo")
      .agg(asDouble(sum($"rev0")).as("revenue"))
      .filter($"ch".isNotNull) // rank within channel: channel must be present
    val w = Window.partitionBy($"ch")
      .orderBy($"revenue".desc, coalesce($"yr", lit(-1L)), coalesce($"mo", lit(-1L)))
    rolled.withColumn("rk", rank().over(w))
      .filter($"rk" <= 5)
      // -1 sentinels instead of NULL subtotal keys: a nullable int64 column
      // round-trips as float64 in pandas and would hash-mismatch on dtype
      .select($"ch", coalesce($"yr", lit(-1L)).as("yr"),
        coalesce($"mo", lit(-1L)).as("mo"), $"revenue", $"rk")
      .orderBy($"ch", $"rk")
  }
  val qDsRollupRankSql: String =
    s"""SELECT ch, coalesce(yr, -1) AS yr, coalesce(mo, -1) AS mo, revenue, rk
       FROM (
         SELECT ch, yr, mo, revenue,
           rank() OVER (PARTITION BY ch
             ORDER BY revenue DESC, coalesce(yr, -1), coalesce(mo, -1)) AS rk
         FROM (
           SELECT ch, yr, mo, CAST(sum(rev0) AS DOUBLE) AS revenue
           FROM (
             SELECT ch, yr, mo, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev0
             FROM (
               SELECT $channelSql AS ch,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mo,
                 l_extendedprice
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             GROUP BY 1, 2, 3)
           GROUP BY ROLLUP (ch, yr, mo))
         WHERE ch IS NOT NULL)
       WHERE rk <= 5
       ORDER BY ch, rk"""

  /** q88 shape: a battery of independent scalar-count subqueries (time-slot
    * counts there; (year, line-parity) buckets here) cross-joined into one
    * row. Each count is its own two-phase aggregate; the joins are 1-row
    * broadcasts — q88's signature plan. */
  def q_ds_multi_scalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = table(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber")
      .join(table(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
    def slot(yr: Int, parity: Int, name: String) =
      base.filter(year($"o_orderdate") === yr && $"l_linenumber" % 2 === parity)
        .agg(count(lit(1)).as(name))
    slot(1995, 0, "s1").crossJoin(broadcast(slot(1995, 1, "s2")))
      .crossJoin(broadcast(slot(1996, 0, "s3")))
      .crossJoin(broadcast(slot(1996, 1, "s4")))
      .crossJoin(broadcast(slot(1997, 0, "s5")))
      .crossJoin(broadcast(slot(1997, 1, "s6")))
  }
  val qDsMultiScalarSql: String =
    """SELECT * FROM
         (SELECT count(*) AS s1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1995 AND l_linenumber % 2 = 0),
         (SELECT count(*) AS s2 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1995 AND l_linenumber % 2 = 1),
         (SELECT count(*) AS s3 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1996 AND l_linenumber % 2 = 0),
         (SELECT count(*) AS s4 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1996 AND l_linenumber % 2 = 1),
         (SELECT count(*) AS s5 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1997 AND l_linenumber % 2 = 0),
         (SELECT count(*) AS s6 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1997 AND l_linenumber % 2 = 1)"""

  val queries: Map[String, Q] = Map(
    "q_ds_multi_scalar" -> q_ds_multi_scalar _,
    "q_ds_multichannel" -> q_ds_multichannel _,
    "q_ds_rollup_channels" -> q_ds_rollup_channels _,
    "q_ds_correlated_exists" -> q_ds_correlated_exists _,
    "q_ds_yoy" -> q_ds_yoy _,
    "q_ds_rollup_rank" -> q_ds_rollup_rank _)

  val oracles: Map[String, String] = Map(
    "q_ds_multi_scalar" -> qDsMultiScalarSql,
    "q_ds_multichannel" -> qDsMultichannelSql,
    "q_ds_rollup_channels" -> qDsRollupChannelsSql,
    "q_ds_correlated_exists" -> qDsCorrelatedExistsSql,
    "q_ds_yoy" -> qDsYoySql,
    "q_ds_rollup_rank" -> qDsRollupRankSql)
}
