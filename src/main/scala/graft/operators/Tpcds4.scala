package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 4 (reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q38.sql, q87.sql, q21.sql, q62.sql). Four more structurally distinct
  * shapes over the fixtures (channel device: `l_linenumber % 3`, the
  * convention set in `Tpcds`):
  *
  *  - q38 "hot customers": COUNT over a 3-way INTERSECT of per-channel
  *    DISTINCT (customer, date) sets. Catalyst lowers each INTERSECT to an
  *    aggregate + LeftSemi join, so at scale this is three channel scans
  *    plus two semi joins on the distinct-pair set — never a fact×fact join.
  *  - q87 "cool customers": the EXCEPT-chain twin ((ch0 EXCEPT ch1) EXCEPT
  *    ch2) — LeftAnti instead of LeftSemi, same distinct-set leverage.
  *  - q21 inventory before/after: one wide conditional aggregate per
  *    (warehouse, item) with a ratio BAND on the two sums. The 2/3..3/2
  *    band is cross-multiplied into exact DECIMAL comparisons so no float
  *    division decides membership.
  *  - q62 shipping latency buckets: five `sum(CASE)` latency bands in one
  *    fact pass, grouped by ship-mode/warehouse dims (broadcast joins).
  */
object Tpcds4 {

  private def channelPairs(s: SparkSession, dir: String, ch: Int): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter($"l_linenumber" % 3 === ch)
      .select($"l_orderkey", $"l_shipdate")
    val o = table(s, dir, "orders")
      .filter(year($"o_orderdate") === 1995)
      .select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    val c = table(s, dir, "customer").select($"c_custkey".as("o_custkey"), $"c_name")
    li.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
      .select($"c_name", $"l_shipdate").distinct()
  }
  private def channelPairsSql(ch: Int): String =
    s"""SELECT DISTINCT c_name, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_linenumber % 3 = $ch AND year(o_orderdate) = 1995"""

  /** q38 shape: customers active on the same date in ALL three channels. */
  def q_ds_hot_cust(s: SparkSession, dir: String): DataFrame = {
    val inAll = channelPairs(s, dir, 0)
      .intersect(channelPairs(s, dir, 1))
      .intersect(channelPairs(s, dir, 2))
    inAll.agg(count(lit(1)).as("hot_cust"))
  }
  val qDsHotCustSql: String =
    s"""SELECT count(*) AS hot_cust FROM (
          ${channelPairsSql(0)}
          INTERSECT ${channelPairsSql(1)}
          INTERSECT ${channelPairsSql(2)}) hot"""

  /** q87 shape: the EXCEPT chain — store-channel pairs never seen in the
    * other two channels. */
  def q_ds_cool_cust(s: SparkSession, dir: String): DataFrame = {
    val onlyCh0 = channelPairs(s, dir, 0)
      .except(channelPairs(s, dir, 1))
      .except(channelPairs(s, dir, 2))
    onlyCh0.agg(count(lit(1)).as("cool_cust"))
  }
  val qDsCoolCustSql: String =
    s"""SELECT count(*) AS cool_cust FROM (
          (${channelPairsSql(0)})
          EXCEPT (${channelPairsSql(1)})
          EXCEPT (${channelPairsSql(2)})) cool"""

  /** q21 shape: quantity shipped before/after a pivot date per
    * (supplier, brand), kept when the after/before ratio sits in
    * [2/3, 3/2] — cross-multiplied to exact DECIMAL comparisons. */
  def q_ds_inventory_ratio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pivot = lit("1995-06-17").cast("date")
    val li = table(s, dir, "lineitem")
      .filter($"l_shipdate".between(date_sub(pivot, 30), date_add(pivot, 30)))
      .select($"l_suppkey", $"l_partkey", $"l_shipdate", dec($"l_quantity").as("qty"))
    val su = table(s, dir, "supplier").select($"s_suppkey".as("l_suppkey"), $"s_name")
    val p = table(s, dir, "part").filter($"p_retailprice".between(900, 2000))
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val agged = li.join(broadcast(su), "l_suppkey").join(broadcast(p), "l_partkey")
      .groupBy($"s_name", $"p_brand")
      .agg(sum(when($"l_shipdate" < pivot, $"qty").otherwise(dec(lit(0)))).as("inv_before"),
        sum(when($"l_shipdate" >= pivot, $"qty").otherwise(dec(lit(0)))).as("inv_after"))
    agged
      .filter($"inv_before" > 0 &&
        $"inv_after" * 3 >= $"inv_before" * 2 && $"inv_after" * 2 <= $"inv_before" * 3)
      .select($"s_name", $"p_brand",
        $"inv_before".cast("double").as("inv_before"),
        $"inv_after".cast("double").as("inv_after"))
      .orderBy($"s_name", $"p_brand")
  }
  val qDsInventoryRatioSql: String =
    """WITH x AS (
         SELECT s_name, p_brand,
           sum(CASE WHEN l_shipdate < DATE '1995-06-17'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS inv_before,
           sum(CASE WHEN l_shipdate >= DATE '1995-06-17'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS inv_after
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate BETWEEN DATE '1995-06-17' - INTERVAL 30 DAY
                              AND DATE '1995-06-17' + INTERVAL 30 DAY
           AND p_retailprice BETWEEN 900 AND 2000
         GROUP BY s_name, p_brand)
       SELECT s_name, p_brand,
         CAST(inv_before AS DOUBLE) AS inv_before,
         CAST(inv_after AS DOUBLE) AS inv_after
       FROM x
       WHERE inv_before > 0
         AND inv_after * 3 >= inv_before * 2
         AND inv_after * 2 <= inv_before * 3
       ORDER BY s_name, p_brand"""

  /** q62 shape: order→ship latency banded into five CASE sums, one fact
    * pass, dims broadcast. */
  def q_ds_ship_latency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey",
      $"l_shipdate", ($"l_linenumber" % 4).as("ship_mode"))
    val o = table(s, dir, "orders")
      .filter(year($"o_orderdate") === 1995)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderdate")
    val su = table(s, dir, "supplier").select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    val n = table(s, dir, "nation").select($"n_nationkey".as("s_nationkey"), $"n_name")
    val lat = datediff($"l_shipdate", $"o_orderdate")
    def band(c: Column, name: String): Column = sum(when(c, 1L).otherwise(0L)).as(name)
    li.join(o, "l_orderkey")
      .join(broadcast(su), "l_suppkey").join(broadcast(n), "s_nationkey")
      .groupBy(substring($"n_name", 1, 10).as("warehouse"), $"ship_mode")
      .agg(band(lat <= 30, "d30"),
        band(lat > 30 && lat <= 60, "d31_60"),
        band(lat > 60 && lat <= 90, "d61_90"),
        band(lat > 90 && lat <= 120, "d91_120"),
        band(lat > 120, "d_over_120"))
      .orderBy($"warehouse", $"ship_mode")
  }
  val qDsShipLatencySql: String =
    """SELECT substr(n_name, 1, 10) AS warehouse, l_linenumber % 4 AS ship_mode,
         CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
         CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 30
                        AND datediff('day', o_orderdate, l_shipdate) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
         CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                        AND datediff('day', o_orderdate, l_shipdate) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
         CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
                        AND datediff('day', o_orderdate, l_shipdate) <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
         CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_120
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE year(o_orderdate) = 1995
       GROUP BY 1, 2 ORDER BY 1, 2"""

  val queries: Map[String, Q] = Map(
    "q_ds_hot_cust" -> q_ds_hot_cust _,
    "q_ds_cool_cust" -> q_ds_cool_cust _,
    "q_ds_inventory_ratio" -> q_ds_inventory_ratio _,
    "q_ds_ship_latency" -> q_ds_ship_latency _)

  val oracles: Map[String, String] = Map(
    "q_ds_hot_cust" -> qDsHotCustSql,
    "q_ds_cool_cust" -> qDsCoolCustSql,
    "q_ds_inventory_ratio" -> qDsInventoryRatioSql,
    "q_ds_ship_latency" -> qDsShipLatencySql)
}
