package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 5 (reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q97.sql, q90.sql, q30.sql, q59.sql):
  *
  *  - q97 channel overlap: per-channel DISTINCT (customer, item) sets,
  *    FULL OUTER joined on the composite key, three null-pattern CASE sums.
  *    The distinct sets shuffle once on the composite key; no fact×fact.
  *  - q90 am/pm ratio: two independent filtered scalar counts cross-joined
  *    as 1-row broadcasts; the ratio is one double division (deterministic
  *    in both engines), emitted e6-scaled as BIGINT.
  *  - q30 above-average returns: per-(customer, state) return totals kept
  *    when total > 1.2 × the state average. The correlated average
  *    decorrelates to a per-state aggregate joined back; the 1.2× compare
  *    is cross-multiplied (10·total·cnt > 12·sum) so no division decides
  *    membership.
  *  - q59 week-over-week: day-of-week pivot per (store, week) for two
  *    years, self-joined on (store, week), per-day ratio columns.
  */
object Tpcds5 {

  /** q97: customers buying the same item through both channels / one only. */
  def q_ds_channel_overlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def channelPairs(ch: Int): DataFrame = {
      val li = table(s, dir, "lineitem").filter($"l_linenumber" % 3 === ch)
        .select($"l_orderkey", $"l_partkey")
      val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"), $"o_custkey")
      li.join(o, "l_orderkey").select($"o_custkey", $"l_partkey").distinct()
    }
    val ss = channelPairs(0).withColumnRenamed("o_custkey", "s_cust")
      .withColumnRenamed("l_partkey", "s_item")
    val cs = channelPairs(1).withColumnRenamed("o_custkey", "c_cust")
      .withColumnRenamed("l_partkey", "c_item")
    ss.join(cs, $"s_cust" === $"c_cust" && $"s_item" === $"c_item", "full_outer")
      .agg(
        sum(when($"s_cust".isNotNull && $"c_cust".isNull, 1L).otherwise(0L)).as("store_only"),
        sum(when($"s_cust".isNull && $"c_cust".isNotNull, 1L).otherwise(0L)).as("catalog_only"),
        sum(when($"s_cust".isNotNull && $"c_cust".isNotNull, 1L).otherwise(0L)).as("store_and_catalog"))
  }
  val qDsChannelOverlapSql: String =
    """WITH ssci AS (
         SELECT DISTINCT o_custkey AS s_cust, l_partkey AS s_item
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_linenumber % 3 = 0),
       csci AS (
         SELECT DISTINCT o_custkey AS c_cust, l_partkey AS c_item
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_linenumber % 3 = 1)
       SELECT
         CAST(sum(CASE WHEN s_cust IS NOT NULL AND c_cust IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
         CAST(sum(CASE WHEN s_cust IS NULL AND c_cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
         CAST(sum(CASE WHEN s_cust IS NOT NULL AND c_cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
       FROM ssci FULL JOIN csci ON s_cust = c_cust AND s_item = c_item"""

  /** q90: ratio of two independently-filtered scalar counts. */
  def q_ds_am_pm_ratio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_quantity")
    val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"), $"o_orderdate")
    val su = table(s, dir, "supplier").filter($"s_acctbal" > 0)
      .select($"s_suppkey".as("l_suppkey"))
    val joined = li.join(o, "l_orderkey").join(broadcast(su), "l_suppkey")
      .filter($"l_quantity".between(10, 40))
    val am = joined.filter(month($"o_orderdate").between(1, 2))
      .agg(count(lit(1)).as("amc"))
    val pm = joined.filter(month($"o_orderdate").between(7, 8))
      .agg(count(lit(1)).as("pmc"))
    am.crossJoin(pm)
      .select($"amc", $"pmc",
        round(lit(1e6) * $"amc" / $"pmc").cast("long").as("am_pm_ratio_e6"))
  }
  val qDsAmPmRatioSql: String =
    """WITH base AS (
         SELECT o_orderdate
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_acctbal > 0 AND l_quantity BETWEEN 10 AND 40),
       a AS (SELECT count(*) AS amc FROM base WHERE month(o_orderdate) BETWEEN 1 AND 2),
       p AS (SELECT count(*) AS pmc FROM base WHERE month(o_orderdate) BETWEEN 7 AND 8)
       SELECT amc, pmc,
         CAST(round(1e6 * amc / pmc) AS BIGINT) AS am_pm_ratio_e6
       FROM a, p"""

  /** q30: customers returning more than 1.2× their state's average. */
  def q_ds_above_avg_returns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem").filter($"l_returnflag" === "R")
      .select($"l_orderkey", dec($"l_extendedprice").as("amt"))
    val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    val c = table(s, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name", $"c_nationkey")
    val ctr = li.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
      .groupBy($"o_custkey", $"c_name", $"c_nationkey")
      .agg(sum($"amt").as("total_return"))
    val stateAvg = ctr.groupBy($"c_nationkey")
      .agg(sum($"total_return").as("state_sum"), count(lit(1)).as("state_cnt"))
    ctr.join(broadcast(stateAvg), "c_nationkey")
      // total > 1.2 * state_sum/state_cnt  ⇔  10·total·cnt > 12·state_sum
      .filter($"total_return" * 10 * $"state_cnt" > $"state_sum" * 12)
      .filter($"c_nationkey" < 5)
      .select($"c_name", $"total_return".cast("double").as("total_return"))
      .orderBy($"c_name")
  }
  val qDsAboveAvgReturnsSql: String =
    """WITH ctr AS (
         SELECT o_custkey, c_name, c_nationkey,
                sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS total_return
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_returnflag = 'R'
         GROUP BY o_custkey, c_name, c_nationkey),
       sa AS (
         SELECT c_nationkey, sum(total_return) AS state_sum, count(*) AS state_cnt
         FROM ctr GROUP BY c_nationkey)
       SELECT c_name, CAST(total_return AS DOUBLE) AS total_return
       FROM ctr JOIN sa USING (c_nationkey)
       WHERE total_return * 10 * state_cnt > state_sum * 12
         AND c_nationkey < 5
       ORDER BY c_name"""

  /** q59: day-of-week pivot per (store, week), year-over-year self-join. */
  def q_ds_week_over_week(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter(weekofyear($"l_shipdate").between(2, 50))
      .select(($"l_suppkey" % 10).as("store"),
        year($"l_shipdate").as("yr"), weekofyear($"l_shipdate").as("wk"),
        (dayofweek($"l_shipdate") - 1).as("dow"), dec($"l_extendedprice").as("amt"))
    def day(k: Int, name: String): Column =
      sum(when($"dow" === k, $"amt").otherwise(lit(null))).as(name)
    val wss = li.groupBy($"store", $"yr", $"wk")
      .agg(day(0, "sun"), day(1, "mon"), day(2, "tue"), day(3, "wed"),
        day(4, "thu"), day(5, "fri"), day(6, "sat"))
    val w1 = wss.filter($"yr" === 1995).drop("yr")
    val w2 = wss.filter($"yr" === 1996).drop("yr")
      .select($"store", $"wk", $"sun".as("sun2"), $"mon".as("mon2"),
        $"tue".as("tue2"), $"wed".as("wed2"), $"thu".as("thu2"),
        $"fri".as("fri2"), $"sat".as("sat2"))
    def ratio(a: Column, b: Column, name: String): Column =
      round(lit(1e6) * a.cast("double") / b.cast("double")).cast("long").as(name)
    w1.join(w2, Seq("store", "wk"))
      .select($"store", $"wk",
        ratio($"sun", $"sun2", "sun_r"), ratio($"mon", $"mon2", "mon_r"),
        ratio($"tue", $"tue2", "tue_r"), ratio($"wed", $"wed2", "wed_r"),
        ratio($"thu", $"thu2", "thu_r"), ratio($"fri", $"fri2", "fri_r"),
        ratio($"sat", $"sat2", "sat_r"))
      .orderBy($"store", $"wk")
  }
  val qDsWeekOverWeekSql: String = {
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val pivots = days.zipWithIndex.map { case (n, k) =>
      s"sum(CASE WHEN dayofweek(l_shipdate) = $k THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS $n"
    }.mkString(",\n           ")
    val ratios = days.map(n =>
      s"CAST(round(1e6 * CAST(w1.$n AS DOUBLE) / CAST(w2.$n AS DOUBLE)) AS BIGINT) AS ${n}_r")
      .mkString(",\n         ")
    s"""WITH wss AS (
         SELECT l_suppkey % 10 AS store, year(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
           $pivots
         FROM lineitem
         WHERE weekofyear(l_shipdate) BETWEEN 2 AND 50
         GROUP BY 1, 2, 3)
       SELECT w1.store, w1.wk,
         $ratios
       FROM wss w1 JOIN wss w2 ON w1.store = w2.store AND w1.wk = w2.wk
       WHERE w1.yr = 1995 AND w2.yr = 1996
       ORDER BY w1.store, w1.wk"""
  }

  val queries: Map[String, Q] = Map(
    "q_ds_channel_overlap" -> q_ds_channel_overlap _,
    "q_ds_am_pm_ratio" -> q_ds_am_pm_ratio _,
    "q_ds_above_avg_returns" -> q_ds_above_avg_returns _,
    "q_ds_week_over_week" -> q_ds_week_over_week _)

  val oracles: Map[String, String] = Map(
    "q_ds_channel_overlap" -> qDsChannelOverlapSql,
    "q_ds_am_pm_ratio" -> qDsAmPmRatioSql,
    "q_ds_above_avg_returns" -> qDsAboveAvgReturnsSql,
    "q_ds_week_over_week" -> qDsWeekOverWeekSql)
}
