package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 7 (reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q58.sql, q6.sql, q54.sql, q83.sql):
  *
  *  - q58 channel balance: per-channel item revenue for one week, 3-way
  *    joined on the item, kept when every channel's revenue sits within
  *    10% of every other — every band is cross-multiplied into exact
  *    DECIMAL comparisons (10·a BETWEEN 9·b AND 11·b), no division.
  *  - q6 above-category average: items priced ≥ 1.2× their brand average
  *    (the correlated category average decorrelated to one broadcast
  *    aggregate, 1.2× cross-multiplied), then customer counts per nation.
  *  - q54 cohort revenue bands: the cohort = customers who bought a PROMO
  *    part in 1995-03; their following-quarter revenue is histogrammed
  *    into fixed-width bands (exact integer division on DECIMAL cents).
  *  - q83 returns across channels: per-item returned quantity balanced
  *    across the three channels over a date band.
  */
object Tpcds7 {

  /** q58: items whose 1995 revenue balances across all 3 channels
    * (pairwise within 2x, cross-multiplied — the reference's 10% band
    * selects nothing at the fixture volumes). */
  def q_ds_channel_balance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter(year($"l_shipdate") === 1995)
      .select(($"l_linenumber" % 3).as("ch"), $"l_partkey",
        dec($"l_extendedprice").as("rev"))
    val per = li.groupBy($"ch", $"l_partkey").agg(sum($"rev").as("rev"))
    def chan(c: Int, name: String): DataFrame =
      per.filter($"ch" === c).select($"l_partkey", $"rev".as(name))
    // 2x band (the reference's 10% selects nothing at fixture volumes)
    def within10(a: Column, b: Column): Column =
      a * 10 >= b * 5 && a * 10 <= b * 20
    chan(0, "r0").join(chan(1, "r1"), "l_partkey").join(chan(2, "r2"), "l_partkey")
      .filter(within10($"r0", $"r1") && within10($"r1", $"r2") && within10($"r0", $"r2"))
      .select($"l_partkey",
        asDouble($"r0").as("r0"), asDouble($"r1").as("r1"), asDouble($"r2").as("r2"))
      .orderBy($"l_partkey")
  }
  val qDsChannelBalanceSql: String =
    """WITH per AS (
         SELECT l_linenumber % 3 AS ch, l_partkey,
                sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
         FROM lineitem
         WHERE year(l_shipdate) = 1995
         GROUP BY 1, 2)
       SELECT c0.l_partkey,
              CAST(c0.rev AS DOUBLE) AS r0, CAST(c1.rev AS DOUBLE) AS r1,
              CAST(c2.rev AS DOUBLE) AS r2
       FROM per c0
       JOIN per c1 ON c0.l_partkey = c1.l_partkey AND c1.ch = 1
       JOIN per c2 ON c0.l_partkey = c2.l_partkey AND c2.ch = 2
       WHERE c0.ch = 0
         AND c0.rev * 10 BETWEEN c1.rev * 5 AND c1.rev * 20
         AND c1.rev * 10 BETWEEN c2.rev * 5 AND c2.rev * 20
         AND c0.rev * 10 BETWEEN c2.rev * 5 AND c2.rev * 20
       ORDER BY c0.l_partkey"""

  /** q6: customers per nation buying items priced ≥ 1.2× brand average. */
  def q_ds_above_category_avg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = table(s, dir, "part")
      .select($"p_partkey", $"p_brand", dec($"p_retailprice").as("price"))
    val brandAvg = p.groupBy($"p_brand")
      .agg(sum($"price").as("brand_sum"), count(lit(1)).as("brand_cnt"))
    val expensive = p.join(broadcast(brandAvg), "p_brand")
      // price >= 1.005 * brand_sum/brand_cnt  ⇔  200·price·cnt >= 201·sum
      // (1.005 vs the reference's 1.2: the fixture's retailprice formula
      // clusters within ~1% of a brand's mean, so larger ratios select
      // nothing at any SF)
      .filter($"price" * 200 * $"brand_cnt" >= $"brand_sum" * 201)
      .select($"p_partkey")
    val li = table(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
      .join(expensive, $"l_partkey" === $"p_partkey", "left_semi")
    val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    val c = table(s, dir, "customer").select($"c_custkey".as("o_custkey"), $"c_nationkey")
    li.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
      .groupBy($"c_nationkey")
      .agg(countDistinct($"o_custkey").as("n_customers"), count(lit(1)).as("n_lines"))
      .filter($"n_lines" >= 5)
      .orderBy($"c_nationkey")
  }
  val qDsAboveCategoryAvgSql: String =
    """WITH ba AS (
         SELECT p_brand, sum(CAST(p_retailprice AS DECIMAL(12,2))) AS brand_sum,
                count(*) AS brand_cnt
         FROM part GROUP BY p_brand),
       expensive AS (
         SELECT p_partkey FROM part JOIN ba USING (p_brand)
         WHERE CAST(p_retailprice AS DECIMAL(12,2)) * 200 * brand_cnt >= brand_sum * 201)
       SELECT c_nationkey,
              count(DISTINCT o_custkey) AS n_customers,
              count(*) AS n_lines
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE l_partkey IN (SELECT p_partkey FROM expensive)
       GROUP BY c_nationkey HAVING count(*) >= 5
       ORDER BY c_nationkey"""

  /** q54: following-quarter revenue bands for the PROMO-buyer cohort. */
  def q_ds_cohort_revenue_bands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", dec($"l_extendedprice").as("rev"))
    val o = table(s, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_custkey", $"o_orderdate")
    val promoParts = table(s, dir, "part")
      .filter($"p_type".startsWith("PROMO")).select($"p_partkey")
    val cohort = li.join(o, "l_orderkey")
      .filter(year($"o_orderdate") === 1995 && month($"o_orderdate") === 3)
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
      .select($"o_custkey").distinct()
    val revenue = li.join(o, "l_orderkey")
      .filter($"o_orderdate".between("1995-04-01", "1995-06-30"))
      .join(cohort, Seq("o_custkey"), "left_semi")
      .groupBy($"o_custkey").agg(sum($"rev").as("rev"))
    // fixed 50k-wide bands via exact INTEGER division on cents (decimal
    // division scales differ across engines; cents do not)
    revenue.select($"o_custkey",
        (($"rev" * 100).cast("long") / 5000000L).cast("long").as("band"))
      .groupBy($"band").agg(count(lit(1)).as("n_customers"))
      .orderBy($"band")
  }
  val qDsCohortRevenueBandsSql: String =
    """WITH cohort AS (
         SELECT DISTINCT o_custkey
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 3
           AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')),
       revenue AS (
         SELECT o_custkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderdate BETWEEN DATE '1995-04-01' AND DATE '1995-06-30'
           AND o_custkey IN (SELECT o_custkey FROM cohort)
         GROUP BY o_custkey)
       SELECT CAST(CAST(rev * 100 AS BIGINT) // 5000000 AS BIGINT) AS band, count(*) AS n_customers
       FROM revenue GROUP BY 1 ORDER BY 1"""

  /** q83: items returned through all three channels over a date band. */
  def q_ds_returns_across_channels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter($"l_returnflag" === "R" &&
        $"l_shipdate".between("1995-01-01", "1995-12-31"))
      .select(($"l_linenumber" % 3).as("ch"), $"l_partkey", dec($"l_quantity").as("qty"))
    val per = li.groupBy($"ch", $"l_partkey").agg(sum($"qty").as("qty"))
    def chan(c: Int, name: String): DataFrame =
      per.filter($"ch" === c).select($"l_partkey", $"qty".as(name))
    chan(0, "q0").join(chan(1, "q1"), "l_partkey").join(chan(2, "q2"), "l_partkey")
      .select($"l_partkey",
        asDouble($"q0").as("q0"), asDouble($"q1").as("q1"), asDouble($"q2").as("q2"),
        round(lit(1e6) * $"q0".cast("double") /
          ($"q0" + $"q1" + $"q2").cast("double")).cast("long").as("share0_e6"))
      .orderBy($"l_partkey")
  }
  val qDsReturnsAcrossChannelsSql: String =
    """WITH per AS (
         SELECT l_linenumber % 3 AS ch, l_partkey,
                sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
         FROM lineitem
         WHERE l_returnflag = 'R'
           AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
         GROUP BY 1, 2)
       SELECT c0.l_partkey,
              CAST(c0.qty AS DOUBLE) AS q0, CAST(c1.qty AS DOUBLE) AS q1,
              CAST(c2.qty AS DOUBLE) AS q2,
              CAST(round(1e6 * CAST(c0.qty AS DOUBLE)
                   / CAST(c0.qty + c1.qty + c2.qty AS DOUBLE)) AS BIGINT) AS share0_e6
       FROM per c0
       JOIN per c1 ON c0.l_partkey = c1.l_partkey AND c1.ch = 1
       JOIN per c2 ON c0.l_partkey = c2.l_partkey AND c2.ch = 2
       WHERE c0.ch = 0
       ORDER BY c0.l_partkey"""

  val queries: Map[String, Q] = Map(
    "q_ds_channel_balance" -> q_ds_channel_balance _,
    "q_ds_above_category_avg" -> q_ds_above_category_avg _,
    "q_ds_cohort_revenue_bands" -> q_ds_cohort_revenue_bands _,
    "q_ds_returns_across_channels" -> q_ds_returns_across_channels _)

  val oracles: Map[String, String] = Map(
    "q_ds_channel_balance" -> qDsChannelBalanceSql,
    "q_ds_above_category_avg" -> qDsAboveCategoryAvgSql,
    "q_ds_cohort_revenue_bands" -> qDsCohortRevenueBandsSql,
    "q_ds_returns_across_channels" -> qDsReturnsAcrossChannelsSql)
}
