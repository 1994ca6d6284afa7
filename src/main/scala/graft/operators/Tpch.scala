package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The classic TPC-H query shapes beyond the round-1 set (Q1/Q3/Q5/Q6),
  * adapted to the reduced fixture schema (no partsupp; fewer columns — e.g.
  * Q4's commitdate/receiptdate predicate becomes shipdate > orderdate).
  * These are the queries the reference benchmarks and regression-tests
  * against (reference: testing/trino-benchto-benchmarks/src/main/resources/
  * sql/ and testing/trino-benchmark-queries/.../tpch/q*.sql; correctness
  * suites testing/trino-testing/.../AbstractTestQueries.java:39).
  *
  * Scale notes per query are inline; the shared discipline: money math in
  * exact decimals cast back to double at the end, dimension sides broadcast,
  * fact-fact joins shuffled on their keys, every output totally ordered.
  */
object Tpch {

  private def discPrice(s: SparkSession) = {
    import s.implicits._
    (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).cast(DecimalType(18, 4))
  }
  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"

  /** Q4: order-priority checking — EXISTS probe against lineitem. */
  def q4_order_priority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-07-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-10-01").cast("timestamp"))
    val l = table(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    o.join(l, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Q7: volume shipping between two nations by year (supplier side vs
    * customer side) — the join order keeps both fact tables shuffled on
    * orderkey while nations broadcast. */
  def q7_volume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = table(s, dir, "nation").select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val n2 = table(s, dir, "nation").select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    // r18 join order (guide §3 / the reference CBO's Q7 shape): the
    // supplier-side nation join lands right after the supplier join, so
    // the 2-of-25-nations cut (Catalyst pushes the pair predicate's
    // per-side OR into the nation scans) shrinks the probe stream ~12x
    // BEFORE the orders/customer joins instead of at the end of the chain.
    // All join inputs stay base scans, so broadcast selection is unchanged.
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(table(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
      .join(table(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
      .filter(($"supp_nation" === "NATION_12" && $"cust_nation" === "NATION_10") ||
        ($"supp_nation" === "NATION_10" && $"cust_nation" === "NATION_12"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
      .agg(asDouble(sum(discPrice(s))).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }
  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum($discPriceSql) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
           OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""

  /** Q8: market share — conditional volume ratio per year. The division is
    * double/double IEEE, identical across engines without rounding. */
  def q8_market_share(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vol = table(s, dir, "lineitem")
      .join(table(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp")), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "part").filter($"p_type" === "PROMO"), $"l_partkey" === $"p_partkey")
      .join(table(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(table(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .select(year($"o_orderdate").cast("long").as("o_year"), $"n_name", discPrice(s).as("volume"))
    vol.groupBy($"o_year")
      .agg((asDouble(sum(when($"n_name" === "NATION_3", $"volume").otherwise(lit(0).cast(DecimalType(18, 4))))) /
        asDouble(sum($"volume"))).as("mkt_share"))
      .orderBy($"o_year")
  }
  val q8Sql: String =
    s"""WITH vol AS (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name, $discPriceSql AS volume
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
           AND p_type = 'PROMO')
       SELECT o_year,
         CAST(sum(CASE WHEN n_name = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
       FROM vol GROUP BY o_year ORDER BY o_year"""

  /** Q10: returned-item reporting — top 20 customers by lost revenue. */
  def q10_returns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem").filter($"l_returnflag" === "R")
      .join(table(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp")), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(table(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(asDouble(sum(discPrice(s))).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }
  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum($discPriceSql) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q14: promotion effect — conditional revenue percentage for one month. */
  def q14_promo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
      .join(table(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .agg((asDouble(sum(when($"p_type".startsWith("PROMO"), discPrice(s))
          .otherwise(lit(0).cast(DecimalType(18, 4))))) * 100.0 /
        asDouble(sum(discPrice(s)))).as("promo_revenue"))
  }
  val q14Sql: String =
    s"""SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $discPriceSql
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
         / CAST(sum($discPriceSql) AS DOUBLE) AS promo_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"""

  /** Q15: top supplier — revenue view + scalar max + equality join. */
  def q15_top_supplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey".as("supplier_no"))
      .agg(asDouble(sum(discPrice(s))).as("total_revenue"))
    val maxRev = rev.agg(max($"total_revenue").as("mx"))
    table(s, dir, "supplier")
      .join(rev, $"s_suppkey" === $"supplier_no")
      .join(broadcast(maxRev), $"total_revenue" === $"mx")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }
  val q15Sql: String =
    s"""WITH revenue AS (
         SELECT l_suppkey AS supplier_no, CAST(sum($discPriceSql) AS DOUBLE) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s_suppkey"""

  /** Q18: large-volume customers — HAVING filter re-joined to the facts. */
  def q18_big_orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = table(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(asDouble(sum(dec($"l_quantity"))).as("sum_qty"))
      .filter($"sum_qty" > 150.0)
    big.join(table(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }
  val q18Sql: String =
    """WITH big AS (
         SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_orderkey
         HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150.0)
       SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o_totalprice, sum_qty
       FROM big JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  /** Q19: disjunctive predicate bundles over part × lineitem — exercises
    * OR-of-ANDs selectivity and join-filter placement. */
  def q19_disjunct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .join(table(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) && $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#13" && $"p_size".between(11, 25) && $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#20" && $"p_size".between(26, 50) && $"l_quantity".between(20, 40)))
      .agg(asDouble(sum(discPrice(s))).as("revenue"), count(lit(1)).as("n"))
  }
  val q19Sql: String =
    s"""SELECT CAST(sum($discPriceSql) AS DOUBLE) AS revenue, count(*) AS n
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand = 'Brand#13' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#20' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)"""

  /** Q22: global-sales opportunity — above-average-balance customers with no
    * recent orders (NOT EXISTS anti-join), grouped by a synthetic country
    * code (fixture has no phone column; recency predicate keeps the result
    * non-empty at every scale factor). */
  def q22_idle_customers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer").withColumn("cntrycode", ($"c_custkey" % 7).cast("long"))
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg(avg($"c_acctbal").as("ab"))
    val recent = table(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    val idle = c.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
    idle.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .groupBy($"cntrycode")
      .agg(count(lit(1)).as("numcust"), asDouble(sum(dec($"c_acctbal"))).as("totacctbal"))
      .orderBy($"cntrycode")
  }
  val q22Sql: String =
    """SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '1999-01-01')
       GROUP BY cntrycode ORDER BY cntrycode"""

  /** Q9: product-type profit by nation and year. The fixture has no partsupp,
    * so supply cost is restated as 60% of p_retailprice (deterministic, exact
    * decimal); the join tree (part ⋈ lineitem ⋈ orders ⋈ supplier ⋈ nation)
    * and the per-nation-per-year profit rollup are the original shape. */
  def q9_profit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val amount = (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) -
      dec($"p_retailprice") * lit(BigDecimal("0.60")) * dec($"l_quantity"))
      .cast(DecimalType(22, 6))
    table(s, dir, "lineitem")
      .join(table(s, dir, "part").filter($"p_name".contains("red")), $"l_partkey" === $"p_partkey")
      .join(table(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(table(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      .agg(asDouble(sum(amount)).as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }
  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.60 AS DECIMAL(3,2)) * CAST(l_quantity AS DECIMAL(12,2))
                 AS DECIMAL(22,6))) AS DOUBLE) AS profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY n_name, o_year ORDER BY nation, o_year DESC"""

  /** Q12: shipping-priority classes per "mode". The fixture lacks l_shipmode/
    * l_commitdate/l_receiptdate, so mode := l_linestatus and the lateness
    * predicate becomes shipdate ≥ orderdate + 30 days; the conditional
    * high/low priority counting is the original shape. */
  def q12_priority_shipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(table(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .groupBy($"l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }
  val q12Sql: String =
    """SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
       GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** Q13: customer order-count distribution — LEFT OUTER join (the join-side
    * filter stands in for the original o_comment NOT LIKE) feeding a second
    * aggregation over the first's result. count(o_orderkey) counts matched
    * rows only, so no-order customers land in the c_count=0 bucket. */
  def q13_cust_distribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders").filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
    val perCust = table(s, dir, "customer")
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
             GROUP BY c_custkey) per_cust
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** Q17: small-quantity-order revenue — the correlated per-part average
    * subquery, decorrelated into a broadcast-joined per-part aggregate. The
    * threshold test l_quantity < 0.2 * avg(l_quantity) is restated as the
    * exact cross-multiplied integer/decimal form qty * 5 * cnt < sum_qty so
    * both engines compare identical exact values (no IEEE-avg boundary). */
  def q17_small_qty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPart = table(s, dir, "lineitem")
      .groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(dec($"l_quantity")).as("sq"))
    table(s, dir, "lineitem")
      .join(table(s, dir, "part").filter($"p_brand" === "Brand#3"), $"l_partkey" === $"p_partkey")
      .join(perPart, $"l_partkey" === $"pk")
      .filter(dec($"l_quantity") * lit(5) * $"cnt" < $"sq")
      .agg((asDouble(sum(dec($"l_extendedprice"))) / 7.0).as("avg_yearly"))
  }
  val q17Sql: String =
    """WITH per_part AS (
         SELECT l_partkey AS pk, count(*) AS cnt, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
         FROM lineitem GROUP BY l_partkey)
       SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN per_part ON l_partkey = pk
       WHERE p_brand = 'Brand#3'
         AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sq"""

  /** Q20: potential part promotion — nested semi-join chain. Without
    * partsupp the inner availability test becomes: suppliers who shipped
    * more than 50 units of some %red% part during 1996 (a grouped HAVING
    * feeding an IN), then restricted to one nation. */
  def q20_promotion_parts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val targetParts = table(s, dir, "part").filter($"p_name".contains("red")).select($"p_partkey")
    val bigShippers = table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(targetParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(dec($"l_quantity")).as("qty"))
      .filter($"qty" > lit(BigDecimal(50)))
      .select($"l_suppkey")
    table(s, dir, "supplier")
      .join(broadcast(table(s, dir, "nation").filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey", "left_semi")
      .join(bigShippers, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }
  val q20Sql: String =
    """SELECT s_suppkey, s_name
       FROM supplier
       WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
         AND s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
             AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY l_suppkey, l_partkey
           HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 50)
       ORDER BY s_suppkey"""

  /** Q21: suppliers who kept orders waiting — the EXISTS/NOT-EXISTS pair over
    * other suppliers' lineitems of the same order. "Late" is restated as
    * shipdate > orderdate + 60 days (fixture has no commit/receipt dates);
    * the multi-supplier-order correlation is the original shape: another
    * supplier participated, and no other supplier was late. */
  def q21_waiting_suppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val late = li
      .join(table(s, dir, "orders").filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"l_orderkey", $"l_suppkey")
    val l2 = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
    val lateL3 = late.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
    late
      .join(l2, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(lateL3, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3", "left_anti")
      .join(table(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      // half the nations — selective enough to exercise the semi-join,
      // non-empty at every fixture scale factor (a single nation is empty
      // at sf0.001)
      .join(broadcast(table(s, dir, "nation").filter($"n_nationkey" < 13)),
        $"s_nationkey" === $"n_nationkey", "left_semi")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }
  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
       FROM lineitem l1
       JOIN orders ON o_orderkey = l1.l_orderkey
       JOIN supplier ON s_suppkey = l1.l_suppkey
       WHERE o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                         WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                           AND o3.o_orderstatus = 'F'
                           AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
         AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 13)
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""

  val queries: Map[String, Q] = Map(
    "q4_order_priority" -> q4_order_priority _,
    "q9_profit" -> q9_profit _,
    "q12_priority_shipping" -> q12_priority_shipping _,
    "q13_cust_distribution" -> q13_cust_distribution _,
    "q17_small_qty" -> q17_small_qty _,
    "q20_promotion_parts" -> q20_promotion_parts _,
    "q21_waiting_suppliers" -> q21_waiting_suppliers _,
    "q7_volume" -> q7_volume _,
    "q8_market_share" -> q8_market_share _,
    "q10_returns" -> q10_returns _,
    "q14_promo" -> q14_promo _,
    "q15_top_supplier" -> q15_top_supplier _,
    "q18_big_orders" -> q18_big_orders _,
    "q19_disjunct" -> q19_disjunct _,
    "q22_idle_customers" -> q22_idle_customers _)

  val oracles: Map[String, String] = Map(
    "q4_order_priority" -> q4Sql,
    "q9_profit" -> q9Sql,
    "q12_priority_shipping" -> q12Sql,
    "q13_cust_distribution" -> q13Sql,
    "q17_small_qty" -> q17Sql,
    "q20_promotion_parts" -> q20Sql,
    "q21_waiting_suppliers" -> q21Sql,
    "q7_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q10_returns" -> q10Sql,
    "q14_promo" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q18_big_orders" -> q18Sql,
    "q19_disjunct" -> q19Sql,
    "q22_idle_customers" -> q22Sql)
}
