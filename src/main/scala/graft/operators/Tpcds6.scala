package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 6 (reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q95.sql, q31.sql, q49.sql, q29.sql):
  *
  *  - q95 multi-warehouse orders: a FACT SELF-JOIN (same order, different
  *    warehouse) feeding two IN-subqueries over the same derived set, then
  *    a distinct-count + sums. The self-join shuffles once on the order
  *    key; the IN-subqueries lower to semi joins of the SAME derived
  *    relation (no re-scan at scale).
  *  - q31 growth comparison: per-(county, quarter) channel sums
  *    self-joined across three quarters; the "web grows faster than
  *    store" predicate is division-free (cross-multiplied positives).
  *  - q49 worst-return ranks: per-channel return ratios ranked, top-N per
  *    channel, channels UNIONed. Ratio ordering uses the identical double
  *    division in both engines; ties broken by item for determinism.
  *  - q29 repeat-purchase chain: fact→returns→fact joined on the
  *    composite (customer, item) key — the three-way fact chain.
  */
object Tpcds6 {

  /** q95: orders touching ≥2 "warehouses" (l_suppkey % 5) with a returned
    * line, shipped in a 60-day window. */
  def q_ds_multi_warehouse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .select($"l_orderkey", ($"l_suppkey" % 5).as("wh"), $"l_returnflag",
        dec($"l_extendedprice").as("price"), $"l_shipdate")
    val wsWh = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .filter($"a.wh" =!= $"b.wh")
      .select($"l_orderkey").distinct()
    val returned = li.filter($"l_returnflag" === "R")
      .join(wsWh, "l_orderkey")
      .select($"l_orderkey").distinct()
    li.filter($"l_shipdate".between("1996-02-01", "1996-04-01"))
      .join(wsWh, Seq("l_orderkey"), "left_semi")
      .join(returned, Seq("l_orderkey"), "left_semi")
      .agg(countDistinct($"l_orderkey").as("order_count"),
        asDouble(sum($"price")).as("total_price"))
  }
  val qDsMultiWarehouseSql: String =
    """WITH li AS (
         SELECT l_orderkey, l_suppkey % 5 AS wh, l_returnflag,
                CAST(l_extendedprice AS DECIMAL(12,2)) AS price, l_shipdate
         FROM lineitem),
       ws_wh AS (
         SELECT DISTINCT a.l_orderkey
         FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.wh <> b.wh),
       ret AS (
         SELECT DISTINCT li.l_orderkey
         FROM li JOIN ws_wh ON li.l_orderkey = ws_wh.l_orderkey
         WHERE l_returnflag = 'R')
       SELECT count(DISTINCT l_orderkey) AS order_count,
              CAST(sum(price) AS DOUBLE) AS total_price
       FROM li
       WHERE l_shipdate BETWEEN DATE '1996-02-01' AND DATE '1996-04-01'
         AND l_orderkey IN (SELECT l_orderkey FROM ws_wh)
         AND l_orderkey IN (SELECT l_orderkey FROM ret)"""

  /** q31: nations where the channel-1 quarter-over-quarter growth beats
    * channel-0 growth, for both q1→q2 and q2→q3 of 1995. */
  def q_ds_growth_compare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem")
      .filter(year($"l_shipdate") === 1995 && quarter($"l_shipdate") <= 3)
      .select($"l_orderkey", ($"l_linenumber" % 2).as("ch"),
        quarter($"l_shipdate").as("qoy"), dec($"l_extendedprice").as("price"))
    val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    val c = table(s, dir, "customer").select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val sums = li.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
      .groupBy($"c_nationkey", $"ch", $"qoy")
      .agg(sum($"price").as("amt"))
    def q(ch: Int, qoy: Int, name: String): DataFrame =
      sums.filter($"ch" === ch && $"qoy" === qoy)
        .select($"c_nationkey", $"amt".as(name))
    q(0, 1, "s1").join(q(0, 2, "s2"), "c_nationkey").join(q(0, 3, "s3"), "c_nationkey")
      .join(q(1, 1, "w1"), "c_nationkey").join(q(1, 2, "w2"), "c_nationkey")
      .join(q(1, 3, "w3"), "c_nationkey")
      // w2/w1 > s2/s1  ⇔  w2·s1 > s2·w1 (all sums positive)
      .filter($"w2" * $"s1" > $"s2" * $"w1" && $"w3" * $"s2" > $"s3" * $"w2")
      .select($"c_nationkey",
        asDouble($"s1").as("s1"), asDouble($"s2").as("s2"), asDouble($"s3").as("s3"),
        asDouble($"w1").as("w1"), asDouble($"w2").as("w2"), asDouble($"w3").as("w3"))
      .orderBy($"c_nationkey")
  }
  val qDsGrowthCompareSql: String =
    """WITH sums AS (
         SELECT c_nationkey, l_linenumber % 2 AS ch, quarter(l_shipdate) AS qoy,
                sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS amt
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE year(l_shipdate) = 1995 AND quarter(l_shipdate) <= 3
         GROUP BY 1, 2, 3)
       SELECT s1.c_nationkey,
         CAST(s1.amt AS DOUBLE) AS s1, CAST(s2.amt AS DOUBLE) AS s2,
         CAST(s3.amt AS DOUBLE) AS s3, CAST(w1.amt AS DOUBLE) AS w1,
         CAST(w2.amt AS DOUBLE) AS w2, CAST(w3.amt AS DOUBLE) AS w3
       FROM sums s1
       JOIN sums s2 ON s1.c_nationkey = s2.c_nationkey AND s2.ch = 0 AND s2.qoy = 2
       JOIN sums s3 ON s1.c_nationkey = s3.c_nationkey AND s3.ch = 0 AND s3.qoy = 3
       JOIN sums w1 ON s1.c_nationkey = w1.c_nationkey AND w1.ch = 1 AND w1.qoy = 1
       JOIN sums w2 ON s1.c_nationkey = w2.c_nationkey AND w2.ch = 1 AND w2.qoy = 2
       JOIN sums w3 ON s1.c_nationkey = w3.c_nationkey AND w3.ch = 1 AND w3.qoy = 3
       WHERE s1.ch = 0 AND s1.qoy = 1
         AND w2.amt * s1.amt > s2.amt * w1.amt
         AND w3.amt * s2.amt > s3.amt * w2.amt
       ORDER BY s1.c_nationkey"""

  /** q49: top-10 worst return ratios per channel, channels UNIONed. */
  def q_ds_return_rank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = table(s, dir, "lineitem")
      .select(($"l_linenumber" % 3).as("ch"), $"l_partkey",
        dec($"l_quantity").as("qty"),
        when($"l_returnflag" === "R", dec($"l_quantity")).otherwise(dec(lit(0))).as("ret"))
    val per = li.groupBy($"ch", $"l_partkey")
      .agg(sum($"ret").as("ret_qty"), sum($"qty").as("tot_qty"))
      .filter($"tot_qty" >= 100) // the reference's minimum-volume guard
      .withColumn("ratio", $"ret_qty".cast("double") / $"tot_qty".cast("double"))
    val w = Window.partitionBy($"ch").orderBy($"ratio".desc, $"l_partkey".asc)
    per.withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 10)
      .select($"ch", $"rnk".cast("long").as("rnk"), $"l_partkey",
        asDouble($"ret_qty").as("ret_qty"), asDouble($"tot_qty").as("tot_qty"))
      .orderBy($"ch", $"rnk", $"l_partkey")
  }
  val qDsReturnRankSql: String =
    """WITH per AS (
         SELECT l_linenumber % 3 AS ch, l_partkey,
           sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_qty,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS tot_qty
         FROM lineitem GROUP BY 1, 2),
       ranked AS (
         SELECT *, CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS ratio,
           rank() OVER (PARTITION BY ch
                        ORDER BY CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) DESC,
                                 l_partkey ASC) AS rnk
         FROM per WHERE tot_qty >= 100)
       SELECT ch, CAST(rnk AS BIGINT) AS rnk, l_partkey,
              CAST(ret_qty AS DOUBLE) AS ret_qty, CAST(tot_qty AS DOUBLE) AS tot_qty
       FROM ranked WHERE rnk <= 10
       ORDER BY ch, rnk, l_partkey"""

  /** q29: customers who bought an item, returned it, and bought the SAME
    * item again in a LATER order — the fact→returns→fact chain on the
    * composite (customer, item) key. */
  def q_ds_repeat_purchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_returnflag", dec($"l_quantity").as("qty"))
      .join(o, $"l_orderkey" === $"o_orderkey")
    val sales = li.filter($"l_returnflag" =!= "R")
      .select($"o_custkey".as("cust"), $"l_partkey".as("part"),
        $"o_orderdate".as("sale_date"), $"qty".as("sale_qty"))
    val returns = li.filter($"l_returnflag" === "R")
      .select($"o_custkey".as("cust"), $"l_partkey".as("part"),
        $"o_orderdate".as("ret_date"), $"qty".as("ret_qty"))
    val repeats = sales.as("s1")
      .join(returns.as("r"), Seq("cust", "part"))
      .join(sales.as("s2"), Seq("cust", "part"))
      .filter($"s2.sale_date" > $"r.ret_date")
    val c = table(s, dir, "customer").select($"c_custkey".as("cust"), $"c_nationkey")
    repeats.join(broadcast(c), "cust")
      .groupBy($"c_nationkey")
      .agg(countDistinct($"cust").as("n_customers"),
        count(lit(1)).as("n_chains"),
        asDouble(sum($"r.ret_qty")).as("returned_qty"))
      .orderBy($"c_nationkey")
  }
  val qDsRepeatPurchaseSql: String =
    """WITH li AS (
         SELECT o_custkey AS cust, l_partkey AS part, l_returnflag,
                o_orderdate, CAST(l_quantity AS DECIMAL(12,2)) AS qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       sales AS (
         SELECT cust, part, o_orderdate AS sale_date, qty AS sale_qty
         FROM li WHERE l_returnflag <> 'R'),
       ret AS (
         SELECT cust, part, o_orderdate AS ret_date, qty AS ret_qty
         FROM li WHERE l_returnflag = 'R'),
       chains AS (
         SELECT s1.cust, r.ret_qty
         FROM sales s1
         JOIN ret r ON s1.cust = r.cust AND s1.part = r.part
         JOIN sales s2 ON s1.cust = s2.cust AND s1.part = s2.part
         WHERE s2.sale_date > r.ret_date)
       SELECT c_nationkey,
         count(DISTINCT cust) AS n_customers,
         count(*) AS n_chains,
         CAST(sum(ret_qty) AS DOUBLE) AS returned_qty
       FROM chains JOIN customer ON cust = c_custkey
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  val queries: Map[String, Q] = Map(
    "q_ds_multi_warehouse" -> q_ds_multi_warehouse _,
    "q_ds_growth_compare" -> q_ds_growth_compare _,
    "q_ds_return_rank" -> q_ds_return_rank _,
    "q_ds_repeat_purchase" -> q_ds_repeat_purchase _)

  val oracles: Map[String, String] = Map(
    "q_ds_multi_warehouse" -> qDsMultiWarehouseSql,
    "q_ds_growth_compare" -> qDsGrowthCompareSql,
    "q_ds_return_rank" -> qDsReturnRankSql,
    "q_ds_repeat_purchase" -> qDsRepeatPurchaseSql)
}
