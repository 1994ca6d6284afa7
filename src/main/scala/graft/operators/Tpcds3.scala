package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shape mini-suite, part 3 (reference texts
  * testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
  * q66.sql, q41.sql, q73.sql). Three more structurally distinct shapes:
  *
  *  - q66: WIDE bucketed aggregation — one pass over the fact producing 12
  *    `sum(CASE WHEN month = m THEN amt END)` columns (+ totals). Stresses
  *    wide aggregate buffers; the single-scan shape is what survives at
  *    100 TB (12 self-joins would not).
  *  - q41: OR-of-AND predicate battery inside an IN-subquery over the same
  *    dimension — the optimizer must not distribute the disjunction into a
  *    join explosion.
  *  - q73: HAVING-range "ticket counts" — per-order item counts filtered to
  *    a band, joined back to the customer dimension.
  *
  * Money goes through DECIMAL(12,2) sums with a final DOUBLE cast
  * (package.scala convention), so both engines agree bit-exactly. */
object Tpcds3 {

  /** q66 shape: monthly buckets as one wide aggregate, single fact scan. */
  def q_ds_wide_buckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = table(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", dec($"l_quantity").as("qty"))
    val o = table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"),
      month($"o_orderdate").as("m"), year($"o_orderdate").as("yr"))
    val joined = li.join(o, "l_orderkey").filter($"yr" === 1995)
    def bucket(m: Int): Column =
      sum(when($"m" === m, $"qty").otherwise(lit(null))).as(f"q$m%02d")
    joined
      .groupBy(($"l_suppkey" % 10).as("wh"))
      .agg(bucket(1), bucket(2), bucket(3), bucket(4), bucket(5), bucket(6),
        bucket(7), bucket(8), bucket(9), bucket(10), bucket(11), bucket(12),
        sum($"qty").as("q_total"), count(lit(1)).as("n"))
      .select($"wh" +: (1 to 12).map(m => coalesce(col(f"q$m%02d"), lit(0))
          .cast("double").as(f"q$m%02d")) :+
        $"q_total".cast("double").as("q_total") :+ $"n": _*)
      .orderBy($"wh")
  }
  val qDsWideBucketsSql: String = {
    val buckets = (1 to 12).map(m =>
      s"CAST(coalesce(sum(CASE WHEN month(o_orderdate) = $m THEN CAST(l_quantity AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS q${"%02d".format(m)}")
      .mkString(",\n         ")
    s"""SELECT l_suppkey % 10 AS wh,
         $buckets,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS q_total,
         count(*) AS n
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE year(o_orderdate) = 1995
       GROUP BY 1 ORDER BY 1"""
  }

  /** q41 shape: DISTINCT dimension attribute gated by an IN-subquery whose
    * body is an OR of AND-batteries over the same dimension. */
  def q_ds_or_battery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = table(s, dir, "part")
    val battery =
      ($"p_type".startsWith("ECONOMY") && $"p_size".between(1, 20)) ||
      ($"p_type".startsWith("STANDARD") && $"p_size".between(10, 35)) ||
      ($"p_type".startsWith("PROMO") && $"p_size".between(25, 50))
    val keys = p.filter(battery).select($"p_partkey")
    p.join(keys, Seq("p_partkey"), "left_semi")
      .select($"p_brand").distinct()
      .orderBy($"p_brand")
  }
  val qDsOrBatterySql: String =
    """SELECT DISTINCT p_brand FROM part
       WHERE p_partkey IN (
         SELECT p_partkey FROM part
         WHERE (p_type LIKE 'ECONOMY%' AND p_size BETWEEN 1 AND 20)
            OR (p_type LIKE 'STANDARD%' AND p_size BETWEEN 10 AND 35)
            OR (p_type LIKE 'PROMO%' AND p_size BETWEEN 25 AND 50))
       ORDER BY p_brand"""

  /** q73 shape: per-order item counts banded by HAVING, joined back to the
    * customer dimension — the "tickets of 5-8 items" pattern. */
  def q_ds_ticket_band(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = table(s, dir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("items"))
      .filter($"items".between(5, 7))
    table(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(counts, $"o_orderkey" === $"l_orderkey")
      .join(table(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"items")
      .agg(count(lit(1)).as("tickets"))
      .orderBy($"c_mktsegment", $"items")
  }
  val qDsTicketBandSql: String =
    """WITH counts AS (
         SELECT l_orderkey, count(*) AS items FROM lineitem
         GROUP BY l_orderkey HAVING count(*) BETWEEN 5 AND 7)
       SELECT c_mktsegment, items, count(*) AS tickets
       FROM orders JOIN counts ON o_orderkey = l_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment, items
       ORDER BY c_mktsegment, items"""

  val queries: Map[String, Q] = Map(
    "q_ds_wide_buckets" -> q_ds_wide_buckets _,
    "q_ds_or_battery" -> q_ds_or_battery _,
    "q_ds_ticket_band" -> q_ds_ticket_band _)

  val oracles: Map[String, String] = Map(
    "q_ds_wide_buckets" -> qDsWideBucketsSql,
    "q_ds_or_battery" -> qDsOrBatterySql,
    "q_ds_ticket_band" -> qDsTicketBandSql)
}
