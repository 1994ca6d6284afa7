package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core: scan/filter/project, aggregation, joins, subqueries.
  *
  * Maps 1:1 onto the reference operator inventory (SURVEY.md §2.1–§2.4):
  *  - TableScan/ScanFilterAndProject (reference: operator/ScanFilterAndProjectOperator.java:66)
  *    → Catalyst FileSourceScan with pushed filters + pruned columns.
  *  - HashAggregationOperator (operator/HashAggregationOperator.java:46)
  *    → partial+final HashAggregateExec via groupBy().agg().
  *  - LookupJoin/HashBuilder (operator/join/spilling/LookupJoinOperator.java:43)
  *    → broadcast/shuffled hash/sort-merge join picked by Catalyst + AQE.
  *  - HashSemiJoin (operator/HashSemiJoinOperator.java:44) → left_semi/left_anti.
  *  - NestedLoopJoin (operator/join/NestedLoopJoinOperator.java:45) → crossJoin /
  *    theta condition on equi-join (join filter functions, JoinFilterFunctionCompiler).
  *
  * Scale notes: dimension sides (region/nation, filtered customer, scalar aggregates)
  * are explicitly broadcast; fact-fact joins shuffle on their keys and AQE handles
  * skew. Filters are expressed on raw columns so parquet row-group pruning applies.
  */
object Relational {

  // exact decimal revenue term used across TPC-H-style queries; the cast to
  // DECIMAL(18,4) keeps the triple product within both engines' precision-38 cap
  private def discPrice(s: SparkSession) = {
    import s.implicits._
    (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).cast(DecimalType(18, 4))
  }
  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"

  def q1_agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        asDouble(sum(discPrice(s))).as("sum_disc_price"),
        asDouble(sum((discPrice(s) * (lit(1) + dec($"l_tax"))).cast(DecimalType(24, 6)))).as("sum_charge"),
        (asDouble(sum(dec($"l_quantity"))) / count(lit(1))).as("avg_qty"),
        (asDouble(sum(dec($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum($discPriceSql) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST($discPriceSql * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  def q6_filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount" >= 0.02 && $"l_discount" <= 0.04 && $"l_quantity" < 24)
      .agg(asDouble(sum(dec($"l_extendedprice") * dec($"l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }
  val q6FilterSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24"""

  /** Projection+filter pushdown demo: the physical scan must read only 4 columns
    * with the shipdate predicate pushed (asserted in PlanShapeSpec). */
  def q_scan_project(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("2001-10-01").cast("timestamp"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
      .limit(100)
  }
  val qScanProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-10-01'
       ORDER BY l_orderkey, l_linenumber LIMIT 100"""

  /** ValuesOperator (reference: operator/ValuesOperator.java:26) → LocalRelation. */
  def q_values(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((1, "ALPHA"), (2, "BETA"), (3, "GAMMA"))
      .toDF("id", "name")
      .select($"id", $"name", ($"id" * 10).as("tens"))
      .orderBy($"id")
  }
  val qValuesSql: String =
    """SELECT id, name, id * 10 AS tens
       FROM (VALUES (1,'ALPHA'),(2,'BETA'),(3,'GAMMA')) AS t(id, name) ORDER BY id"""

  /** TPC-H Q3 shape: selective dim filter, two hash joins, agg, top-N. */
  def q3_join_topn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val o = table(s, dir, "orders").filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
    val l = table(s, dir, "lineitem").filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(asDouble(sum(discPrice(s))).as("revenue"))
      .select($"l_orderkey", $"revenue",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"), $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  val q3JoinTopnSql: String =
    s"""SELECT l_orderkey, CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
         AND l_shipdate > TIMESTAMP '1998-03-15'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** TPC-H Q5 shape: 6-way join with broadcast dims, revenue per nation. */
  def q5_multi_join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = table(s, dir, "region").filter($"r_name" === "ASIA")
    val n = table(s, dir, "nation")
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = table(s, dir, "lineitem")
    val sup = table(s, dir, "supplier")
    // r18 join order (guide §3): nation⋈region(ASIA) attach to the
    // SUPPLIER's nationkey before the customer join — the 5-of-25-nations
    // region cut shrinks the probe stream 5x ahead of the widest build
    // (customer); the customer equi-pair (custkey AND nationkey) is
    // unchanged, so results are identical (inner joins commute).
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .join(c, $"o_custkey" === $"c_custkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(asDouble(sum(discPrice(s))).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  val q5MultiJoinSql: String =
    s"""SELECT n_name, CAST(sum($discPriceSql) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  def q_join_left(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("order_cnt"),
        asDouble(coalesce(sum(dec($"o_totalprice")), lit(0).cast(DecimalType(12, 2)))).as("total_spent"))
      .orderBy($"c_custkey")
  }
  val qJoinLeftSql: String =
    """SELECT c_custkey, count(o_orderkey) AS order_cnt,
       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey"""

  def q_join_right(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders").filter($"o_totalprice" > 300000.0)
    o.join(c, $"o_custkey" === $"c_custkey", "right")
      .groupBy($"c_nationkey")
      .agg(count($"o_orderkey").as("big_orders"), count(lit(1)).as("n_rows"))
      .orderBy($"c_nationkey")
  }
  val qJoinRightSql: String =
    """SELECT c_nationkey, count(o_orderkey) AS big_orders, count(*) AS n_rows
       FROM (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
       RIGHT JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  def q_join_full(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cc = table(s, dir, "customer").filter($"c_acctbal" > 9000.0)
      .groupBy($"c_nationkey".as("ck")).agg(count(lit(1)).as("rich_customers"))
    val ss = table(s, dir, "supplier").filter($"s_acctbal" > 0.0)
      .groupBy($"s_nationkey".as("sk")).agg(count(lit(1)).as("suppliers"))
    cc.join(ss, $"ck" === $"sk", "full")
      .select(coalesce($"ck", $"sk").as("nationkey"),
        coalesce($"rich_customers", lit(0L)).as("rich_customers"),
        coalesce($"suppliers", lit(0L)).as("suppliers"))
      .orderBy($"nationkey")
  }
  val qJoinFullSql: String =
    """SELECT coalesce(ck, sk) AS nationkey,
       coalesce(rich_customers, 0) AS rich_customers, coalesce(suppliers, 0) AS suppliers
       FROM (SELECT c_nationkey AS ck, count(*) AS rich_customers FROM customer WHERE c_acctbal > 9000.0 GROUP BY c_nationkey) c
       FULL JOIN (SELECT s_nationkey AS sk, count(*) AS suppliers FROM supplier WHERE s_acctbal > 0.0 GROUP BY s_nationkey) s
       ON ck = sk ORDER BY nationkey"""

  def q_join_semi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders")
    val l = table(s, dir, "lineitem").filter($"l_quantity" === 50.0)
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }
  val qJoinSemiSql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity = 50.0)
       ORDER BY o_orderkey"""

  def q_join_anti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders").filter($"o_totalprice" > 250000.0)
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  val qJoinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
       ORDER BY c_custkey"""

  def q_join_cross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "region").crossJoin(table(s, dir, "nation"))
      .select($"r_name", $"n_name", ($"r_regionkey" === $"n_regionkey").as("home"))
      .orderBy($"r_name", $"n_name")
  }
  val qJoinCrossSql: String =
    """SELECT r_name, n_name, r_regionkey = n_regionkey AS home
       FROM region CROSS JOIN nation ORDER BY r_name, n_name"""

  /** Equi join with extra theta condition (reference join filter functions:
    * operator/join/InternalJoinFilterFunction.java). */
  def q_join_theta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    l.join(o, $"l_orderkey" === $"o_orderkey" && $"l_shipdate" > $"o_orderdate")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("late_lines"))
      .orderBy($"o_orderpriority")
  }
  val qJoinThetaSql: String =
    """SELECT o_orderpriority, count(*) AS late_lines
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Scalar subquery (EnforceSingleRow, reference: operator/EnforceSingleRowOperator.java:28):
    * executed as a broadcast of the 1-row aggregate. Exact-decimal avg keeps the
    * threshold bit-identical across engines. */
  def q_subq_scalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = table(s, dir, "part")
    val avgP = p.agg((asDouble(sum(dec($"p_retailprice"))) / count(lit(1))).as("avg_price"))
    p.crossJoin(broadcast(avgP))
      .filter($"p_retailprice" > $"avg_price")
      .select($"p_partkey", $"p_name", $"p_retailprice")
      .orderBy($"p_partkey")
  }
  val qSubqScalarSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
       WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) FROM part)
       ORDER BY p_partkey"""

  /** IN-subquery through the SQL front end (Catalyst RewritePredicateSubquery). */
  def q_subq_in(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerAll(s, dir)
    s.sql(
      """SELECT n_nationkey, n_name FROM nation
         WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE'))
         ORDER BY n_nationkey""")
  }
  val qSubqInSql: String =
    """SELECT n_nationkey, n_name FROM nation
       WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE'))
       ORDER BY n_nationkey"""

  /** Correlated EXISTS (decorrelated by Catalyst into a left-semi join). */
  def q_subq_exists(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerAll(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
         ORDER BY s_suppkey""")
  }
  val qSubqExistsSql: String =
    """SELECT s_suppkey, s_name FROM supplier
       WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
       ORDER BY s_suppkey"""

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1_agg _,
    "q6_filter" -> q6_filter _,
    "q_scan_project" -> q_scan_project _,
    "q_values" -> q_values _,
    "q3_join_topn" -> q3_join_topn _,
    "q5_multi_join" -> q5_multi_join _,
    "q_join_left" -> q_join_left _,
    "q_join_right" -> q_join_right _,
    "q_join_full" -> q_join_full _,
    "q_join_semi" -> q_join_semi _,
    "q_join_anti" -> q_join_anti _,
    "q_join_cross" -> q_join_cross _,
    "q_join_theta" -> q_join_theta _,
    "q_subq_scalar" -> q_subq_scalar _,
    "q_subq_in" -> q_subq_in _,
    "q_subq_exists" -> q_subq_exists _)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q6_filter" -> q6FilterSql,
    "q_scan_project" -> qScanProjectSql,
    "q_values" -> qValuesSql,
    "q3_join_topn" -> q3JoinTopnSql,
    "q5_multi_join" -> q5MultiJoinSql,
    "q_join_left" -> qJoinLeftSql,
    "q_join_right" -> qJoinRightSql,
    "q_join_full" -> qJoinFullSql,
    "q_join_semi" -> qJoinSemiSql,
    "q_join_anti" -> qJoinAntiSql,
    "q_join_cross" -> qJoinCrossSql,
    "q_join_theta" -> qJoinThetaSql,
    "q_subq_scalar" -> qSubqScalarSql,
    "q_subq_in" -> qSubqInSql,
    "q_subq_exists" -> qSubqExistsSql)
}
