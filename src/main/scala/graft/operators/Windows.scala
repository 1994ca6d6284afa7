package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5).
  *
  * Reference mapping:
  *  - WindowOperator (operator/WindowOperator.java:70) → WindowExec after a
  *    hash-partition shuffle on partitionBy keys + intra-partition sort.
  *  - Ranking/value functions (operator/window/RowNumberFunction.java et al.,
  *    registration metadata/SystemFunctionBundle.java:392-402) → built-ins.
  *  - Frames (operator/window/RowsFraming.java:28, RangeFraming.java:31)
  *    → rowsBetween/rangeBetween.
  *  - TopNRankingOperator (operator/TopNRankingOperator.java:40) → rank filter,
  *    optimized to WindowGroupLimitExec by Catalyst (partial top-N before the
  *    shuffle — the same partial/final split the reference does).
  *
  * Determinism: every ORDER BY inside a window spec is total (unique tiebreak
  * key) wherever row identity matters; peer-sensitive functions (rank, range
  * frames) are additionally exercised with non-unique orderings since their
  * results are peer-stable. Ranking outputs are cast to long to match the
  * oracle's BIGINT.
  */
object Windows {

  def q_window_ranking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val peers = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc)
    val total = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
    table(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        row_number().over(total).cast("long").as("rn"),
        rank().over(peers).cast("long").as("rnk"),
        dense_rank().over(peers).cast("long").as("drnk"),
        percent_rank().over(peers).as("pr"),
        cume_dist().over(peers).as("cd"),
        ntile(4).over(total).cast("long").as("quartile"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }
  val qWindowRankingSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
       row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
       percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS pr,
       cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS cd,
       ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
       FROM customer ORDER BY c_mktsegment, c_custkey"""

  def q_window_value(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(s, dir, "events")
      .select($"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        lag($"event_type", 2, "none").over(w).as("prev2_type"),
        first($"value").over(w).as("first_value"),
        last($"value").over(wFull).as("last_value"),
        nth_value($"value", 2).over(wFull).as("second_value"))
      .orderBy($"event_id")
  }
  val qWindowValueSql: String =
    """SELECT event_id, user_id, value,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       lag(event_type, 2, 'none') OVER w AS prev2_type,
       first_value(value) OVER w AS first_value,
       last_value(value) OVER wf AS last_value,
       nth_value(value, 2) OVER wf AS second_value
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
              wf AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY event_id"""

  /** Running totals + moving window (ROWS frames); aggregates-as-window-functions
    * (reference: operator/window/AggregateWindowFunction.java). */
  def q_window_running(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-2, Window.currentRow)
    table(s, dir, "events")
      .select($"event_id", $"user_id",
        count(lit(1)).over(run).as("n_so_far"),
        asDouble(sum(dec($"value")).over(run)).as("running_value"),
        asDouble(sum(dec($"value")).over(mov)).as("moving3_value"),
        (asDouble(sum(dec($"value")).over(mov)) / count(lit(1)).over(mov)).as("moving3_avg"))
      .orderBy($"event_id")
  }
  val qWindowRunningSql: String =
    """SELECT event_id, user_id,
       count(*) OVER wr AS n_so_far,
       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_value,
       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER wm AS DOUBLE) AS moving3_value,
       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER wm AS DOUBLE) / count(*) OVER wm AS moving3_avg
       FROM events
       WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wm AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""

  /** RANGE frame with a numeric offset (day-grain sliding window per customer). */
  def q_window_range(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders")
      .withColumn("order_day", datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")).cast("long"))
    val w = Window.partitionBy($"o_custkey").orderBy($"order_day").rangeBetween(-30, 0)
    o.select($"o_orderkey", $"o_custkey",
        count(lit(1)).over(w).as("orders_30d"),
        asDouble(sum(dec($"o_totalprice")).over(w)).as("spend_30d"))
      .orderBy($"o_orderkey")
  }
  val qWindowRangeSql: String =
    """SELECT o_orderkey, o_custkey,
       count(*) OVER w AS orders_30d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS spend_30d
       FROM (SELECT *, CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS order_day FROM orders)
       WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
       ORDER BY o_orderkey"""

  /** Filter-over-rank top-N per group → WindowGroupLimitExec (partial top-N
    * before the shuffle; reference TopNRankingOperator.java:40). */
  def q_window_topn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }
  val qWindowTopnSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders)
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** GROUPS frames (reference: operator/window/GroupsFraming.java:28;
    * SqlBase.g4 windowFrame:879). Neither Spark nor DuckDB implements GROUPS
    * mode natively, so both sides express its definition directly: a GROUPS
    * frame of (n PRECEDING, m FOLLOWING) is exactly a RANGE frame of the same
    * offsets over dense_rank of the ORDER BY key — peer groups collapse to
    * consecutive integers, so integer RANGE distance = peer-group distance.
    * Same shuffle as any window (one hash partition + sort). */
  def q_window_groups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDate = Window.partitionBy($"o_orderstatus").orderBy($"o_orderdate")
    val o = table(s, dir, "orders")
      .withColumn("dr", dense_rank().over(byDate).cast("long"))
    val gPrec1 = Window.partitionBy($"o_orderstatus").orderBy($"dr").rangeBetween(-1, 0)
    val gAround = Window.partitionBy($"o_orderstatus").orderBy($"dr").rangeBetween(-1, 1)
    o.select($"o_orderkey", $"o_orderstatus",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"), $"dr",
        asDouble(sum(dec($"o_totalprice")).over(gPrec1)).as("gsum_prec1"),
        count(lit(1)).over(gAround).as("gcnt_around"))
      .orderBy($"o_orderkey")
  }
  val qWindowGroupsSql: String =
    """WITH d AS (
         SELECT *, dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS dr
         FROM orders)
       SELECT o_orderkey, o_orderstatus, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         CAST(dr AS BIGINT) AS dr,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
           (PARTITION BY o_orderstatus ORDER BY dr RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS gsum_prec1,
         count(*) OVER
           (PARTITION BY o_orderstatus ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS gcnt_around
       FROM d ORDER BY o_orderkey"""

  /** IGNORE NULLS navigation (reference: operator/window value functions all
    * take the SQL ignore-nulls flag): lag/lead skipping nulls plus the
    * last-observation-carried-forward pattern (last_value IGNORE NULLS over a
    * running frame) — the standard gap-fill for sparse sensor/event values. */
  def q_window_ignore_nulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "events")
      .withColumn("v", when($"event_type" === "error", lit(null)).otherwise($"value"))
      .select($"event_id", $"user_id", $"v",
        lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_v"),
        lead($"v", 1, null, ignoreNulls = true).over(w).as("next_v"),
        last($"v", ignoreNulls = true).over(run).as("locf_v"))
      .orderBy($"event_id")
  }
  val qWindowIgnoreNullsSql: String =
    """WITH e AS (
         SELECT event_id, user_id, ts,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
         FROM events)
       SELECT event_id, user_id, v,
         lag(v IGNORE NULLS) OVER w AS prev_v,
         lead(v IGNORE NULLS) OVER w AS next_v,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_v
       FROM e
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY event_id"""

  /** Window frame EXCLUDE clause (reference grammar SqlBase.g4 frameExtent /
    * EXCLUDE CURRENT ROW | GROUP | TIES; executed by the reference's framing
    * in operator/window/AggregateWindowFunction): Spark has no EXCLUDE, so
    * the engine lowers each mode onto exact frame arithmetic over a RANGE
    * frame (peer-deterministic, unlike ROWS under ties):
    *   EXCLUDE CURRENT ROW = frame − current
    *   EXCLUDE GROUP       = frame − peer-group sum
    *   EXCLUDE TIES        = frame − peer-group sum + current
    * Decimal money arithmetic keeps every identity exact; DuckDB evaluates
    * its NATIVE EXCLUDE frames as the oracle. */
  def q_window_exclude(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val range = Window.partitionBy($"c_mktsegment").orderBy($"c_nationkey")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val peers = Window.partitionBy($"c_mktsegment", $"c_nationkey")
    val c = table(s, dir, "customer").filter($"c_custkey" <= 2000)
      .withColumn("bal", dec($"c_acctbal"))
      .withColumn("frame_sum", sum($"bal").over(range))
      .withColumn("peer_sum", sum($"bal").over(peers))
    c.select($"c_custkey", $"c_mktsegment", $"c_nationkey",
        asDouble($"frame_sum").as("incl_sum"),
        asDouble($"frame_sum" - $"bal").as("excl_current"),
        asDouble($"frame_sum" - $"peer_sum").as("excl_group"),
        asDouble($"frame_sum" - $"peer_sum" + $"bal").as("excl_ties"))
      .orderBy($"c_custkey")
  }
  val qWindowExcludeSql: String =
    """WITH c AS (
         SELECT c_custkey, c_mktsegment, c_nationkey,
           CAST(c_acctbal AS DECIMAL(12,2)) AS bal
         FROM customer WHERE c_custkey <= 2000)
       SELECT c_custkey, c_mktsegment, c_nationkey,
         CAST(sum(bal) OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS incl_sum,
         CAST(coalesce(sum(bal) OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           EXCLUDE CURRENT ROW), 0) AS DOUBLE) AS excl_current,
         CAST(coalesce(sum(bal) OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           EXCLUDE GROUP), 0) AS DOUBLE) AS excl_group,
         CAST(coalesce(sum(bal) OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           EXCLUDE TIES), 0) AS DOUBLE) AS excl_ties
       FROM c ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_window_exclude" -> q_window_exclude _,
    "q_window_ignore_nulls" -> q_window_ignore_nulls _,
    "q_window_groups" -> q_window_groups _,
    "q_window_ranking" -> q_window_ranking _,
    "q_window_value" -> q_window_value _,
    "q_window_running" -> q_window_running _,
    "q_window_range" -> q_window_range _,
    "q_window_topn" -> q_window_topn _)

  val oracles: Map[String, String] = Map(
    "q_window_exclude" -> qWindowExcludeSql,
    "q_window_ignore_nulls" -> qWindowIgnoreNullsSql,
    "q_window_groups" -> qWindowGroupsSql,
    "q_window_ranking" -> qWindowRankingSql,
    "q_window_value" -> qWindowValueSql,
    "q_window_running" -> qWindowRunningSql,
    "q_window_range" -> qWindowRangeSql,
    "q_window_topn" -> qWindowTopnSql)
}
