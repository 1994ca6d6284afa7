package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-N / distinct-limit (SURVEY.md §2.6).
  *
  * Reference mapping:
  *  - OrderByOperator (operator/OrderByOperator.java:45) → SortExec over range
  *    partitioning (global sort without a single-node bottleneck).
  *  - TopNOperator (operator/TopNOperator.java:31) → TakeOrderedAndProjectExec,
  *    which Catalyst substitutes automatically for orderBy+limit — per-partition
  *    heaps + a driver merge, no global sort.
  *  - LimitOperator/OffsetNode (operator/LimitOperator.java:23) → limit/offset.
  *  - DistinctLimitOperator (operator/DistinctLimitOperator.java:36) →
  *    dropDuplicates().limit(n).
  */
object Sorts {

  def q_topn_offset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_totalprice")
      .offset(20).limit(50)
  }
  val qTopnOffsetSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 20"""

  /** Multi-key sort with an explicit NULLS FIRST on a nullable derived key. */
  def q_sort_nulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select(nullif($"o_orderstatus", lit("O")).as("status_n"), $"o_orderkey")
      .orderBy($"status_n".asc_nulls_first, $"o_orderkey")
      .limit(100)
  }
  val qSortNullsSql: String =
    """SELECT nullif(o_orderstatus, 'O') AS status_n, o_orderkey FROM orders
       ORDER BY status_n NULLS FIRST, o_orderkey LIMIT 100"""

  def q_distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val qDistinctSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
       ORDER BY l_returnflag, l_linestatus"""

  def q_distinct_limit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderpriority").distinct()
      .orderBy($"o_orderpriority")
      .limit(3)
  }
  val qDistinctLimitSql: String =
    """SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3"""

  /** Deterministic Bernoulli-style sample via key arithmetic (the reference
    * lowers SampleNode to a filter the same way:
    * sql/planner/iterative/rule/ImplementBernoulliSampleAsFilter.java). A seeded
    * rand() would not be comparable across engines, so the "coin" is a hash-like
    * modulus on the key — pushdown-friendly and reproducible at any scale. */
  def q_sample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter(($"l_orderkey" * 2654435761L) % 100 < 5)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("sampled_rows"))
      .orderBy($"l_returnflag")
  }
  val qSampleSql: String =
    """SELECT l_returnflag, count(*) AS sampled_rows FROM lineitem
       WHERE (l_orderkey * 2654435761) % 100 < 5
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  val queries: Map[String, Q] = Map(
    "q_topn_offset" -> q_topn_offset _,
    "q_sort_nulls" -> q_sort_nulls _,
    "q_distinct" -> q_distinct _,
    "q_distinct_limit" -> q_distinct_limit _,
    "q_sample" -> q_sample _)

  val oracles: Map[String, String] = Map(
    "q_topn_offset" -> qTopnOffsetSql,
    "q_sort_nulls" -> qSortNullsSql,
    "q_distinct" -> qDistinctSql,
    "q_distinct_limit" -> qDistinctLimitSql,
    "q_sample" -> qSampleSql)
}
