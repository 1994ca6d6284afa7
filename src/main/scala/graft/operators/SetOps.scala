package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7).
  *
  * The reference lowers INTERSECT/EXCEPT to union + per-source counts
  * (sql/planner/iterative/rule/ImplementIntersectAll.java:69, ImplementExceptAll.java:71);
  * Spark has native unionAll/intersect/intersectAll/except/exceptAll — Catalyst
  * performs the equivalent rewrites (ReplaceIntersectWithSemiJoin, RewriteExceptAll).
  */
object SetOps {
  private def custNations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "customer").select($"c_nationkey".as("nationkey"))
  }
  private def suppNations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
  }

  def q_union_all(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    custNations(s, dir).unionAll(suppNations(s, dir))
      .groupBy($"nationkey").agg(count(lit(1)).as("cnt"))
      .orderBy($"nationkey")
  }
  val qUnionAllSql: String =
    """SELECT nationkey, count(*) AS cnt FROM (
         SELECT c_nationkey AS nationkey FROM customer
         UNION ALL SELECT s_nationkey FROM supplier)
       GROUP BY nationkey ORDER BY nationkey"""

  def q_union_distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    custNations(s, dir).union(suppNations(s, dir)).distinct()
      .orderBy($"nationkey")
  }
  val qUnionDistinctSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
       UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  def q_intersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    custNations(s, dir).intersect(suppNations(s, dir)).orderBy($"nationkey")
  }
  val qIntersectSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  /** Customers who ordered, minus customers who ever placed a >250k order. */
  def q_except(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = table(s, dir, "orders")
    o.select($"o_custkey".as("custkey"))
      .except(o.filter($"o_totalprice" > 250000.0).select($"o_custkey".as("custkey")))
      .orderBy($"custkey")
  }
  val qExceptSql: String =
    """SELECT o_custkey AS custkey FROM orders
       EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
       ORDER BY custkey"""

  def q_intersect_all(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    custNations(s, dir).intersectAll(suppNations(s, dir)).orderBy($"nationkey")
  }
  val qIntersectAllSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  /** Multiset semantics: one orderkey occurrence per lineitem minus one per
    * order — leaves (lines-1) copies for multi-line orders. */
  def q_except_all(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem").select($"l_orderkey".as("orderkey"))
      .exceptAll(table(s, dir, "orders").select($"o_orderkey".as("orderkey")))
      .orderBy($"orderkey")
  }
  val qExceptAllSql: String =
    """SELECT l_orderkey AS orderkey FROM lineitem
       EXCEPT ALL SELECT o_orderkey FROM orders ORDER BY orderkey"""

  val queries: Map[String, Q] = Map(
    "q_union_all" -> q_union_all _,
    "q_union_distinct" -> q_union_distinct _,
    "q_intersect" -> q_intersect _,
    "q_except" -> q_except _,
    "q_intersect_all" -> q_intersect_all _,
    "q_except_all" -> q_except_all _)

  val oracles: Map[String, String] = Map(
    "q_union_all" -> qUnionAllSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_intersect" -> qIntersectSql,
    "q_except" -> qExceptSql,
    "q_intersect_all" -> qIntersectAllSql,
    "q_except_all" -> qExceptAllSql)
}
