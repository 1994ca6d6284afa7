package graft

import graft.catalog.JdbcSqlDialect
import graft.sources.PgWire

/** The JDBC dialect family ×3 (reference plugin/trino-base-jdbc subclassed
  * per engine): the SAME logical query renders to three DIFFERENT remote
  * SQL texts — double-quoted case-preserved (PostgreSQL/Derby family),
  * unquoted fold-to-upper (DB2/Oracle family), and backtick-quoted
  * (MySQL family, reference plugin/trino-mysql MySqlClient.java) — and all
  * three return identical results from the same engine. Derby cannot parse
  * backticks, so the matrix engine is the loopback wire server (whose SQL
  * subset accepts all three quotings, like MySQL/ClickHouse do). */
class DialectMatrixSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new PgWire.Server()
  override def afterAll(): Unit = srv.close()

  private val cols = Seq(
    PgWire.Column("o_orderkey", PgWire.OidInt8),
    PgWire.Column("o_orderstatus", PgWire.OidVarchar),
    PgWire.Column("o_totalprice", PgWire.OidFloat8))
  private val rows = (1 to 90).map(i => Array[Any](i.toLong,
    if (i % 3 == 0) "F" else "O", i * 10.0)).toVector

  // the fold-to-upper dialect renders ORDERS_ANSI; the engine folds
  // unquoted identifiers to lowercase, so the data also lives there
  srv.createTable("orders", cols, rows)
  srv.createTable("orders_ansi", cols, rows)

  private val dialects = Seq(
    JdbcSqlDialect.Quoted, JdbcSqlDialect.AnsiUnquoted, JdbcSqlDialect.BacktickMySql)

  private def exec(sql: String): Vector[Seq[String]] = {
    val c = new PgWire.Client("127.0.0.1", srv.port)
    try c.query(sql)._2 finally c.close()
  }

  test("three dialects render three different SQL texts") {
    val rendered = dialects.map(_.boundsQuery("orders", "o_orderkey"))
    assert(rendered.distinct.size == 3, rendered)
    assert(rendered(0).contains("\"o_orderkey\""))
    assert(rendered(1).contains("O_ORDERKEY") && !rendered(1).contains("\""))
    assert(rendered(2).contains("`o_orderkey`"))
  }

  test("identical results across the dialect matrix: bounds query") {
    val results = dialects.map(d => exec(d.boundsQuery("orders", "o_orderkey")))
    assert(results.forall(_ == results.head), results)
    assert(results.head == Vector(Seq("1", "90")))
  }

  test("identical results across the dialect matrix: IN-list lookup") {
    val results = dialects.map(d =>
      exec(d.inListLookup("orders", "o_orderkey", Seq(7L, 11L, 13L)))
        .map(_.take(2)))
    assert(results.forall(_ == results.head), results)
    assert(results.head.map(_.head) == Vector("7", "11", "13"))
  }

  test("identical results across the dialect matrix: filtered aggregate") {
    val results = dialects.map { d =>
      exec(s"SELECT ${d.quote("o_orderstatus")}, COUNT(*), " +
        s"SUM(${d.quote("o_totalprice")}) FROM ${d.tableName("orders")} " +
        s"WHERE ${d.quote("o_orderkey")} > 30 " +
        s"GROUP BY ${d.quote("o_orderstatus")}")
    }
    assert(results.forall(_ == results.head), results)
    assert(results.head.size == 2) // statuses F and O
  }

  test("backtick escaping round-trips a literal backtick") {
    assert(JdbcSqlDialect.BacktickMySql.quote("we`ird") == "`we``ird`")
  }
}
