package graft

import org.apache.spark.sql.functions._

import graft.sources.{PgWire, PinotWire}
import graft.catalog.PinotCatalog

/** Pinot broker API: query/sql round trips, in-band exceptions, and the
  * DSv2 read path with rendered-SQL pushdown (reference
  * plugin/trino-pinot PinotClient.submitBrokerQuery). */
class PinotWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new PinotWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createTable("games",
    Seq(PgWire.Column("game_id", PgWire.OidInt8), PgWire.Column("league", PgWire.OidVarchar),
      PgWire.Column("score", PgWire.OidInt4), PgWire.Column("rating", PgWire.OidFloat8)),
    (1 to 120).map(i => Array[Any](i.toLong, s"L${i % 3}", i, i * 0.25)).toVector)

  test("broker query returns resultTable with names, types, rows") {
    val c = new PinotWire.Client("127.0.0.1", srv.port)
    val (cols, rows) = c.query("SELECT game_id, league, rating FROM games WHERE game_id <= 2 LIMIT 10")
    assert(cols.map(_.name) == Seq("game_id", "league", "rating"))
    assert(rows == Vector(Seq(1L, "L1", 0.25), Seq(2L, "L2", 0.5)))
  }

  test("broker exceptions arrive in-band and surface as errors") {
    val c = new PinotWire.Client("127.0.0.1", srv.port)
    val e = intercept[IllegalStateException](c.query("SELECT x FROM nope LIMIT 1"))
    assert(e.getMessage.contains("pinot error"))
  }

  test("spark read: schema probe, pushdown renders broker SQL") {
    val df = PinotCatalog.read(spark, "127.0.0.1", srv.port, "games")
    assert(df.schema.fieldNames.toSeq == Seq("game_id", "league", "score", "rating"))
    assert(df.count() == 120)
    val filtered = df.filter(col("score") >= 100 && col("league") === "L0")
      .select("game_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PinotScan"), plan)
    assert(plan.contains("\"score\" >= 100"), plan)
    assert(filtered.count() == (100 to 120).count(_ % 3 == 0))
    assert(df.limit(9).collect().length == 9)
  }

  test("pinot_query TVF: raw broker SQL from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT league FROM TABLE(pinot_query('127.0.0.1', ${srv.port},
          'SELECT league FROM games WHERE game_id = 5 LIMIT 1'))""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("L2"))
  }
}
