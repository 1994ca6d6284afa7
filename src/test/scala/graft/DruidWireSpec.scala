package graft

import org.apache.spark.sql.functions._

import graft.sources.{DruidWire, PgWire}
import graft.catalog.DruidCatalog

/** Druid SQL HTTP API: array resultFormat with name+type headers, error
  * shape, and the DSv2 read path with rendered-SQL pushdown (reference
  * plugin/trino-druid over the public Druid SQL endpoint). */
class DruidWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new DruidWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createTable("wikipedia",
    Seq(PgWire.Column("page_id", PgWire.OidInt8), PgWire.Column("channel", PgWire.OidVarchar),
      PgWire.Column("delta", PgWire.OidFloat8), PgWire.Column("robot", PgWire.OidBool)),
    (1 to 90).map(i => Array[Any](i.toLong, s"#${i % 4}", i * 1.5,
      i % 3 == 0)).toVector)

  test("array resultFormat carries header, typesHeader, then rows") {
    val c = new DruidWire.Client("127.0.0.1", srv.port)
    val (cols, rows) = c.query(
      "SELECT page_id, channel, delta, robot FROM wikipedia WHERE page_id <= 2")
    assert(cols.map(_.name) == Seq("page_id", "channel", "delta", "robot"))
    assert(rows == Vector(Seq(1L, "#1", 1.5, false), Seq(2L, "#2", 3.0, false)))
  }

  test("errors carry the druidException shape") {
    val c = new DruidWire.Client("127.0.0.1", srv.port)
    val e = intercept[IllegalStateException](c.query("SELECT x FROM nope"))
    assert(e.getMessage.contains("druid error"))
  }

  test("spark read: schema probe and rendered-SQL pushdown") {
    val df = DruidCatalog.read(spark, "127.0.0.1", srv.port, "wikipedia")
    assert(df.schema.fieldNames.toSeq == Seq("page_id", "channel", "delta", "robot"))
    assert(df.count() == 90)
    val filtered = df.filter(col("delta") > 100.0 && col("robot") === true)
      .select("page_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("DruidScan"), plan)
    assert(plan.contains("\"delta\" > 100.0"), plan)
    assert(filtered.count() == (67 to 90).count(_ % 3 == 0))
    assert(df.limit(5).collect().length == 5)
  }

  test("druid_query TVF: raw SQL from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT channel FROM TABLE(druid_query('127.0.0.1', ${srv.port},
          'SELECT channel FROM wikipedia WHERE page_id = 6'))""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("#2"))
  }
}
