package graft

import org.apache.spark.sql.functions._

import graft.sources.{ClickHouseWire, PgWire}
import graft.catalog.ChCatalog

/** ClickHouse HTTP interface: TSV-with-names-and-types round trips,
  * escaping, streamed responses, and the DSv2 read path with rendered-SQL
  * pushdown and range splits (reference plugin/trino-clickhouse). */
class ClickHouseWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new ClickHouseWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createTable("metrics",
    Seq(PgWire.Column("id", PgWire.OidInt8), PgWire.Column("label", PgWire.OidVarchar),
      PgWire.Column("v", PgWire.OidFloat8), PgWire.Column("ok", PgWire.OidBool)),
    (1 to 80).map(i => Array[Any](i.toLong,
      if (i == 7) "tab\there" else s"m-$i", i * 0.5, i % 4 == 0)).toVector)

  test("names+types header and typed decode over HTTP") {
    val c = new ClickHouseWire.Client("127.0.0.1", srv.port)
    val (cols, rows) = c.query("SELECT id, label, v, ok FROM metrics WHERE id <= 2")
    assert(cols.map(_.name) == Seq("id", "label", "v", "ok"))
    assert(cols.head.oid == PgWire.OidInt8) // arrived typed as Int64
    assert(rows.size == 2)
    assert(PgWire.decode(rows.head.head, cols.head.oid) == 1L)
  }

  test("TSV escaping round-trips tabs in values") {
    val c = new ClickHouseWire.Client("127.0.0.1", srv.port)
    val (_, rows) = c.query("SELECT label FROM metrics WHERE id = 7")
    assert(rows.head.head == "tab\there")
  }

  test("errors surface with the ClickHouse exception shape") {
    val c = new ClickHouseWire.Client("127.0.0.1", srv.port)
    val e = intercept[IllegalArgumentException](c.query("SELECT x FROM nope"))
    assert(e.getMessage.contains("DB::Exception"))
  }

  test("spark read: schema probe, range splits, pushdown") {
    val df = ChCatalog.read(spark, "127.0.0.1", srv.port, "metrics",
      partitionColumn = Some("id"), numPartitions = 4)
    assert(df.schema.fieldNames.toSeq == Seq("id", "label", "v", "ok"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 80)
    val filtered = df.filter(col("v") >= 30.0 && col("ok") === true).select("id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("ChScan"), plan)
    assert(plan.contains("\"v\" >= 30.0"), plan)
    assert(filtered.count() == (60 to 80).count(_ % 4 == 0))
    assert(df.limit(3).collect().length == 3)
  }

  test("aggregate pushdown renders remote GROUP BY") {
    // complete (single split): Spark's aggregate disappears
    val whole = ChCatalog.read(spark, "127.0.0.1", srv.port, "metrics")
      .groupBy(col("ok")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val plan = whole.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("GROUP BY"), plan)
    val rows = whole.collect()
    assert(rows.find(_.getAs[Boolean]("ok")).get.getAs[Long]("n") == 20L)
    // partial (range splits): remote SQL still groups per split
    val split = ChCatalog.read(spark, "127.0.0.1", srv.port, "metrics",
      partitionColumn = Some("id"), numPartitions = 4)
      .groupBy(col("ok")).agg(max(col("v")).as("mx"))
    assert(split.queryExecution.executedPlan.toString.contains("GROUP BY"))
    assert(split.collect().map(r =>
      (r.getAs[Boolean]("ok"), r.getAs[Double]("mx"))).toMap ==
      Map(true -> 40.0, false -> 39.5))
  }

  test("ch_query TVF from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT label FROM TABLE(ch_query('127.0.0.1', ${srv.port},
          'SELECT label FROM metrics WHERE id IN (3, 4)')) ORDER BY label""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("m-3", "m-4"))
  }
}
