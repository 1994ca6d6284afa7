package graft

import org.apache.spark.sql.functions._

import graft.sources.PgWire
import graft.catalog.PgCatalog

/** PostgreSQL wire protocol v3: startup handshake, simple-query round
  * trips, error recovery, the server-side SQL subset, and the DSv2 read
  * path with range splits and rendered-SQL pushdown (reference
  * plugin/trino-postgresql over plugin/trino-base-jdbc). */
class PgWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new PgWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createTable("items",
    Seq(PgWire.Column("id", PgWire.OidInt8), PgWire.Column("name", PgWire.OidVarchar),
      PgWire.Column("size", PgWire.OidInt4), PgWire.Column("price", PgWire.OidFloat8),
      PgWire.Column("live", PgWire.OidBool)),
    (1 to 100).map(i => Array[Any](i.toLong, s"item-$i", i % 10,
      i * 2.5, i % 2 == 0)).toVector)

  test("startup handshake and simple query over the wire") {
    val c = new PgWire.Client("127.0.0.1", srv.port)
    try {
      val (cols, rows) = c.query("SELECT id, name FROM items WHERE id <= 3")
      assert(cols.map(_.name) == Seq("id", "name"))
      assert(cols.map(_.oid) == Seq(PgWire.OidInt8, PgWire.OidVarchar))
      assert(rows == Vector(Seq("1", "item-1"), Seq("2", "item-2"), Seq("3", "item-3")))
    } finally c.close()
  }

  test("ErrorResponse surfaces and the connection recovers") {
    val c = new PgWire.Client("127.0.0.1", srv.port)
    try {
      val e = intercept[IllegalStateException](c.query("SELECT nope FROM items"))
      assert(e.getMessage.contains("does not exist"))
      // same connection keeps working after the error (ReadyForQuery resync)
      assert(c.query("SELECT COUNT(*) FROM items")._2.head.head == "100")
    } finally c.close()
  }

  test("server SQL subset: IN, IS NULL, OR, parens, LIMIT, MIN/MAX") {
    val c = new PgWire.Client("127.0.0.1", srv.port)
    try {
      assert(c.query("SELECT id FROM items WHERE id IN (5, 7, 9)")._2.size == 3)
      assert(c.query("SELECT id FROM items WHERE name IS NULL")._2.isEmpty)
      assert(c.query(
        "SELECT id FROM items WHERE (id < 3 OR id > 98) AND live = TRUE")._2
        .map(_.head).toSet == Set("2", "100"))
      assert(c.query("SELECT id FROM items LIMIT 7")._2.size == 7)
      val (_, mm) = c.query("SELECT MIN(id), MAX(id) FROM items")
      assert(mm.head == Seq("1", "100"))
      // text-format booleans arrive as t/f, per the protocol
      assert(c.query("SELECT live FROM items WHERE id = 2")._2.head.head == "t")
    } finally c.close()
  }

  test("keyword-prefixed identifiers and LIMIT-with-aggregate semantics") {
    srv.createTable("flags",
      Seq(PgWire.Column("not_active", PgWire.OidBool),
        PgWire.Column("count_x", PgWire.OidInt8)),
      (1 to 20).map(i => Array[Any](i % 2 == 0, i.toLong)).toVector)
    val c = new PgWire.Client("127.0.0.1", srv.port)
    try {
      // 'not_active'/'count_x' must parse as identifiers, not NOT/COUNT(
      assert(c.query("SELECT count_x FROM flags WHERE not_active = TRUE")._2.size == 10)
      // LIMIT applies to the aggregate OUTPUT row, not the input rows
      assert(c.query("SELECT COUNT(*) FROM items LIMIT 10")._2.head.head == "100")
      assert(c.query("SELECT MAX(id) FROM items LIMIT 1")._2.head.head == "100")
    } finally c.close()
  }

  test("spark read: schema, typed decode, and range splits") {
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items",
      partitionColumn = Some("id"), numPartitions = 4)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "size", "price", "live"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    val r = df.filter(col("id") === 42L).collect().head
    assert(r.getAs[String]("name") == "item-42")
    assert(r.getAs[Int]("size") == 2)
    assert(r.getAs[Double]("price") == 105.0)
    assert(r.getAs[Boolean]("live"))
  }

  test("filter pushdown renders remote SQL and prunes server-side") {
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
      .filter(col("size") >= 8 && col("live") === true)
      .select("id", "price")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PgScan"), plan)
    assert(plan.contains("\"size\" >= 8"), plan)
    assert(df.count() == 10)
  }

  test("limit pushdown caps each split's remote query") {
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items").limit(5)
    assert(df.collect().length == 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LIMIT 5"), plan)
  }

  test("pg_query TVF: raw passthrough from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT name FROM TABLE(pg_query('127.0.0.1', ${srv.port},
          'SELECT name FROM items WHERE id IN (11, 12)')) ORDER BY name""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("item-11", "item-12"))
  }
}
