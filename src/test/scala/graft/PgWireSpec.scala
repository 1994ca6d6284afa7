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

  test("TopN pushdown ships ORDER BY + LIMIT to the remote engine") {
    // single split → fully pushed: only 3 rows cross the wire, in order
    val before = srv.rowsServed.get()
    val top = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
      .orderBy(col("price").desc).limit(3)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("ORDER BY"), plan)
    val rows = top.collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(100L, 99L, 98L))
    assert(srv.rowsServed.get() - before <= 3,
      s"served ${srv.rowsServed.get() - before} rows for a top-3 query")
    // range splits → partially pushed: per-split top-3, Spark merges;
    // the global answer is identical
    val split = PgCatalog.read(spark, "127.0.0.1", srv.port, "items",
      partitionColumn = Some("id"), numPartitions = 4)
      .orderBy(col("price").desc).limit(3)
    assert(split.collect().map(_.getAs[Long]("id")).toSeq == Seq(100L, 99L, 98L))
  }

  test("OFFSET pushdown ships LIMIT/OFFSET remotely on single-split scans") {
    val before = srv.rowsServed.get()
    val page = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
      .orderBy(col("id")).offset(10).limit(5)
    val ids = page.collect().map(_.getAs[Long]("id")).toSeq
    assert(ids == Seq(11L, 12L, 13L, 14L, 15L))
    // pagination is remote: only the page crossed the wire
    assert(srv.rowsServed.get() - before <= 5,
      s"served ${srv.rowsServed.get() - before} rows for a 5-row page")
    // range-split scans refuse the offset (a per-split skip would be
    // wrong) — the answer stays exact with Spark applying it
    val split = PgCatalog.read(spark, "127.0.0.1", srv.port, "items",
      partitionColumn = Some("id"), numPartitions = 4)
      .orderBy(col("id")).offset(10).limit(5)
    assert(split.collect().map(_.getAs[Long]("id")).toSeq ==
      Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("COMPLETE aggregate pushdown: no Spark aggregate, groups cross the wire") {
    // single split (no partitionColumn) → the remote GROUP BY is the global
    // answer and Spark's aggregate disappears entirely
    val before = srv.rowsServed.get()
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
      .filter(col("live") === true)
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"),
        min(col("id")).as("lo"), max(col("id")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("GROUP BY"), plan)
    val rows = df.collect()
    assert(rows.length == 5) // live=even → sizes 0,2,4,6,8
    // only 5 group rows crossed the wire, not 50 matching items
    assert(srv.rowsServed.get() - before <= 6,
      s"served ${srv.rowsServed.get() - before} rows for a 5-group aggregate")
    val s4 = rows.find(_.getAs[Int]("size") == 4).get
    assert(s4.getAs[Long]("n") == 10L)
    assert(s4.getAs[Long]("lo") == 4L && s4.getAs[Long]("hi") == 94L)
    assert(s4.getAs[Double]("total") == (4 to 94 by 10).map(_ * 2.5).sum)
  }

  test("PARTIAL aggregate pushdown: each range split aggregates remotely") {
    val before = srv.rowsServed.get()
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items",
      partitionColumn = Some("id"), numPartitions = 4)
      .groupBy(col("live"))
      .agg(count(lit(1)).as("n"), sum(col("size")).as("ssum"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GROUP BY"), plan) // each split's remote SQL groups
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.find(_.getAs[Boolean]("live")).get.getAs[Long]("n") == 50L)
    // ≤ 2 groups × 4 splits + the MIN/MAX bounds row crossed, not 100 rows
    assert(srv.rowsServed.get() - before <= 10,
      s"served ${srv.rowsServed.get() - before} rows for a partial-agg scan")
  }

  test("global aggregate (no GROUP BY) pushes complete") {
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
      .agg(count(lit(1)).as("n"), avg(col("price")).as("p"))
    assert(!df.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(math.abs(r.getAs[Double]("p") - (1 to 100).map(_ * 2.5).sum / 100) < 1e-9)
  }

  test("NaN/Infinity comparisons stay in Spark, never invalid remote SQL") {
    val df = PgCatalog.read(spark, "127.0.0.1", srv.port, "items")
    // Double.toString(NaN) = "NaN" is not a SQL literal: the filter must be
    // evaluated by Spark (a residual), returning the exact answer
    val nan = df.filter(col("price") === Double.NaN)
    assert(!nan.queryExecution.executedPlan.toString.contains("NaN AND"), "pushed NaN")
    assert(nan.count() == 0)
    assert(df.filter(col("price") < Double.PositiveInfinity).count() == 100)
  }

  test("pg_query TVF: raw passthrough from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT name FROM TABLE(pg_query('127.0.0.1', ${srv.port},
          'SELECT name FROM items WHERE id IN (11, 12)')) ORDER BY name""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("item-11", "item-12"))
  }
}
