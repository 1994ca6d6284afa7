package graft

import org.apache.spark.sql.functions._

import graft.sources.CassandraWire
import graft.catalog.CassandraCatalog

/** CQL native protocol v4: STARTUP handshake, QUERY/RESULT round trips,
  * paging, token-range predicates over the Murmur3 ring, wire schema
  * discovery, and the DSv2 read path with token splits covering every row
  * exactly once (reference plugin/trino-cassandra). */
class CassandraWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new CassandraWire.Server()
  override def afterAll(): Unit = srv.close()

  srv.createTable("shop", "events",
    Seq(CassandraWire.CqlColumn("id", CassandraWire.TBigint),
      CassandraWire.CqlColumn("kind", CassandraWire.TVarchar),
      CassandraWire.CqlColumn("qty", CassandraWire.TInt),
      CassandraWire.CqlColumn("score", CassandraWire.TDouble),
      CassandraWire.CqlColumn("ok", CassandraWire.TBoolean)),
    (1 to 300).map(i => Array[Any](i.toLong, s"k${i % 5}", i, i * 0.5,
      i % 2 == 0)).toVector)

  test("STARTUP handshake and typed QUERY round trip") {
    val c = new CassandraWire.Client("127.0.0.1", srv.port)
    try {
      val page = c.query("SELECT id, kind, qty, score, ok FROM shop.events WHERE id = 7")
      assert(page.columns.map(_.name) == Seq("id", "kind", "qty", "score", "ok"))
      assert(page.rows == Vector(Seq(7L, "k2", 7, 3.5, false)))
    } finally c.close()
  }

  test("paging drains every row exactly once through paging_state") {
    val c = new CassandraWire.Client("127.0.0.1", srv.port)
    try {
      val (_, it) = c.queryAll("SELECT id FROM shop.events", pageSize = 37)
      val ids = it.map(_.head.asInstanceOf[Long]).toVector
      assert(ids.size == 300)
      assert(ids.distinct.size == 300)
    } finally c.close()
  }

  test("token() ranges partition the ring: each row in exactly one range") {
    val c = new CassandraWire.Client("127.0.0.1", srv.port)
    try {
      val mid = 0L
      val lowHalf = c.queryAll(
        s"SELECT id FROM shop.events WHERE token(id) >= ${Long.MinValue} AND token(id) <= $mid ALLOW FILTERING")
        ._2.map(_.head.asInstanceOf[Long]).toSet
      val highHalf = c.queryAll(
        s"SELECT id FROM shop.events WHERE token(id) > $mid AND token(id) <= ${Long.MaxValue} ALLOW FILTERING")
        ._2.map(_.head.asInstanceOf[Long]).toSet
      assert(lowHalf.intersect(highHalf).isEmpty)
      assert(lowHalf.size + highHalf.size == 300)
      assert(lowHalf.nonEmpty && highHalf.nonEmpty) // murmur3 spreads the ring
    } finally c.close()
  }

  test("schema discovery through system_schema.columns over the wire") {
    val c = new CassandraWire.Client("127.0.0.1", srv.port)
    try {
      val (_, it) = c.queryAll(
        "SELECT column_name, type FROM system_schema.columns WHERE keyspace_name = 'shop' AND table_name = 'events' ALLOW FILTERING")
      val cols = it.map(r => (r(0), r(1))).toVector
      assert(cols.contains(("id", "bigint")))
      assert(cols.contains(("score", "double")))
      assert(cols.size == 5)
    } finally c.close()
  }

  test("errors carry the protocol ERROR shape") {
    val c = new CassandraWire.Client("127.0.0.1", srv.port)
    try {
      val e = intercept[IllegalArgumentException](
        c.query("SELECT nope FROM shop.events"))
      assert(e.getMessage.contains("cql error"))
    } finally c.close()
  }

  test("spark read: wire schema, token splits, pushdown") {
    val df = CassandraCatalog.read(spark, "127.0.0.1", srv.port,
      "shop", "events", splits = 4)
    // canonical CQL layout: partition key first, then regular columns
    // alphabetically (system_schema.columns clusters by column_name, so
    // fixture declaration order must NOT leak through)
    assert(df.schema.fieldNames.toSeq == Seq("id", "kind", "ok", "qty", "score"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 300) // ranges cover the ring exactly once
    val filtered = df.filter(col("score") >= 100.0 && col("kind") === "k0")
      .select("id", "qty")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("CassandraScan"), plan)
    assert(plan.contains("\"score\" >= 100.0"), plan)
    assert(filtered.count() == (200 to 300).count(_ % 5 == 0))
  }

  test("partition key is discovered via kind, not column order") {
    // pk 'zkey' sorts LAST alphabetically: a client that assumes the first
    // system_schema.columns row is the key would token() a non-key column
    srv.createTable("shop", "bykind",
      Seq(CassandraWire.CqlColumn("zkey", CassandraWire.TBigint),
        CassandraWire.CqlColumn("alpha", CassandraWire.TVarchar)),
      (1 to 50).map(i => Array[Any](i.toLong, s"a$i")).toVector)
    val df = CassandraCatalog.read(spark, "127.0.0.1", srv.port,
      "shop", "bykind", splits = 3)
    assert(df.schema.fieldNames.toSeq == Seq("zkey", "alpha"))
    assert(df.count() == 50) // token("zkey") splits cover the ring
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("CassandraScan"), scan)
  }

  test("NaN comparison is not pushed as invalid CQL") {
    val df = CassandraCatalog.read(spark, "127.0.0.1", srv.port,
      "shop", "events", splits = 2)
    // NaN has no CQL literal: the filter must stay in Spark (answer: 0 rows)
    assert(df.filter(col("score") === Double.NaN).count() == 0)
    assert(df.filter(col("score") =!= Double.PositiveInfinity).count() == 300)
  }

  test("cassandra_table TVF from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT kind FROM TABLE(cassandra_table('127.0.0.1', ${srv.port},
          'shop', 'events')) WHERE id = 11""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("k1"))
  }
}
