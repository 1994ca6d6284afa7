package graft

import graft.sources.RedisWire

/** RESP wire protocol: server/client round trips, SCAN cursor semantics,
  * pipelining, and the split-per-node Spark read with internal columns
  * (reference plugin/trino-redis RedisRecordCursor + internal fields). */
class RedisWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new RedisWire.Server()
  override def afterAll(): Unit = srv.close()

  test("RESP round trips: PING, SET/GET, HSET/HGETALL, TYPE, DBSIZE") {
    val c = new RedisWire.Client("127.0.0.1", srv.port)
    try {
      assert(c.ping())
      c.set("k1", "v1")
      assert(c.get("k1").contains("v1"))
      assert(c.get("absent").isEmpty)
      c.hset("h1", Map("f1" -> "a", "f2" -> "b"))
      assert(c.hgetall("h1") == Map("f1" -> "a", "f2" -> "b"))
      assert(c.command("TYPE", "k1") == "string")
      assert(c.command("TYPE", "h1") == "hash")
      assert(c.dbsize() >= 2)
    } finally c.close()
  }

  test("SCAN pages the keyspace exactly once, MATCH prunes server-side") {
    val c = new RedisWire.Client("127.0.0.1", srv.port)
    try {
      (0 until 57).foreach(i => c.set(f"scan:$i%03d", i.toString))
      var cursor = "0"; var first = true
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      while (first || cursor != "0") {
        first = false
        val (next, keys) = c.scan(cursor, Some("scan:*"), 10)
        cursor = next
        seen ++= keys
      }
      assert(seen.size == 57, s"got ${seen.size}")
      assert(seen.distinct.size == 57)
    } finally c.close()
  }

  test("pipelined MGET preserves order and nulls") {
    val c = new RedisWire.Client("127.0.0.1", srv.port)
    try {
      c.set("a", "1"); c.set("b", "2")
      assert(c.mget(Seq("a", "missing", "b")) == Seq(Some("1"), None, Some("2")))
    } finally c.close()
  }

  test("spark read: internal columns over strings and hashes") {
    import org.apache.spark.sql.functions._
    srv.set("doc:1", """{"v":10}""")
    srv.set("doc:2", """{"v":20}""")
    srv.hset("doc:3", Map("v" -> "30"))
    val df = RedisWire.read(spark, Seq(("127.0.0.1", srv.port)), Some("doc:*"))
    val rows = df.orderBy("_key").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("_key")).toSeq == Seq("doc:1", "doc:2", "doc:3"))
    assert(rows.forall(!_.getAs[Boolean]("_key_corrupt")))
    assert(rows.forall(r => r.getAs[Long]("_key_length") == 5L))
    // hash values surface as the field-map JSON; all decode uniformly
    val vs = df.withColumn("v", get_json_object(col("_value"), "$.v").cast("long"))
      .agg(sum("v")).collect().head.getLong(0)
    assert(vs == 60L)
  }

  test("redis_scan TVF reaches the wire client from SQL text") {
    srv.set("tvf:1", "x")
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"SELECT _key FROM TABLE(redis_scan('127.0.0.1', ${srv.port}, 'tvf:*'))")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("tvf:1"))
  }
}
