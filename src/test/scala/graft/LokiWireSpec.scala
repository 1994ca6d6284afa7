package graft

import org.apache.spark.sql.functions._

import graft.sources.LokiWire

/** Loki HTTP API: LogQL selector + line-filter evaluation, streams
  * responses, and time-chunk splits covering every entry exactly once
  * (reference plugin/trino-loki). */
class LokiWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new LokiWire.Server()
  override def afterAll(): Unit = srv.close()

  private val base = 1700000000000000000L // epoch nanos
  srv.addStream(LokiWire.Stream(Map("app" -> "api", "env" -> "prod"),
    (0 until 50).map(i => (base + i * 1000000000L,
      s"req id=$i status=${if (i % 5 == 0) 500 else 200}")).toVector))
  srv.addStream(LokiWire.Stream(Map("app" -> "api", "env" -> "dev"),
    (0 until 20).map(i => (base + i * 1000000000L, s"dev line $i")).toVector))
  srv.addStream(LokiWire.Stream(Map("app" -> "web"),
    Vector((base, "web boot"))))

  test("stream selector narrows by labels; line filters evaluate server-side") {
    val c = new LokiWire.Client("127.0.0.1", srv.port)
    val all = c.queryRange("""{app="api"}""", base, base + 60 * 1000000000L)
    assert(all.size == 2)
    val errors = c.queryRange("""{app="api",env="prod"} |= "status=500"""",
      base, base + 60 * 1000000000L)
    assert(errors.size == 1)
    assert(errors.head._2.size == 10)
    val notErrors = c.queryRange("""{app="api",env="prod"} != "status=500"""",
      base, base + 60 * 1000000000L)
    assert(notErrors.head._2.size == 40)
  }

  test("range bounds are [start, end) in nanoseconds") {
    val c = new LokiWire.Client("127.0.0.1", srv.port)
    val one = c.queryRange("""{app="api",env="dev"}""", base, base + 1L)
    assert(one.head._2 == Seq((base, "dev line 0")))
  }

  test("spark read: time chunks partition the window exactly once") {
    val df = LokiWire.read(spark, "127.0.0.1", srv.port,
      """{app="api"}""", base, base + 60 * 1000000000L, chunks = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 70) // 50 prod + 20 dev, no chunk-edge duplicates
    val r = df.filter(col("labels").getItem("env") === "dev" && col("ts") === base)
      .collect()
    assert(r.length == 1 && r.head.getAs[String]("line") == "dev line 0")
  }

  test("loki_query_range TVF from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT line FROM TABLE(loki_query_range('127.0.0.1', ${srv.port},
          '{app="web"}', $base, ${base + 1000L})) ORDER BY line""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("web boot"))
  }
}
