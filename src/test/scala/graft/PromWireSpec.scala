package graft

import org.apache.spark.sql.functions._

import graft.sources.PromWire

/** Prometheus HTTP API: selector matching, range evaluation with the
  * staleness lookback, time-chunk splits covering every step exactly once,
  * and the (labels, ts, value) Spark row shape (reference
  * plugin/trino-prometheus). */
class PromWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val srv = new PromWire.Server()
  override def afterAll(): Unit = srv.close()

  private val base = 1700000000L
  srv.addSeries(PromWire.Series("http_requests",
    Map("job" -> "api", "instance" -> "a"),
    (0 until 30).map(i => (base + i * 15L, i.toDouble)).toVector))
  srv.addSeries(PromWire.Series("http_requests",
    Map("job" -> "api", "instance" -> "b"),
    (0 until 30).map(i => (base + i * 15L, i * 2.0)).toVector))
  srv.addSeries(PromWire.Series("http_requests",
    Map("job" -> "web", "instance" -> "c"),
    Vector((base, 100.0))))

  test("selector with label matchers narrows series server-side") {
    val c = new PromWire.Client("127.0.0.1", srv.port)
    val all = c.queryRange("http_requests", base, base + 435L, 15L)
    assert(all.size == 3)
    val api = c.queryRange("""http_requests{job="api"}""", base, base + 435L, 15L)
    assert(api.size == 2)
    val one = c.queryRange("""http_requests{job="api",instance="b"}""",
      base, base + 435L, 15L)
    assert(one.size == 1)
    assert(one.head._2.size == 30) // step == sample spacing → exact grid back
    assert(one.head._2.last == (base + 29 * 15L, 58.0))
  }

  test("staleness: samples older than the 5m lookback are not carried") {
    val c = new PromWire.Client("127.0.0.1", srv.port)
    // the web/c series has one sample at `base`; 4m later it still answers,
    // 6m later it is stale
    val in = c.queryRange("""http_requests{job="web"}""", base + 240L, base + 240L, 15L)
    assert(in.size == 1 && in.head._2 == Seq((base + 240L, 100.0)))
    val out = c.queryRange("""http_requests{job="web"}""", base + 360L, base + 360L, 15L)
    assert(out.isEmpty)
  }

  test("spark read: time chunks partition the window, rows decode") {
    val df = PromWire.read(spark, "127.0.0.1", srv.port,
      """http_requests{job="api"}""", base, base + 29 * 15L, 15L, chunks = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 60) // 2 series × 30 steps, no duplicate chunk edges
    val b29 = df.filter(col("labels").getItem("instance") === "b" &&
      col("ts") === (base + 29 * 15L)).collect()
    assert(b29.length == 1 && b29.head.getAs[Double]("value") == 58.0)
  }

  test("prom_query_range TVF from SQL text") {
    val df = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT ts, value FROM TABLE(prom_query_range('127.0.0.1', ${srv.port},
          'http_requests{job="web"}', $base, $base, 15)) ORDER BY ts""")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getDouble(1) == 100.0)
  }
}
