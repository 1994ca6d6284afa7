package graft

/** graft.catalog.HttpCatalog: metadata fetch, one-split-per-source reads,
  * typed CSV decode, loud failures (reference plugin/trino-example-http
  * semantics). */
class HttpCatalogSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val handle = {
    val h = server.StaticContentServer.start(Map(
      "/a.csv" -> "1,alpha,2024-01-05\n2,beta,2024-02-06",
      "/b.csv" -> "3,gamma,2024-03-07",
      "/empty.csv" -> "",
      "/bad.csv" -> "1,only-two"))
    h.server.createContext("/meta.json", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val base = s"http://127.0.0.1:${ex.getLocalAddress.getPort}"
        val body =
          s"""{"s": [
             |  {"name": "t", "columns": [
             |     {"name": "k", "type": "bigint"},
             |     {"name": "v", "type": "varchar"},
             |     {"name": "d", "type": "date"}],
             |   "sources": ["$base/a.csv", "$base/b.csv", "$base/empty.csv"]},
             |  {"name": "bad", "columns": [
             |     {"name": "k", "type": "bigint"},
             |     {"name": "a", "type": "varchar"},
             |     {"name": "b", "type": "varchar"}],
             |   "sources": ["$base/bad.csv"]}
             |]}""".stripMargin.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    h
  }
  private def metaUri = s"${handle.uri}/meta.json"

  override def afterAll(): Unit = handle.stop()

  test("reads all sources as splits; types decode; empty source is fine") {
    val df = catalog.HttpCatalog.readTable(spark, metaUri, "s", "t")
    assert(df.rdd.getNumPartitions == 3) // one split per source URI
    val rows = df.orderBy("k").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(rows(2).getDate(2) == java.sql.Date.valueOf("2024-03-07"))
  }

  test("listTables and unknown schema/table fail loudly") {
    assert(catalog.HttpCatalog.listTables(metaUri, "s") == Seq("bad", "t"))
    intercept[IllegalArgumentException] {
      catalog.HttpCatalog.listTables(metaUri, "nope")
    }
    intercept[IllegalArgumentException] {
      catalog.HttpCatalog.readTable(spark, metaUri, "s", "missing")
    }
  }

  test("arity mismatch in a line names the line and the URI") {
    val e = intercept[org.apache.spark.SparkException] {
      catalog.HttpCatalog.readTable(spark, metaUri, "s", "bad").collect()
    }
    val msg = String.valueOf(e.getMessage) + String.valueOf(e.getCause)
    assert(msg.contains("only-two") || msg.contains("2 fields"))
  }

  test("a 404 source fails loudly, not silently empty") {
    val h2 = server.StaticContentServer.start(Map.empty)
    try {
      intercept[Exception] {
        catalog.HttpCatalog.metadata(s"${h2.uri}/absent.json")
      }
    } finally h2.stop()
  }
}
