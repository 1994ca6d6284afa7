package graft

/** The spooled result protocol: X-Trino-Query-Data-Encoding opts a query
  * into EncodedQueryData — small results ride as inline base64 segments,
  * larger ones spool to files the client fetches from segment URIs and
  * ACKs (reference client/trino-client spooling + spooling-filesystem).
  * Classic paged data keeps working for clients that don't opt in. */
class SpooledProtocolSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val handle = server.StatementServer.start(spark, sfDir)
  override def afterAll(): Unit = handle.stop()

  private val bigSql =
    // 2500 rows: three PageSize-1000 segments when spooled
    """SELECT CAST(l_orderkey AS BIGINT) AS k, CAST(l_partkey AS BIGINT) AS p
       FROM lineitem ORDER BY k, p, l_suppkey LIMIT 2500"""

  test("small result arrives as ONE inline segment") {
    val res = client.StatementClient.execute(handle.uri,
      "SELECT n_name FROM nation ORDER BY n_name", encoding = Some("json"))
    assert(res.rows.length == 25)
    assert(res.rows.head.head.toString.nonEmpty)
  }

  test("large result spools; reassembly matches the classic paged path") {
    val classic = client.StatementClient.execute(handle.uri, bigSql)
    assert(classic.rows.length == 2500)
    val spooled = client.StatementClient.execute(handle.uri, bigSql,
      encoding = Some("json"))
    assert(spooled.rows == classic.rows)
  }

  test("ACK releases the spooled segment: a re-fetch 404s") {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val http = HttpClient.newHttpClient()
    // drive the protocol by hand so we can hold a segment URI
    var resp = http.send(
      HttpRequest.newBuilder(java.net.URI.create(s"${handle.uri}/v1/statement"))
        .header("X-Trino-Query-Data-Encoding", "json")
        .POST(HttpRequest.BodyPublishers.ofString(bigSql)).build(),
      HttpResponse.BodyHandlers.ofString())
    var json = JsonMethods.parse(resp.body())
    var spins = 0
    while ((json \ "data") == JNothing && (json \ "error") == JNothing) {
      spins += 1; require(spins < 1200, "no data"); Thread.sleep(25)
      val JString(next) = (json \ "nextUri"): @unchecked
      resp = http.send(
        HttpRequest.newBuilder(java.net.URI.create(s"${handle.uri}$next")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      json = JsonMethods.parse(resp.body())
    }
    val JArray(segments) = ((json \ "data") \ "segments"): @unchecked
    assert(segments.length == 3) // 2500 rows / 1000-row segments
    val JString(uri) = (segments.head \ "uri"): @unchecked
    val JString(ack) = (segments.head \ "ackUri"): @unchecked
    def get(u: String) = http.send(
      HttpRequest.newBuilder(java.net.URI.create(s"${handle.uri}$u")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(get(uri).statusCode() == 200)
    assert(get(uri).statusCode() == 200) // fetch is repeatable until ACK
    get(ack)
    assert(get(uri).statusCode() == 404, "ACKed segment must be gone")
    // metadata carries offsets for ordered reassembly
    assert((segments(1) \ "metadata" \ "rowOffset") == JInt(1000))
  }
}
