package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Gate hook for [[StreamingResultsSpec]]: tail-partition rows block on
  * this latch until the spec releases them. Object-held so the UDF closure
  * serializes (a latch field on the suite would not). */
object StreamGate {
  @volatile var latch: CountDownLatch = _
  @volatile var threshold: Long = Long.MaxValue
  def pass(k: Long): Long = {
    if (k >= threshold) {
      val l = latch
      if (l != null) l.await(60, TimeUnit.SECONDS)
    }
    k
  }
}

/** The statement server streams result pages through its bounded buffer
  * instead of materializing the result (reference: server/protocol/
  * ExecutingStatementResource.java:69 pages from bounded output buffers).
  * Proof is deterministic, not timing-based: the query's TAIL partition is
  * blocked on a latch, and the FIRST data page must arrive while that
  * latch is still closed — impossible under a collect-then-page design. */
class StreamingResultsSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val handle = server.StatementServer.start(spark, sfDir)
  private lazy val http = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    // open the gate for any straggler tasks, then stop
    Option(StreamGate.latch).foreach(_.countDown())
    handle.stop()
  }

  test("first page is served while a tail partition is still computing") {
    // gate the top 150 keys (rank 1350 of 1500). Range partitioning into 5
    // puts partition boundaries near ranks 300/600/900/1200 (sampled, so
    // approximate): the gated keys live strictly in the LAST partition with
    // ~150 ranks of margin, and the first 1000 rows the producer pulls for
    // page 0 are all ungated.
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(keys.length == 1500, "fixture drift: expected 1500 orders")
    StreamGate.threshold = keys(1350)
    StreamGate.latch = new CountDownLatch(1)
    // nondeterministic so Catalyst cannot push the gate below the
    // repartition (a pushed-down gate would block the shuffle MAP stage
    // and nothing would stream regardless of the server design)
    spark.udf.register("spec_stream_gate",
      org.apache.spark.sql.functions.udf(StreamGate.pass _).asNondeterministic())
    // range-partitioned input as a temp view (SQL comment hints do not
    // survive the dialect grammar round-trip)
    spark.read.parquet(s"$sfDir/orders.parquet")
      .repartitionByRange(5, org.apache.spark.sql.functions.col("o_orderkey"))
      .createOrReplaceTempView("spec_stream_orders")

    val sql = "SELECT spec_stream_gate(o_orderkey) AS k FROM spec_stream_orders"
    var resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())
    var json = JsonMethods.parse(resp.body())
    var rows = 0
    var spins = 0
    var firstDataWhileGated = false
    var done = false
    while (!done) {
      (json \ "error" \ "message") match {
        case JString(m) => fail(s"statement failed: $m")
        case _ =>
      }
      val page = (json \ "data") match {
        case JArray(r) => r.length
        case _ => 0
      }
      if (page > 0 && rows == 0) {
        // THE streaming property: data flows while the tail is provably
        // still blocked (its rows cannot have been computed yet)
        firstDataWhileGated = StreamGate.latch.getCount == 1
        StreamGate.latch.countDown() // release the tail; finish the query
      }
      rows += page
      (json \ "nextUri") match {
        case JString(next) =>
          spins += 1
          assert(spins < 2400, "statement did not finish")
          if (page == 0) Thread.sleep(25)
          resp = http.send(
            HttpRequest.newBuilder(URI.create(s"${handle.uri}$next")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          json = JsonMethods.parse(resp.body())
        case _ => done = true
      }
    }
    assert(firstDataWhileGated,
      "first data page arrived only after the tail partition completed — " +
        "the server materialized the result instead of streaming it")
    assert(rows == 1500)
  }

  test("abandoned paging does not strand the producer: cancel frees it") {
    // a multi-page result the client stops paging; DELETE cancels it and
    // the buffer unblocks the producer (no worker thread pinned forever)
    val sql = "SELECT o_orderkey FROM orders"
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())
    val json = JsonMethods.parse(resp.body())
    val JString(id) = (json \ "id"): @unchecked
    // poll until running/streaming, then walk away and cancel
    Thread.sleep(200)
    val del = http.send(
      HttpRequest.newBuilder(
        URI.create(s"${handle.uri}/v1/statement/executing/$id/x/0"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(del.statusCode() == 204)
    // kill on the already-cancelled (or finished) statement reports false
    // eventually: terminal states are never re-cancelled
    Thread.sleep(200)
    assert(!server.QueryRegistry.kill(id))
  }
}
