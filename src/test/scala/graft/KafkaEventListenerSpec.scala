package graft

import java.nio.charset.StandardCharsets

import graft.sources.KafkaWire

/** Kafka event listener: query lifecycle events published over the wire
  * protocol's Produce API and read back through the same broker — the
  * reference pairing of plugin/trino-kafka-event-listener (producer) with
  * plugin/trino-kafka (consumer). */
class KafkaEventListenerSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val topic = new KafkaWire.Topic(2)
  private lazy val broker = KafkaWire.serveTopics(Map("query_events" -> topic))
  private lazy val handle = server.StatementServer.start(spark, sfDir)
  private lazy val listener = new server.EventListeners.KafkaEventListener(
    "127.0.0.1", broker.port, "query_events")

  override def afterAll(): Unit = {
    server.EventListeners.unregister(listener)
    handle.stop()
    broker.stop()
  }

  test("produce v0 round trip: append over the wire, fetch back") {
    val c = new KafkaWire.Client("127.0.0.1", broker.port)
    try {
      val base = c.produce("query_events", 0, Seq(
        KafkaWire.Msg("k1".getBytes, "v1".getBytes, 1000L),
        KafkaWire.Msg("k2".getBytes, "v2".getBytes, 2000L)))
      assert(base == 0L)
      val next = c.produce("query_events", 0, Seq(
        KafkaWire.Msg("k3".getBytes, "v3".getBytes, 3000L)))
      assert(next == 2L) // base offset advances past the first batch
      val (hw, msgs) = c.fetch("query_events", 0, 0L)
      assert(hw == 3L)
      assert(msgs.map(m => new String(m._2.value, StandardCharsets.UTF_8)) ==
        Seq("v1", "v2", "v3"))
    } finally c.close()
  }

  test("query lifecycle events land on the topic, keyed by query id") {
    val before = (0 until 2).map(p => topic.log(p).size).sum
    server.EventListeners.register(listener)
    try client.StatementClient.execute(handle.uri, "SELECT count(*) AS n FROM nation")
    finally server.EventListeners.unregister(listener)
    val events = (0 until 2).flatMap(p => topic.log(p).drop(
      if (p == 0) 0 else 0)).map(m =>
      (new String(m.key, StandardCharsets.UTF_8),
        new String(m.value, StandardCharsets.UTF_8)))
    val fresh = events.size - before
    assert(fresh == 2, s"expected created+completed, got $fresh new events")
    // both events carry the same query id key → same partition, ordered
    val byKey = events.groupBy(_._1).filter(_._2.size >= 2)
    assert(byKey.nonEmpty)
    val lifecycle = byKey.values.head.map(_._2)
    assert(lifecycle.exists(_.contains("\"state\":\"QUEUED\"")))
    assert(lifecycle.exists(_.contains("\"state\":\"FINISHED\"")))
  }

  test("events read back as a Spark table over the wire") {
    import org.apache.spark.sql.functions._
    val df = KafkaWire.read(spark, "127.0.0.1", broker.port, "query_events")
      .filter(col("_message").contains("\"state\":\"FINISHED\""))
    assert(df.count() >= 1)
  }
}
