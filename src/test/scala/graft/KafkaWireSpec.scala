package graft

import org.apache.spark.sql.functions._

import graft.sources.KafkaWire
import graft.sources.KafkaWire.Msg

/** Kafka wire protocol: message-set codec (CRC, null keys, partial
  * trailing message), Metadata/Fetch round trips against the loopback
  * broker, paged draining under a tiny max_bytes, error codes, and the
  * distributed Spark read matching the served log. */
class KafkaWireSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private def msg(k: String, v: String, ts: Long = 1000L): Msg =
    Msg(if (k == null) null else k.getBytes("UTF-8"), v.getBytes("UTF-8"), ts)

  private val logs: Map[String, IndexedSeq[IndexedSeq[Msg]]] = Map(
    "t" -> IndexedSeq(
      (0 until 100).map(i => msg(s"k$i", s"""{"i":$i}""", 1000L + i)),
      (0 until 7).map(i => msg(null, s"p1-$i", 2000L + i))))

  private lazy val broker = KafkaWire.serve(logs)

  override def afterAll(): Unit = broker.stop()

  test("message set round-trips with CRC validation; corruption is loud") {
    val set = KafkaWire.encodeMessageSet(
      Seq(msg("a", "hello"), msg(null, "world", 42L)), baseOffset = 5L)
    val decoded = KafkaWire.decodeMessageSet(set)
    assert(decoded.map(_._1) == Seq(5L, 6L))
    assert(new String(decoded.head._2.value, "UTF-8") == "hello")
    assert(decoded(1)._2.key == null && decoded(1)._2.timestamp == 42L)
    // flip a payload byte → CRC must catch it
    val corrupt = set.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](KafkaWire.decodeMessageSet(corrupt))
    // a truncated trailing message is silently dropped (v0 broker contract)
    val truncated = java.util.Arrays.copyOf(set, set.length - 3)
    assert(KafkaWire.decodeMessageSet(truncated).map(_._1) == Seq(5L))
  }

  test("metadata reports brokers and partition leaders") {
    val c = new KafkaWire.Client("127.0.0.1", broker.port)
    try assert(c.partitionCount("t") == 2)
    finally c.close()
  }

  test("fetch pages a partition to the high watermark under small max_bytes") {
    val c = new KafkaWire.Client("127.0.0.1", broker.port)
    try {
      val (hw, first) = c.fetch("t", 0, 0L, maxBytes = 200)
      assert(hw == 100L)
      assert(first.nonEmpty && first.size < 100, s"got ${first.size}")
      // paged drain sees every message exactly once, in order
      val all = c.drain("t", 0, 0L, maxBytes = 200)
      assert(all.map(_._1) == (0L until 100L))
      assert(new String(all(37)._2.value, "UTF-8") == """{"i":37}""")
      assert(all(37)._2.timestamp == 1037L)
      // resume mid-log
      assert(c.drain("t", 0, 95L).map(_._1) == (95L until 100L))
      // the 7-message partition, null keys intact
      val p1 = c.drain("t", 1)
      assert(p1.size == 7 && p1.forall(_._2.key == null))
    } finally c.close()
  }

  test("unknown topics and out-of-range offsets answer kafka error codes") {
    val c = new KafkaWire.Client("127.0.0.1", broker.port)
    try {
      val e1 = intercept[IllegalArgumentException](c.fetch("nope", 0, 0L))
      assert(e1.getMessage.contains("error 3")) // UNKNOWN_TOPIC_OR_PARTITION
      val e2 = intercept[IllegalArgumentException](c.fetch("t", 0, 500L))
      assert(e2.getMessage.contains("error 1")) // OFFSET_OUT_OF_RANGE
    } finally c.close()
  }

  test("kafka_topic TVF reaches the wire client from SQL text") {
    val df = sqlx.TrinoDialect.sql(spark, sfDir,
      s"""SELECT _partition_id, count(*) AS n
          FROM TABLE(kafka_topic('127.0.0.1', ${broker.port}, 't'))
          GROUP BY _partition_id ORDER BY _partition_id""")
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 100L), (1, 7L)))
  }

  test("distributed spark read drains every partition over the wire") {
    val df = KafkaWire.read(spark, "127.0.0.1", broker.port, "t")
    assert(df.count() == 107)
    assert(df.rdd.getNumPartitions == 2, "one split per topic partition")
    val perPart = df.groupBy(col("_partition_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perPart == Map(0 -> 100L, 1 -> 7L))
    // offsets contiguous from 0 per partition; keys/values/timestamps intact
    val checks = df.groupBy(col("_partition_id"))
      .agg(min(col("_partition_offset")).as("lo"),
        max(col("_partition_offset")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    checks.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L &&
        r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    val row37 = df.filter(col("_partition_id") === 0 &&
        col("_partition_offset") === 37)
      .collect().head
    assert(row37.getAs[String]("_key") == "k37")
    assert(row37.getAs[String]("_message") == """{"i":37}""")
  }
}
