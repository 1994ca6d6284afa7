package graft

import org.apache.spark.sql.functions._

import graft.sources.KafkaWire

/** Kafka INSERT surface (reference plugin/trino-kafka
  * KafkaPageSinkProvider): the DSv2 write path produces rows to the wire
  * broker — keyed routing, explicit partition override, timestamps,
  * at-least-once append — proven by reading the same topic back over the
  * wire. */
class KafkaWireWriteSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val broker = KafkaWire.serveTopics(Map(
    "sink" -> new KafkaWire.Topic(3),
    "keyed" -> new KafkaWire.Topic(4)))
  override def afterAll(): Unit = broker.stop()

  private def writeDf(df: org.apache.spark.sql.DataFrame, topic: String): Unit =
    df.write.format(classOf[graft.sources.KafkaWireProvider].getName)
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("topic", topic)
      .mode("append").save()

  private def readBack(topic: String) =
    KafkaWire.read(spark, "127.0.0.1", broker.port, topic)

  test("write-then-read roundtrip with explicit partitions and timestamps") {
    val rows = (1 to 120).toDF("i").select(
      $"i".cast("string").as("key"),
      concat(lit("v-"), $"i").as("value"),
      ($"i" % 3).cast("int").as("partition"),
      (lit(1700000000000L) + $"i").as("timestamp"))
    writeDf(rows, "sink")
    val back = readBack("sink")
    assert(back.count() == 120)
    // explicit routing honored exactly
    val parts = back.select($"_partition_id", $"_key").collect()
    assert(parts.forall(r =>
      r.getAs[Int](0).toLong == r.getAs[String](1).toLong % 3))
    // payloads and timestamps survive
    val r7 = back.filter($"_key" === "7").collect().head
    assert(r7.getAs[String]("_message") == "v-7")
    assert(r7.getAs[java.sql.Timestamp]("_timestamp").getTime == 1700000000007L)
    // offsets are contiguous per partition (broker append ordering)
    val offs = back.groupBy($"_partition_id")
      .agg(count(lit(1)).as("n"), max($"_partition_offset").as("mx"))
      .collect()
    assert(offs.forall(r => r.getAs[Long]("mx") == r.getAs[Long]("n") - 1))
  }

  test("keyed routing: one key always lands on one partition") {
    val rows = (1 to 200).toDF("i").select(
      concat(lit("user-"), ($"i" % 10).cast("string")).as("key"),
      $"i".cast("string").as("value"))
    writeDf(rows, "keyed")
    val perKey = readBack("keyed")
      .groupBy($"_key").agg(countDistinct($"_partition_id").as("nparts"),
        count(lit(1)).as("n"))
      .collect()
    assert(perKey.length == 10)
    assert(perKey.forall(_.getAs[Long]("nparts") == 1L), "key split across partitions")
    assert(perKey.map(_.getAs[Long]("n")).sum == 200L)
  }

  test("streaming sink: writeStream produces each micro-batch to the broker") {
    val src = new KafkaWire.Topic(2)
    (0 until 6).foreach(i => src.append(i % 2, KafkaWire.Msg(
      s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), 1000L + i)))
    val srcBroker = KafkaWire.serveTopics(
      Map("in" -> src, "out" -> new KafkaWire.Topic(2)))
    try {
      // wire topic → transform → wire topic, all over Produce/Fetch
      val q = spark.readStream.format(classOf[graft.sources.KafkaWireProvider].getName)
        .option("host", "127.0.0.1").option("port", srcBroker.port.toString)
        .option("topic", "in").load()
        .select($"_key".as("key"), upper($"_message").as("value"))
        .writeStream.format(classOf[graft.sources.KafkaWireProvider].getName)
        .option("host", "127.0.0.1").option("port", srcBroker.port.toString)
        .option("topic", "out")
        .option("checkpointLocation", s"/tmp/graft_kwsink_${System.nanoTime()}")
        .start()
      try {
        q.processAllAvailable()
        val out = KafkaWire.read(spark, "127.0.0.1", srcBroker.port, "out")
        assert(out.count() == 6)
        assert(out.filter($"_key" === "k3").collect().head
          .getAs[String]("_message") == "V3")
        // appends flow through subsequent micro-batches
        src.append(0, KafkaWire.Msg("k9".getBytes("UTF-8"),
          "v9".getBytes("UTF-8"), 2000L))
        q.processAllAvailable()
        assert(KafkaWire.read(spark, "127.0.0.1", srcBroker.port, "out")
          .count() == 7)
      } finally q.stop()
    } finally srcBroker.stop()
  }

  test("invalid write schemas are rejected loudly") {
    val noValue = Seq(("k", 1)).toDF("key", "nope")
    val e = intercept[Exception](writeDf(noValue, "sink"))
    assert(e.getMessage.contains("value") || e.getMessage.contains("unsupported"),
      e.getMessage)
  }
}
