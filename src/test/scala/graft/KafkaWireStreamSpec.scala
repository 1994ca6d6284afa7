package graft

import org.apache.spark.sql.functions._

import graft.sources.{KafkaWire, KafkaWireProvider}
import graft.sources.KafkaWire.Msg

/** Micro-batch streaming over the Kafka wire: offsets advance with the
  * broker's log-end watermarks, appends surface in later batches exactly
  * once, and the batch read of the same table reconciles. */
class KafkaWireStreamSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private def msg(k: String, v: String, ts: Long): Msg =
    Msg(k.getBytes("UTF-8"), v.getBytes("UTF-8"), ts)

  private lazy val topic = {
    val t = new KafkaWire.Topic(2)
    (0 until 10).foreach(i => t.append(i % 2, msg(s"k$i", s"v$i", 1000L + i)))
    t
  }
  private lazy val broker = KafkaWire.serveTopics(Map("live" -> topic))

  override def afterAll(): Unit = broker.stop()

  test("micro-batches deliver appends exactly once with per-partition offsets") {
    val df = spark.readStream.format(classOf[KafkaWireProvider].getName)
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("topic", "live")
      .load()
    val q = df.writeStream.format("memory").queryName("kw_stream")
      .option("checkpointLocation",
        s"/tmp/graft_kw_ckpt_${System.nanoTime()}").start()
    try {
      q.processAllAvailable()
      // initialOffset starts at 0 → the first batch carries the backlog
      assert(spark.table("kw_stream").count() == 10)
      topic.append(0, msg("k10", "v10", 2000L))
      topic.append(1, msg("k11", "v11", 2001L), msg("k12", "v12", 2002L))
      q.processAllAvailable()
      val rows = spark.table("kw_stream")
      assert(rows.count() == 13)
      // exactly-once: no duplicate (partition, offset) pairs
      assert(rows.select(col("_partition_id"), col("_partition_offset"))
        .distinct().count() == 13)
      // offsets are the log sequence per partition
      val perPart = rows.groupBy(col("_partition_id"))
        .agg(max(col("_partition_offset")).as("hi"), count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(perPart(0) == (5L, 6L) && perPart(1) == (6L, 7L))
      // values and timestamps survive
      val v11 = rows.filter(col("_key") === "k11").collect().head
      assert(v11.getAs[String]("_message") == "v11")
      assert(v11.getAs[java.sql.Timestamp]("_timestamp").getTime == 2001L)
    } finally q.stop()
  }

  test("batch read over the same provider sees the full current log") {
    val df = spark.read.format(classOf[KafkaWireProvider].getName)
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("topic", "live")
      .load()
    assert(df.count() == topic.log(0).size + topic.log(1).size)
    assert(df.rdd.getNumPartitions == 2, "one split per topic partition")
  }
}
