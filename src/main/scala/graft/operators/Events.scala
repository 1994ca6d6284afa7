package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch side of SURVEY.md §2.12).
  *
  * The reference has no streaming runtime — Kafka topics are scanned as tables
  * (plugin/trino-kafka). These queries are the batch formulations; the same
  * logic is exposed for Structured Streaming in graft.streaming.EventStreams
  * (sessionize = gap-based session_window, daily rollup = tumbling window).
  *
  * Scale: sessionization is a window over (user_id) — shuffles once by user and
  * sorts within partition; no driver-side state. JSON extraction is a codegen'd
  * path expression, not a UDF.
  */
object Events {

  /** Gap-based sessionization (30-min inactivity) via lag + running sum —
    * the classic batch formulation of session windows. */
  def q_events_sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_session",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(run))
      .groupBy($"user_id")
      .agg(
        max($"session_id").as("n_sessions"),
        count(lit(1)).as("n_events"),
        asDouble(sum(dec($"value"))).as("total_value"))
      .orderBy($"user_id")
  }
  val qEventsSessionizeSql: String =
    """WITH g AS (
         SELECT user_id, value, epoch_us(ts) AS us,
           lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         FROM events),
       sess AS (
         SELECT user_id, value,
           CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
         FROM g)
       SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
       FROM sess GROUP BY user_id ORDER BY user_id"""

  /** Tumbling daily rollup (batch form of a streaming windowed aggregation). */
  def q_events_daily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "events")
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"user_id").as("users"),
        asDouble(sum(dec($"value"))).as("total_value"))
      .orderBy($"day", $"event_type")
  }
  val qEventsDailySql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n, count(DISTINCT user_id) AS users,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2 ORDER BY day, event_type"""

  /** JSON property extraction + aggregation (reference: JsonFunctions.java:54,
    * JsonExtract.java — json_extract_scalar ≈ get_json_object). */
  def q_events_json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        asDouble(sum(dec($"value"))).as("total_value"))
      .orderBy($"k_bucket")
  }
  val qEventsJsonSql: String =
    """SELECT k % 10 AS k_bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
       FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value FROM events)
       GROUP BY 1 ORDER BY k_bucket"""

  /** Funnel-ish conditional aggregation per user (FILTER / CASE pivot). */
  def q_events_pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        count(when($"event_type" === "view", 1)).as("views"),
        count(when($"event_type" === "click", 1)).as("clicks"),
        count(when($"event_type" === "purchase", 1)).as("purchases"),
        asDouble(sum(when($"event_type" === "purchase", dec($"value")).otherwise(lit(0).cast("decimal(12,2)")))).as("purchase_value"))
      .orderBy($"user_id")
  }
  val qEventsPivotSql: String =
    """SELECT user_id,
       count(*) FILTER (WHERE event_type = 'view') AS views,
       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Kafka-style topic-as-table decode (graft.sources.EventTopic; reference
    * plugin/trino-kafka internal columns + json message decoder): the events
    * "broker log" scanned as (internal columns ⊕ decoded fields). Verified:
    * per-partition row counts, exact decoded value sums (encode → decode is
    * lossless), and offset contiguity (max(_partition_offset) = rows in the
    * partition). */
  def q_topic_decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.EventTopic.decoded(s, dir)
      .groupBy($"_partition_id")
      .agg(
        count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"),
        countDistinct($"user_id").as("n_users"),
        (max($"_partition_offset") === count(lit(1))).as("offsets_contiguous"))
      .select($"_partition_id".as("partition_id"), $"n", $"sum_value",
        $"n_users", $"offsets_contiguous")
      .orderBy($"partition_id")
  }
  val qTopicDecodeSql: String =
    """SELECT user_id % 8 AS partition_id, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users,
       TRUE AS offsets_contiguous
       FROM events GROUP BY user_id % 8 ORDER BY partition_id"""

  /** One loopback wire broker per fixture dir (JVM lifetime; daemon
    * threads). The log build collects the events fixture ONCE — fixture
    * building bounded by the sf table, standing in for the broker's own
    * log; a real deployment has the log already. */
  private val wireBrokers =
    scala.collection.mutable.Map[String, graft.sources.KafkaWire.Handle]()
  private def ensureWireBroker(s: SparkSession, dir: String): Int = synchronized {
    wireBrokers.getOrElseUpdate(dir, {
      import graft.sources.KafkaWire
      import KafkaWire.Msg
      val raw = graft.sources.EventTopic.raw(s, dir).collect()
      val byPart = (0 until graft.sources.EventTopic.partitions).map { p =>
        raw.filter(_.getAs[Long]("_partition_id") == p.toLong)
          .sortBy(_.getAs[Long]("_partition_offset"))
          .map(r => Msg(
            r.getAs[String]("_key").getBytes("UTF-8"),
            r.getAs[String]("_message").getBytes("UTF-8"),
            r.getAs[java.sql.Timestamp]("_timestamp").getTime))
          .toIndexedSeq
      }
      val events = new KafkaWire.Topic(byPart.size)
      byPart.indices.foreach(p => events.append(p, byPart(p): _*))
      // `ingest` starts EMPTY: the INSERT surface's target (q_topic_write)
      KafkaWire.serveTopics(Map("events" -> events,
        "ingest" -> new KafkaWire.Topic(4)))
    }).port
  }

  /** One write per JVM per fixture dir (the broker log is append-only, so
    * repeated query invocations must not re-produce). */
  private val ingestWritten = scala.collection.mutable.Set[String]()
  private def ensureIngestWritten(s: SparkSession, dir: String, port: Int): Unit =
    synchronized {
      if (!ingestWritten.contains(dir)) {
        import s.implicits._
        // encode orders rows as JSON values, partitioned EXPLICITLY by
        // o_orderkey % 4 so the oracle can replay the routing exactly
        table(s, dir, "orders")
          .filter($"o_orderkey" <= 2000L)
          .select(
            $"o_orderkey".cast("string").as("key"),
            to_json(struct($"o_orderkey", $"o_orderstatus", $"o_totalprice"))
              .as("value"),
            ($"o_orderkey" % 4).cast("int").as("partition"))
          .write.format(classOf[graft.sources.KafkaWireProvider].getName)
          .option("host", "127.0.0.1").option("port", port.toString)
          .option("topic", "ingest")
          .mode("append").save()
        ingestWritten += dir
      }
    }

  /** Kafka INSERT surface over Produce v0 (reference plugin/trino-kafka
    * KafkaPageSinkProvider): orders rows are JSON-encoded and PRODUCED to
    * the wire broker's `ingest` topic by executor tasks (each with its own
    * connection, keyed routing), then read back over the same wire and
    * decoded — the write is proven by the read's oracle equality. */
  def q_topic_write(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureWireBroker(s, dir)
    ensureIngestWritten(s, dir, port)
    val decoded = graft.sources.KafkaWire.read(s, "127.0.0.1", port, "ingest")
      .withColumn("m", from_json($"_message",
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")))
      .select($"_partition_id", $"m.*")
    decoded
      .groupBy($"_partition_id")
      .agg(count(lit(1)).as("n"),
        countDistinct($"o_orderkey").as("n_orders"),
        asDouble(sum(dec($"o_totalprice"))).as("total"),
        max($"o_orderstatus").as("max_status"))
      .select($"_partition_id".cast("long").as("partition_id"),
        $"n", $"n_orders", $"total", $"max_status")
      .orderBy($"partition_id")
  }
  val qTopicWriteSql: String =
    """SELECT o_orderkey % 4 AS partition_id, count(*) AS n,
       count(DISTINCT o_orderkey) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
       max(o_orderstatus) AS max_status
       FROM orders WHERE o_orderkey <= 2000
       GROUP BY o_orderkey % 4 ORDER BY partition_id"""

  /** Same topic shape as [[q_topic_decode]], but consumed over the KAFKA
    * WIRE PROTOCOL (graft.sources.KafkaWire; reference plugin/trino-kafka
    * real-broker consumption): driver Metadata for split enumeration,
    * one executor connection per partition draining Fetch v0 message
    * sets (CRC-validated), then the declared JSON decode. Wire offsets
    * are 0-based, proving the log sequence survives the round trip. */
  def q_topic_wire(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureWireBroker(s, dir)
    graft.sources.KafkaWire.read(s, "127.0.0.1", port, "events")
      .withColumn("m", from_json($"_message", graft.sources.EventTopic.messageSchema))
      .select($"_partition_id", $"_partition_offset", $"m.*")
      .groupBy($"_partition_id")
      .agg(
        count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"),
        countDistinct($"user_id").as("n_users"),
        (max($"_partition_offset") === count(lit(1)) - 1).as("offsets_contiguous"))
      .select($"_partition_id".cast("long").as("partition_id"), $"n",
        $"sum_value", $"n_users", $"offsets_contiguous")
      .orderBy($"partition_id")
  }
  val qTopicWireSql: String =
    """SELECT user_id % 8 AS partition_id, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users,
       TRUE AS offsets_contiguous
       FROM events GROUP BY user_id % 8 ORDER BY partition_id"""

  val queries: Map[String, Q] = Map(
    "q_topic_decode" -> q_topic_decode _,
    "q_topic_wire" -> q_topic_wire _,
    "q_topic_write" -> q_topic_write _,
    "q_events_sessionize" -> q_events_sessionize _,
    "q_events_daily" -> q_events_daily _,
    "q_events_json" -> q_events_json _,
    "q_events_pivot" -> q_events_pivot _)

  val oracles: Map[String, String] = Map(
    "q_topic_decode" -> qTopicDecodeSql,
    "q_topic_wire" -> qTopicWireSql,
    "q_topic_write" -> qTopicWriteSql,
    "q_events_sessionize" -> qEventsSessionizeSql,
    "q_events_daily" -> qEventsDailySql,
    "q_events_json" -> qEventsJsonSql,
    "q_events_pivot" -> qEventsPivotSql)
}
