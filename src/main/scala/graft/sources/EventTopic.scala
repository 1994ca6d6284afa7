package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-style topic-as-table (reference: plugin/trino-kafka — a topic scanned
  * as a table with internal columns `_partition_id`, `_partition_offset`,
  * `_key`, `_message`, `_timestamp` and a declared message decoder,
  * plugin/trino-kafka/src/main/java/io/trino/plugin/kafka/KafkaInternalFieldManager.java,
  * encoder/json decoders under kafka/encoder/).
  *
  * The fixture events table plays the broker log: rows are keyed into
  * `partitions` hash partitions (the topic's partition count), offsets are the
  * contiguous per-partition log sequence, and the payload is a JSON-encoded
  * message. `decoded` applies the DECLARED message schema through from_json —
  * the json row decoder analog — so the relational view is (internal columns ⊕
  * decoded fields), exactly the reference connector's table shape.
  *
  * `stream` is the same shape over an unbounded source (Structured Streaming;
  * per-partition offsets surrogate to the monotone event_id — a log sequence
  * number assigned at ingest, since row_number over an unbounded stream is not
  * defined). Batch and stream share the encoder/decoder, so they reconcile.
  */
object EventTopic {

  val partitions = 8

  val messageSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def encode(e: DataFrame): DataFrame =
    e.select(
      (col("user_id") % partitions).as("_partition_id"),
      col("event_id").cast("string").as("_key"),
      to_json(struct(
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))).as("_message"),
      col("ts").as("_timestamp"),
      col("event_id").as("_log_seq"))

  /** The raw topic table: internal columns only, offsets contiguous per
    * partition (the batch scan of the broker log). */
  def raw(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("_partition_id")).orderBy(col("_log_seq"))
    encode(Tables.load(spark, dir, "events"))
      .withColumn("_partition_offset", row_number().over(w).cast("long"))
      .drop("_log_seq")
  }

  /** Decoded view: internal columns ⊕ declared-schema message fields. */
  def decoded(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir)
      .withColumn("m", from_json(col("_message"), messageSchema))
      .select(col("_partition_id"), col("_partition_offset"), col("_key"),
        col("_timestamp"), col("m.*"))

  /** Unbounded twin over the streaming source (offset = ingest log sequence). */
  def stream(spark: SparkSession, dir: String): DataFrame =
    encode(graft.streaming.EventStreams.source(spark, dir))
      .withColumnRenamed("_log_seq", "_partition_offset")
      .withColumn("m", from_json(col("_message"), messageSchema))
      .select(col("_partition_id"), col("_partition_offset"), col("_key"),
        col("_timestamp"), col("m.*"))
}
