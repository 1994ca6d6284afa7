package graft

import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming specs: drive the streaming twins of the batch event
  * queries from the parquet fixture through a memory sink and reconcile with
  * the batch results. */
class StreamingSpec extends SparkSpec {

  test("streaming daily rollup matches batch daily rollup counts") {
    val src = streaming.EventStreams.source(spark, sfDir)
    val q = streaming.EventStreams.dailyRollup(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("daily_out")
      .select("day", "event_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = operators.Events.q_events_daily(spark, sfDir)
      .select("day", "event_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("topic stream decode reconciles with the batch topic table") {
    val q = sources.EventTopic.stream(spark, sfDir)
      .writeStream.outputMode("append")
      .format("memory").queryName("topic_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("topic_out")
    val batch = sources.EventTopic.decoded(spark, sfDir)
    assert(streamed.count() == batch.count())
    // decode is lossless on both paths: same per-partition event_id checksums
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("_partition_id").sum("event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(streamed) == sums(batch))
  }

  test("streaming sessionization produces bounded per-user sessions") {
    val src = streaming.EventStreams.source(spark, sfDir)
    val q = streaming.EventStreams.sessionize(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val sessions = spark.table("sess_out")
    val perUser = sessions.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // must cover every user in the batch view with >= 1 session
    val batchUsers = operators.Events.q_events_sessionize(spark, sfDir)
      .select("user_id", "n_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser.keySet == batchUsers.keySet)
    // session_window(30m) and the lag-based batch formulation agree exactly
    assert(perUser == batchUsers)
  }

  test("streaming exact dedup (dropDuplicates with watermark) matches batch distinct") {
    val src = streaming.EventStreams.source(spark, sfDir)
    val q = src.withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = operators.table(spark, sfDir, "events")
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stream-stream interval join matches the batch interval join") {
    val src = streaming.EventStreams.source(spark, sfDir)
    val q = streaming.EventStreams.viewToPurchase(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("vtp_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("vtp_out")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batchEvents = operators.table(spark, sfDir, "events")
    val batch = streaming.EventStreams.viewToPurchase(batchEvents)
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("mapGroupsWithState running totals converge to batch totals") {
    val src = streaming.EventStreams.source(spark, sfDir)
    val q = streaming.EventStreams.runningUserTotals(src)
      .toDF("user_id", "n", "total")
      .writeStream.outputMode("update")
      .format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    // update mode emits one row per key per micro-batch; counts are monotone,
    // so the final state per user is the max
    val streamed = spark.table("state_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = operators.table(spark, sfDir, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
