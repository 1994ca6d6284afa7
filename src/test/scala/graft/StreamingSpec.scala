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

  test("streaming MATCH_RECOGNIZE emits exactly the batch NFA's matches once sessions mature") {
    import org.apache.spark.sql.functions._
    import graft.plans.RowPattern
    // stage the fixture, then a far-future sentinel row as a SECOND file so
    // the watermark advances across micro-batches and every session matures
    val tmp = java.nio.file.Files.createTempDirectory("cep").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/aa_events.parquet"))
    val maxTsMicros = operators.table(spark, sfDir, "events")
      .agg(max(expr("unix_micros(ts)"))).collect()(0).getLong(0)
    val sentinelMicros = maxTsMicros + 6L * 3600 * 1000 * 1000
    // sentinel must carry the fixture's physical ts type so both files
    // stream under one declared schema
    val tsType = streaming.EventStreams
      .fileSchemaFor(spark, s"$sfDir/events.parquet")("ts").dataType
    val sentinelTs: Any = tsType match {
      case org.apache.spark.sql.types.LongType => sentinelMicros * 1000L // nanos
      case _ => java.time.LocalDateTime.ofEpochSecond(
        sentinelMicros / 1000000L, ((sentinelMicros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    }
    spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(-1L, sentinelTs, -1L, "view", 0.0, "{}")),
        streaming.EventStreams.fileSchema(tsType))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/zz_sentinel")
    // flatten the sentinel into the watched dir as a later file
    val part = new java.io.File(s"$tmp/zz_sentinel").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/zz_sentinel.parquet"))

    val define: Map[String, RowPattern.Predicate] = Map(
      "V" -> ((part, i) => part(i).getString(2) == "view"),
      "P" -> ((part, i) => part(i).getString(2) == "purchase"))
    val src = streaming.EventStreams.normalizeTs(
      spark.readStream
        .schema(streaming.EventStreams.fileSchemaFor(spark, s"$sfDir/events.parquet"))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(tmp.toString))
    val q = streaming.EventStreams.matchRecognizeStream(src, "V+ P", define, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cep_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // batch twin: same gap sessionization + the SAME Matcher, driver-side
    val matcher = new RowPattern.Matcher(RowPattern.parse("V+ P"), RowPattern.liftAll(define))
    val rows = operators.table(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val gapMs = 30 * 60000L
    val expected = rows.groupBy(_._1).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3)).toList
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.last._2 <= gapMs => (cur :+ e) :: rest
          case _ => List(e) :: acc
        }
      }
      sessions.flatMap { sess =>
        val part = sess.map(e => org.apache.spark.sql.Row(e._3, e._2, e._4, e._5)).toIndexedSeq
        matcher.findAll(part).map { m =>
          (user, sess(m.start)._3, sess(m.end - 1)._3, m.end - m.start)
        }
      }
    }.toSet
    assert(expected.nonEmpty, "batch twin found no matches — fixture/pattern mismatch")
    assert(streamed == expected)
  }
}
