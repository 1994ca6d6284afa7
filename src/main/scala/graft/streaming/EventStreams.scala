package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events schema (SURVEY.md §2.12).
  *
  * The reference has no streaming runtime (Kafka topics are scanned as tables,
  * plugin/trino-kafka) — this module is the extension track: the same logical
  * aggregations as graft.operators.Events, expressed over an unbounded source
  * with watermarks, so batch and streaming share semantics.
  *
  * Scale: stateful operators key by (user_id) / (window, event_type) — state is
  * partitioned by key across executors; watermark bounds state size. No
  * collect-based logic anywhere, so the same code runs on a real cluster
  * against Kafka/file streams by swapping the source.
  */
object EventStreams {

  /** events schema as stored in parquet. `ts` has shipped as both physical
    * INT64 nanos (TIMESTAMP(NANOS) — the same wide-physical-type situation
    * the reference handles for picos timestamps, reference:
    * spi/type/TimestampType.java:35) and plain TIMESTAMP(MICROS) across
    * fixture generations; [[fileSchemaFor]] + [[normalizeTs]] dispatch on
    * the footer so batch and streaming share schema and values either way. */
  def fileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Declared streaming schema matching the physical layout of `sample`
    * (a one-time driver-side footer read — metadata only, no data scan). */
  def fileSchemaFor(spark: SparkSession, sample: String): StructType =
    fileSchema(spark.read.parquet(sample).schema("ts").dataType)

  /** nanos-long → micros truncation (DuckDB-matching) or NTZ → session-TZ
    * cast, exactly like the batch path (graft.sources.Tables.loadEvents). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** File-based unbounded source (swap for Kafka in production). */
  def source(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(spark.readStream
      .schema(fileSchemaFor(spark, s"$dir/events.parquet"))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))

  /** Tumbling 1-day windowed aggregation with a 1-hour watermark —
    * streaming twin of Events.q_events_daily. */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        sum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("approx_users"), col("total_value"))

  /** Session windows with a 30-minute gap — streaming twin of
    * Events.q_events_sessionize (native session_window instead of lag+sum). */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("n_events"), col("session_value"))

  /** Stream-stream interval join: each view joined to the same user's
    * purchases within the following 30 minutes. Both sides carry watermarks,
    * so join state is evicted once the event-time bound passes — the
    * standard bounded-state stream join. Works identically on a batch
    * DataFrame (the spec reconciles the two). */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    views.join(purchases,
      expr("""v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"""))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"), col("value"))
  }

  /** One emitted pattern match (streaming MATCH_RECOGNIZE output row). */
  final case class StreamMatch(userId: Long, startEventId: Long, endEventId: Long,
      nRows: Int, sumValue: Double)

  /** CEP input row — `ts` carries the watermark through the projection. */
  final case class CepEvent(user_id: Long, ts_ms: Long, event_id: Long,
      event_type: String, value: Double, ts: java.sql.Timestamp)

  /** Streaming MATCH_RECOGNIZE — CEP over the event stream, an extension the
    * reference cannot express (its MATCH_RECOGNIZE is batch-only;
    * operator/window/matcher/Matcher.java): the SAME backtracking NFA as the
    * batch operator (graft.plans.RowPattern.Matcher — one matcher, two
    * runtimes) applied per user inside gap-bounded session bursts.
    *
    * Semantics: rows are pattern-matched within sessions split at > `gap`
    * quiet periods (a match never spans a session gap — the CEP analogue of
    * Flink's `within`). A session is MATURE once the watermark passes its
    * last event by `gap` — no future row can extend it — so emitted matches
    * are final (append mode, exactly-once w.r.t. event time).
    *
    * State per user: the open (immature) session buffer only; matured rows
    * leave state on emission, and event-time timeouts re-examine keys that
    * stop receiving data. State is therefore bounded by session length, not
    * stream length.
    *
    * Rows seen by DEFINE predicates: Row(event_id, ts_millis, event_type,
    * value) — positional, same order as the batch twin in the spec. */
  def matchRecognizeStream(events: DataFrame, pattern: String,
      define: Map[String, graft.plans.RowPattern.Predicate],
      gapMinutes: Int): org.apache.spark.sql.Dataset[StreamMatch] = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.plans.RowPattern
    val gapMs = gapMinutes * 60000L
    val matcher = new RowPattern.Matcher(RowPattern.parse(pattern), RowPattern.liftAll(define))
    implicit val inEnc: Encoder[CepEvent] = Encoders.product[CepEvent]
    implicit val stateEnc: Encoder[List[(Long, Long, String, Double)]] =
      Encoders.kryo[List[(Long, Long, String, Double)]]
    implicit val outEnc: Encoder[StreamMatch] = Encoders.product[StreamMatch]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def runMatcher(userId: Long, session: Seq[(Long, Long, String, Double)]): Seq[StreamMatch] = {
      val part: IndexedSeq[Row] = session.map(e => Row(e._2, e._1, e._3, e._4)).toIndexedSeq
      matcher.findAll(part).map { m =>
        val rows = session.slice(m.start, m.end)
        StreamMatch(userId, rows.head._2, rows.last._2, rows.size,
          rows.map(_._4).sum)
      }
    }

    events
      .select(col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "1 hour")
      .as[CepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, String, Double)], StreamMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, newRows, state) =>
          val buffered = state.getOption.getOrElse(Nil)
          val all = (buffered ++ newRows.map(r => (r.ts_ms, r.event_id, r.event_type, r.value)))
            .sortBy(e => (e._1, e._2))
          val wm = state.getCurrentWatermarkMs()
          // split into gap-bounded sessions, emit the mature ones
          val sessions = all.foldLeft(List.empty[List[(Long, Long, String, Double)]]) {
            case (acc, e) => acc match {
              case cur :: rest if e._1 - cur.last._1 <= gapMs => (cur :+ e) :: rest
              case _ => List(e) :: acc
            }
          }.reverse
          // Maturity is STRICT (last + gap < wm) while membership is
          // inclusive (ts - last <= gap): a row at exactly last+gap when
          // wm == last+gap is not late-filtered (watermark drops only
          // ts < wm), so the session must still be open to absorb it —
          // otherwise the batch twin would extend a session the stream
          // already emitted, breaking exactly-once-vs-batch equivalence.
          val (mature, open) = sessions.partition(sess => sess.last._1 + gapMs < wm)
          val out = mature.flatMap(sess => runMatcher(userId, sess))
          val remaining = open.flatten
          if (remaining.isEmpty) state.remove()
          else {
            state.update(remaining)
            state.setTimeoutTimestamp(math.max(wm, remaining.head._1) + gapMs + 1)
          }
          out.iterator
      }
  }

  /** Custom keyed state via mapGroupsWithState: per-user running event count
    * and value total. State is one (count, sum) pair per key, partitioned
    * across executors — the arbitrary-stateful-operator surface that windowed
    * aggregations can't express. */
  def runningUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val pairEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val (c0, v0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0; var v = v0
          rows.foreach { r => c += 1; v += r._2 }
          state.update((c, v))
          (user, c, v)
      }
  }
}
