package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming twins of the training-data pipeline (streaming.DocStreams):
  * a crawl stream is scrubbed, chunked, and contamination-filtered with
  * the SAME logic as the batch operators; each stage reconciles exactly
  * against its batch twin. */
class DocStreamsSpec extends SparkSpec {

  private def runAvailable(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming PII scrub matches the batch mask chain") {
    val streamed = runAvailable(
      streaming.DocStreams.piiScrub(streaming.DocStreams.source(spark, sfDir)),
      "scrub_out")
    val batch = operators.table(spark, sfDir, "documents")
      .select(col("doc_id"), operators.TextPipeline.scrub(col("text")).as("scrubbed"))
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("doc_id", "scrubbed"), "left_anti").count()
    assert(diff == 0, s"$diff streamed docs scrubbed differently from batch")
  }

  test("streaming chunking matches the batch window arithmetic") {
    val streamed = runAvailable(
      streaming.DocStreams.chunk(streaming.DocStreams.source(spark, sfDir)),
      "chunk_out")
    val batch = streaming.DocStreams.chunk(
      operators.table(spark, sfDir, "documents"))
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("doc_id", "chunk_id", "chunk_text"), "left_anti")
      .count()
    assert(diff == 0, s"$diff streamed chunks differ from batch")
  }

  // NOTE (r14 verdict #6): the streaming twin keys its watermark state on
  // xxhash64(norm) — 8 bytes/doc of state — so unlike the batch twin a
  // 2^-64 hash collision would drop a unique doc. The fixture corpus has no
  // colliding pair, so the reconcile below is exact-equal; the trade is
  // documented on DocStreams.dedupExact.
  test("streaming exact dedup keeps one doc per normalized text, state watermark-bounded") {
    import spark.implicits._
    // synthesize an event time (fixture has none); constant so the
    // AvailableNow batching can never classify replayed rows as late —
    // the point here is the dedup semantics, not late-arrival policy
    val stream = streaming.DocStreams.source(spark, sfDir)
      .withColumn("event_time", lit("2024-01-01 00:00:00").cast("timestamp"))
    val streamed = runAvailable(
      streaming.DocStreams.dedupExact(stream, "event_time"), "dedup_out")
    val batchDistinct = operators.table(spark, sfDir, "documents")
      .select(regexp_replace(lower($"text"), "\\s+", " ").as("norm"))
      .distinct().count()
    // one survivor per distinct normalized text (all fixture docs fall in
    // one watermark window under AvailableNow, so the horizon never evicts)
    assert(streamed.count() == batchDistinct,
      s"streamed ${streamed.count()} vs $batchDistinct distinct norms")
    assert(streamed.select($"norm_key").distinct().count() == streamed.count())
  }

  test("stream-static contamination flags match the batch scan") {
    import spark.implicits._
    val docs = operators.table(spark, sfDir, "documents")
    val gram = 8
    def shingles(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", split($"text", " "))
      .withColumn("n", size($"toks"))
      .filter($"n" >= gram)
      .withColumn("i", explode(sequence(lit(0), $"n" - gram)))
      .select(concat_ws(" ", slice($"toks", $"i" + 1, lit(gram))).as("shingle"))
    val bench = shingles(docs.filter($"doc_id" % 50 === 0)).distinct()

    val streamed = runAvailable(
      streaming.DocStreams.contaminationFlags(
        streaming.DocStreams.source(spark, sfDir).filter($"doc_id" % 50 =!= 0),
        bench),
      "contam_out", mode = "complete")
    val batchFlags = streaming.DocStreams.contaminationFlags(
      docs.filter($"doc_id" % 50 =!= 0), bench)
    val s = streamed.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b = batchFlags.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(s == b)
    assert(b.values.exists(identity), "fixture should contain contaminated docs")
  }

  test("streaming CoW ingest: idempotent micro-batch commits into the bucketed index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the continuous-ingest shape behind q_dedup_incremental: a crawl
    // stream appends into a bucketed CoW signature index; restart replays
    // of a micro-batch are no-ops (insertStreamBatch tags the published
    // version with the batch id)
    val root = java.nio.file.Files.createTempDirectory("cow_stream").toString
    val t = graft.catalog.CowTable.create(spark, root,
      spark.range(0, 50).select($"id".as("doc_id"), ($"id" % 8).as("bucket")),
      bucketBy = Seq("bucket"), bucketCount = 4)
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("doc_id")
      .select($"doc_id", ($"doc_id" % 8).as("bucket"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cow_stream_ck").toString)
      .foreachBatch(graft.catalog.CowTable.streamInto(t))
      .start()
    in.addData(100L to 149L: _*)
    q.processAllAvailable()
    in.addData(200L to 219L: _*)
    q.processAllAvailable()
    q.stop()
    assert(t.read().count() == 50 + 50 + 20)
    // a restart REPLAY of an already-published batch id is a no-op
    val replayed = t.insertStreamBatch(
      spark.range(100, 150).select($"id".as("doc_id"), ($"id" % 8).as("bucket")), 0L)
    assert(!replayed, "published batch id must not re-insert")
    assert(t.read().count() == 120)
    // a NEW batch id still inserts, and the table stays bucket-aware:
    // the self-join on the bucket key plans zero exchanges
    assert(t.insertStreamBatch(
      spark.range(300, 310).select($"id".as("doc_id"), ($"id" % 8).as("bucket")), 99L))
    assert(t.read().count() == 130)
    // r18: the replay check is O(1) via the head-side max-batch marker, not
    // an O(versions) sweep of per-version tag files — deleting every tag
    // must NOT re-open already-published batch ids to re-insertion
    val marker = java.nio.file.Paths.get(root, "_manifests", "_stream_max_batch")
    assert(java.nio.file.Files.exists(marker), "head-side marker must exist")
    assert(new String(java.nio.file.Files.readAllBytes(marker)).trim
      .startsWith("99 "), "marker carries the max published batch id")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root, "_manifests"))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("_batch_"))
      .toList.foreach(java.nio.file.Files.delete)
    assert(!t.insertStreamBatch(
      spark.range(0, 1).select($"id".as("doc_id"), ($"id" % 8).as("bucket")), 1L),
      "marker alone must decide replay for batch ids at or below the max")
    assert(t.read().count() == 130)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = t.read().as("a").join(t.read().as("b"), "bucket").groupBy("bucket").count()
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
