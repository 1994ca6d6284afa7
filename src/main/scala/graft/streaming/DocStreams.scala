package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twins of the training-data pipeline operators
  * (operators.TextPipeline): a crawl is a STREAM in production — documents
  * arrive continuously and pass through scrubbing/chunking/contamination
  * filters before they ever land in the corpus. All three transforms are
  * stateless per document (the contamination check joins a STATIC
  * broadcast benchmark-shingle set), so the streaming twins reuse the
  * batch logic verbatim and need no watermark state at all — the shape
  * that runs at ingest rate on any cluster. */
object DocStreams {

  def fileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based unbounded source over the documents fixture (swap for the
    * crawl topic in production). */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Stateless scrub stage (the batch query's mask chain, reused). */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.operators.TextPipeline.scrub(col("text")).as("scrubbed"))

  /** Stateless chunking stage (same size/stride as the batch twin). */
  def chunk(docs: DataFrame, size: Int = 32, stride: Int = 24): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .withColumn("n_chunks",
        when(col("n") <= size, lit(1))
          .otherwise(floor((col("n") - size + stride - 1) / lit(stride)) + 1)
          .cast("int"))
      .withColumn("chunk_id", explode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * stride + 1, lit(size)))
          .as("chunk_text"))

  /** Streaming dedup at ingest on `xxhash64` of the batch q_dedup_exact
    * NORMALIZATION (whitespace-collapsed lowercase text), deduplicated
    * across the stream with WATERMARK-BOUNDED state
    * (`dropDuplicatesWithinWatermark`) — the near-line dedup a crawl
    * pipeline runs before the periodic minhash batch. Unlike plain
    * dropDuplicates, whose key state grows without bound, keys older than
    * the watermark horizon are evicted, so the operator runs indefinitely
    * at any ingest rate; duplicates farther apart than the horizon are
    * left for the batch pass (the standard lambda split). `eventTime`
    * names the stream's time column.
    *
    * Exactness delta vs the batch twin (round-14 verdict #6, a deliberate
    * trade): state is keyed on the 8-byte `xxhash64(norm)`, NOT the norm
    * string — state stores bound 8 bytes/doc instead of a full document,
    * which is what lets the operator hold the whole watermark horizon in
    * state at crawl rates. The cost is a 2⁻⁶⁴-per-pair hash collision
    * DROPPING a unique document with no rescue (the batch q_dedup_exact
    * keeps `norm` in the row and tie-verifies, so it has no such loss
    * mode). At 10⁹ docs/horizon the expected loss is ~0.03 docs; the
    * periodic batch pass is the backstop. DocStreamsSpec reconciles the
    * two twins and notes the delta. */
  def dedupExact(docs: DataFrame, eventTime: String,
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("norm_key",
        xxhash64(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("norm_key")

  /** Stream-static contamination filter: incoming docs are flagged when
    * they share an 8-gram with the STATIC benchmark set. The shingle join
    * itself is a stateless broadcast probe (the stream side is never
    * shuffled on text); the per-doc flag is a streaming aggregation keyed
    * by doc_id, so the sink runs in update/complete mode. */
  def contaminationFlags(docs: DataFrame, benchShingles: DataFrame,
      gram: Int = 8): DataFrame = {
    val shingled = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .filter(col("n") >= gram)
      .withColumn("i", explode(sequence(lit(0), col("n") - gram)))
      .withColumn("shingle",
        concat_ws(" ", slice(col("toks"), col("i") + 1, lit(gram))))
    val bench = benchShingles.select(col("shingle")).withColumn("hit", lit(1))
    shingled
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("hit").isNotNull).as("contaminated"))
  }
}
