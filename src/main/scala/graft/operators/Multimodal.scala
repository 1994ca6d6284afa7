package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (extension track).
  *
  * Media (image/audio/video) travel as opaque BINARY columns with typed
  * metadata, the pattern the brief prescribes. The decode/feature-extract step
  * is a per-partition batch transform: on a real cluster this is where a
  * decoder library (or a Python `mapInPandas` stage) plugs in; this container
  * has no media libs, so `decodeStub` is a clearly-marked deterministic fake —
  * the Spark-side contract (schema, partitioning, batch shape) is real and
  * tested in MultimodalSpec.
  *
  * Scale: mapPartitions keeps per-record overhead amortized across a partition
  * (one decoder init per partition, not per row) — the same batching contract
  * as Arrow-based mapInPandas.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])

  /** Synthesize a media table from documents: payload = utf8 bytes (stand-in
    * for encoded media), dimensions derived deterministically. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"))

  /** STUB decoder: a real deployment replaces the body with an image/audio
    * decoder; everything around it (typed Dataset, partition-wise batching,
    * fixed-width feature schema) is the production shape. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder init" happens here (once, not per record)
      rows.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        // fake 8-dim "embedding": byte histogram moments — deterministic
        val feat = Array.tabulate(8) { i =>
          val bucket = r.payload.count(b => ((b & 0xff) % 8) == i)
          bucket.toFloat / math.max(r.payload.length, 1)
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, checksum, feat)
      }
    }
  }

  /** STUB resize: deterministic byte-stride downsample standing in for an
    * image resampler; metadata (width/height) updates with the payload, the
    * contract a real resize kernel must keep. Scale factor 2 per axis. */
  def resizeStub(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val resized = r.payload.zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }
      r.copy(payload = resized, width = math.max(r.width / 2, 1),
        height = math.max(r.height / 2, 1))
    }
  }

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB frame sampler: 1→N expansion of video payloads into evenly spaced
    * byte-range "frames" (a real deployment decodes and samples actual frames;
    * the flatMap expansion, slice arithmetic, and per-frame schema are the
    * production shape — same contract as video frame extraction). */
  def frameSampleStub(media: Dataset[MediaRow], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val len = r.payload.length
      (0 until nFrames).map { i =>
        Frame(r.media_id, i, r.payload.slice(i * len / nFrames, (i + 1) * len / nFrames))
      }
    }
  }

  /** Frame sampling pipeline: video rows → 4 frames each → per-frame sizes and
    * fingerprints. Oracle recomputes the slice arithmetic over substrings. */
  def q_multimodal_frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = frameSampleStub(mediaTable(s, dir).as[MediaRow], 4)
    frames.map { f =>
      val fp = f.frame_bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      (f.media_id, f.frame_idx.toLong, f.frame_bytes.length.toLong, fp)
    }.toDF("media_id", "frame_idx", "n_bytes", "frame_fp")
      .orderBy($"media_id", $"frame_idx")
  }
  val qMultimodalFramesSql: String =
    """WITH v AS (
         SELECT doc_id AS media_id, text, length(text) AS len
         FROM documents
         WHERE ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] = 'video'),
       f AS (
         SELECT media_id, unnest(range(4)) AS frame_idx, text, len FROM v),
       sl AS (
         SELECT media_id, frame_idx,
           substr(text, CAST(frame_idx * len // 4 AS INT) + 1,
             CAST((frame_idx + 1) * len // 4 - frame_idx * len // 4 AS INT)) AS fb
         FROM f)
       SELECT media_id, frame_idx, CAST(length(fb) AS BIGINT) AS n_bytes,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(fb[i]) AS BIGINT) for i in range(1, length(fb) + 1)]),
           (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_fp
       FROM sl ORDER BY media_id, frame_idx"""

  /** End-to-end pipeline: binary ingest → partition-wise decode → per-kind stats. */
  def q_multimodal_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = decodeStub(mediaTable(s, dir).as[MediaRow])
    feats.groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        countDistinct($"checksum").as("distinct_payloads"),
        round(avg(element_at($"feature", 1)), 6).as("avg_f0"))
      .orderBy($"kind")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> q_multimodal_features _,
    "q_multimodal_frames" -> q_multimodal_frames _)

  /** checksum matches polyFingerprint over ascii text, so the oracle reuses the
    * portable arithmetic; avg_f0 is byte-histogram arithmetic, also portable. */
  val qMultimodalSql: String =
    """WITH m AS (
         SELECT doc_id AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           text, n_chars,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii(text[i]) AS BIGINT) for i in range(1, length(text) + 1)]),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum,
           CAST(len(list_filter([ascii(text[i]) for i in range(1, length(text) + 1)], b -> b % 8 = 0)) AS DOUBLE)
             / greatest(length(text), 1) AS f0
         FROM documents)
       SELECT kind, count(*) AS n_media, CAST(sum(length(text)) AS BIGINT) AS total_bytes,
         count(DISTINCT checksum) AS distinct_payloads, round(avg(f0), 6) AS avg_f0
       FROM m GROUP BY kind ORDER BY kind"""

  val oracles: Map[String, String] = Map(
    "q_multimodal_features" -> qMultimodalSql,
    "q_multimodal_frames" -> qMultimodalFramesSql)
}
