package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding storage/transport operators for a training pipeline
  * (SURVEY.md LLM extensions; complements Similarity's search ops):
  * symmetric int8 quantization (the storage format ANN indexes and
  * vector DBs ship) and Matryoshka-style prefix truncation — both pure
  * map stages, no shuffle, oracle-replayed term by term.
  *
  * Exactness: every float widens to double before arithmetic, folds are
  * explicit left folds with a 0.0 seed on both engines (0.0 + x ≡ x in
  * IEEE, so the sequences are identical), and quantization uses
  * floor(x/scale + 0.5) on both sides — no engine-specific rounding mode
  * is ever invoked. */
object EmbeddingOps {

  /** Per-vector symmetric int8 quantization: scale = max|x|/127,
    * q = clamp(floor(x/scale + 0.5), -127, 127); plus 16-dim Matryoshka
    * truncation with its exact left-fold L2 energy. */
  def q_embed_quantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "embeddings").filter($"vec_id" < 2000)
    val absMax = array_max(transform($"embedding", x => abs(x.cast("double"))))
    val withScale = e.withColumn("scale", absMax / 127.0)
    val q = transform($"embedding", x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") / $"scale" + 0.5))))
    val l2_16 = aggregate(
      transform(slice($"embedding", 1, 16), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc: Column, x: Column) => acc + x)
    withScale
      .withColumn("q", q)
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        round($"scale" * 1e9).cast("long").as("scale_e9"),
        aggregate($"q", lit(0L), (a: Column, x: Column) => a + x).as("q_sum"),
        aggregate($"q", lit(0L), (a: Column, x: Column) => a + abs(x)).as("q_abs_sum"),
        concat_ws(",", slice($"q", 1, 4).cast("array<string>")).as("q_head"),
        round(l2_16 * 1e9).cast("long").as("l2_16_e9"))
      .orderBy($"vec_id")
  }
  val qEmbedQuantizeSql: String =
    """WITH e AS (
         SELECT vec_id, embedding,
           list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) / 127.0 AS scale
         FROM embeddings WHERE vec_id < 2000),
       q AS (
         SELECT vec_id, embedding, scale,
           [greatest(-127, least(127, CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)))
            for x in embedding] AS qv
         FROM e)
       SELECT vec_id,
         CAST(len(embedding) AS INT) AS n_dims,
         CAST(round(scale * 1e9) AS BIGINT) AS scale_e9,
         list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (a, x) -> a + x) AS q_sum,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [abs(x) for x in qv]), (a, x) -> a + x) AS q_abs_sum,
         array_to_string(qv[1:4], ',') AS q_head,
         CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding[1:16]]),
           (a, x) -> a + x) * 1e9) AS BIGINT) AS l2_16_e9
       FROM q ORDER BY vec_id"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map("q_embed_quantize" -> q_embed_quantize _)
  val oracles: Map[String, String] = Map("q_embed_quantize" -> qEmbedQuantizeSql)
}
