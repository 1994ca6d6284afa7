package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix sampling operators (SURVEY.md LLM extensions; reference
  * SampleNode/TABLESAMPLE is the engine-side analogue, but a data pipeline
  * needs DETERMINISTIC, stratum-exact sampling — reproducible across runs
  * and engines — which these provide via md5-hash ordering instead of a
  * PRNG):
  *
  *  - stratified: exactly ceil(rate·|stratum|) docs per stratum, chosen by
  *    hash order (any engine picks the same docs);
  *  - hash-Bernoulli: a pure per-row predicate on the md5 hex prefix — the
  *    shape that scales to 100 TB with NO shuffle and no per-stratum
  *    state, at the cost of only approximating the rate;
  *  - mixture: integer up-weighting per language (en×3) by in-row
  *    replication — the static mixture-weights stage of a pretraining
  *    data recipe.
  */
object Sampling {

  /** Exact 20% per source stratum, hash-ordered. One shuffle on the
    * stratum key; the per-stratum state is a row_number, not a buffer. */
  def q_sample_stratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    val t = table(s, dir, "documents")
      .withColumn("h", md5($"doc_id".cast("string")))
      .withColumn("rn", row_number().over(w))
      .withColumn("stratum_n", count(lit(1)).over(Window.partitionBy($"source")))
    t.filter($"rn" <= ceil($"stratum_n" * 0.2))
      .select($"doc_id", $"source", $"rn".cast("long").as("rn"),
        $"stratum_n".cast("long").as("stratum_n"))
      .orderBy($"source", $"rn")
  }
  val qSampleStratifiedSql: String =
    """WITH t AS (
         SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS stratum_n
         FROM documents)
       SELECT doc_id, source, CAST(rn AS BIGINT) AS rn,
              CAST(stratum_n AS BIGINT) AS stratum_n
       FROM t WHERE rn <= ceil(stratum_n * 0.2)
       ORDER BY source, rn"""

  /** Hash-Bernoulli ~20%: md5 hex prefix below '33' (51/256 ≈ 19.9%). A
    * pure map-side predicate — the only sampling shape with zero shuffle
    * and zero coordination, so it is THE 100 TB default. */
  def q_sample_hash_bernoulli(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "documents")
      .withColumn("h2", substring(md5($"doc_id".cast("string")), 1, 2))
    t.filter($"h2" < "33")
      .select($"doc_id", $"source", $"h2")
      .orderBy($"doc_id")
  }
  val qSampleHashBernoulliSql: String =
    """SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
       FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33'
       ORDER BY doc_id"""

  /** Static mixture weights: en up-weighted 3x by replication (copy_id
    * distinguishes the copies), all other languages kept once. In-row
    * explode — no shuffle; the aggregate verifies the achieved mixture. */
  def q_sample_mixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weighted = table(s, dir, "documents")
      .withColumn("weight", when($"lang" === "en", 3).otherwise(1))
      .withColumn("copy_id", explode(sequence(lit(1), $"weight")))
    weighted.groupBy($"lang")
      .agg(countDistinct($"doc_id").as("docs"),
        count(lit(1)).as("rows_out"),
        sum($"copy_id").as("copy_sum"))
      .orderBy($"lang")
  }
  val qSampleMixtureSql: String =
    """WITH w AS (
         SELECT doc_id, lang,
                CAST(unnest(range(1, CASE WHEN lang = 'en' THEN 4 ELSE 2 END)) AS INT)
                  AS copy_id
         FROM documents)
       SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS rows_out,
              CAST(sum(copy_id) AS BIGINT) AS copy_sum
       FROM w GROUP BY lang ORDER BY lang"""

  private val SeqLen = 256

  /** Sequence packing (the concat-and-split batching transform LM training
    * uses): documents concatenate in doc_id order and the token stream is
    * cut every 256 tokens. Each document's global offset is ONE window
    * cumsum; its sequence span and the per-sequence composition follow
    * from exact integer arithmetic — no per-sequence state, no second
    * pass. The window is a single global sort at this fixture scale; at
    * 100 TB the same packing runs per sorted shard with shard-prefix
    * offsets (an associative fold), so the shape survives. */
  def q_pack_sequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"doc_id").rowsBetween(Long.MinValue, -1)
    val d = table(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .withColumn("off", coalesce(sum($"n").over(w), lit(0L)))
      .withColumn("start_seq", floor($"off" / SeqLen))
      .withColumn("end_seq", floor(($"off" + $"n" - 1) / SeqLen))
    d.withColumn("seq_id", explode(sequence($"start_seq", $"end_seq")))
      .withColumn("overlap",
        least($"off" + $"n", ($"seq_id" + 1) * SeqLen) -
          greatest($"off", $"seq_id" * SeqLen))
      .groupBy($"seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"overlap").as("seq_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"seq_id")
  }
  val qPackSequencesSql: String =
    s"""WITH d AS (
         SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
           COALESCE(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS off
         FROM documents),
       spans AS (
         SELECT doc_id, n, off,
           CAST(off // $SeqLen AS BIGINT) AS start_seq,
           CAST((off + n - 1) // $SeqLen AS BIGINT) AS end_seq
         FROM d),
       e AS (
         SELECT doc_id, n, off,
           CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
         FROM spans)
       SELECT seq_id, count(*) AS n_docs,
         CAST(sum(least(off + n, (seq_id + 1) * $SeqLen)
                - greatest(off, seq_id * $SeqLen)) AS BIGINT) AS seq_tokens,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM e GROUP BY seq_id ORDER BY seq_id"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_sample_stratified" -> q_sample_stratified _,
    "q_sample_hash_bernoulli" -> q_sample_hash_bernoulli _,
    "q_sample_mixture" -> q_sample_mixture _,
    "q_pack_sequences" -> q_pack_sequences _)
  val oracles: Map[String, String] = Map(
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_sample_hash_bernoulli" -> qSampleHashBernoulliSql,
    "q_sample_mixture" -> qSampleMixtureSql,
    "q_pack_sequences" -> qPackSequencesSql)
}
