package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AI-function surface (reference plugin/trino-ai-functions — see
  * graft.functions.AiFunctions for the stub-model contract): the analytical
  * four (sentiment / classify / extract / mask) are exact rule systems, so
  * the oracle replays the full semantics — tokenization, lexicon counts,
  * argmax-with-earliest-tie, rule regexes — in DuckDB over the same
  * documents. Injected per-doc suffixes guarantee every sentiment class,
  * tie/non-tie classify paths, and extractable entities all occur. */
object Ai {

  def q_ai_functions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.AiFunctions._
    val t = table(s, dir, "documents").filter($"doc_id" < 400)
      .withColumn("txt", concat(
        substring($"text", 1, 160),
        when($"doc_id" % 4 === 0, " great success")
          .when($"doc_id" % 4 === 1, " awful failure")
          .when($"doc_id" % 4 === 2, " great awful")
          .otherwise(""),
        when($"doc_id" % 2 === 0, " ref ref") .otherwise(""),
        lit(" Contact Alice at bob"), $"doc_id", lit("@example.com ref "), $"doc_id"))
    t.select($"doc_id",
        aiAnalyzeSentiment($"txt").as("sentiment"),
        aiClassify($"txt", array(lit("alice"), lit("ref"), lit("zebra"))).as("label"),
        element_at(aiExtract($"txt", array(lit("email"), lit("number"), lit("name"))),
          "email").as("email"),
        element_at(aiExtract($"txt", array(lit("email"), lit("number"), lit("name"))),
          "number").as("number"),
        element_at(aiExtract($"txt", array(lit("email"), lit("number"), lit("name"))),
          "name").as("name"),
        aiMask($"txt", array(lit("email"), lit("number"))).as("masked"))
      .orderBy($"doc_id")
  }
  val qAiFunctionsSql: String =
    """WITH t AS (
         SELECT doc_id,
           substr(text, 1, 160)
             || CASE doc_id % 4 WHEN 0 THEN ' great success'
                                WHEN 1 THEN ' awful failure'
                                WHEN 2 THEN ' great awful' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN ' ref ref' ELSE '' END
             || ' Contact Alice at bob' || doc_id || '@example.com ref ' || doc_id AS txt
         FROM documents WHERE doc_id < 400),
       tok AS (
         SELECT *,
           [x FOR x IN string_split_regex(lower(txt), '[^a-z0-9]+') IF length(x) > 0] AS toks
         FROM t),
       scored AS (
         SELECT *,
           len([x FOR x IN toks IF x IN ('good','great','excellent','love','happy','wonderful','best','amazing','positive','success')]) AS pos,
           len([x FOR x IN toks IF x IN ('bad','terrible','awful','hate','sad','worst','horrible','negative','failure','poor')]) AS neg,
           len([x FOR x IN toks IF x = 'alice']) AS s_alice,
           len([x FOR x IN toks IF x = 'ref']) AS s_ref,
           len([x FOR x IN toks IF x = 'zebra']) AS s_zebra
         FROM tok)
       SELECT doc_id,
         CASE WHEN pos > 0 AND neg > 0 THEN 'mixed'
              WHEN pos > 0 THEN 'positive'
              WHEN neg > 0 THEN 'negative'
              ELSE 'neutral' END AS sentiment,
         -- argmax with earliest-label tie-break (the fold replaces the best
         -- only on STRICT improvement, label order alice, ref, zebra)
         CASE WHEN s_zebra > greatest(s_alice, s_ref) THEN 'zebra'
              WHEN s_ref > s_alice THEN 'ref'
              ELSE 'alice' END AS label,
         nullif(regexp_extract(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0), '') AS email,
         nullif(regexp_extract(txt, '[0-9]+(\.[0-9]+)?', 0), '') AS number,
         nullif(regexp_extract(txt, '\b[A-Z][a-z]+\b', 0), '') AS name,
         regexp_replace(
           regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[MASKED]', 'g'),
           '[0-9]+(\.[0-9]+)?', '[MASKED]', 'g') AS masked
       FROM scored ORDER BY doc_id"""

  val queries: Map[String, Q] = Map("q_ai_functions" -> q_ai_functions _)
  val oracles: Map[String, String] = Map("q_ai_functions" -> qAiFunctionsSql)
}
