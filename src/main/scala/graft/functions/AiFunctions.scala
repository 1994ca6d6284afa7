package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** AI function family (reference: plugin/trino-ai-functions/src/main/java/io/
  * trino/plugin/ai/functions/AiFunctions.java — ai_analyze_sentiment,
  * ai_classify, ai_extract, ai_mask, ai_fix_grammar, ai_gen, ai_translate;
  * the reference routes each through an LLM endpoint client,
  * AbstractAiClient.java:69 shows the sentiment label contract
  * [positive, negative, neutral, mixed]).
  *
  * There is no model endpoint in this environment (zero egress), so — like
  * the Multimodal codecs — the MODEL is a clearly-documented deterministic
  * stand-in while the ENGINE side is real: every function is pure Column
  * arithmetic (codegen'd, no UDFs), distributes trivially, and the
  * analytical functions (sentiment / classify / extract / mask) have exact
  * rule-based semantics a DuckDB oracle replays verbatim. The generative
  * three (fix_grammar / gen / translate) have no deterministic ground truth
  * by nature; their stubs are tagged echoes pinned by spec only.
  *
  * Stub model contract (the part a real deployment would swap for an LLM
  * client):
  *  - sentiment: count matches against fixed positive/negative lexicons;
  *    both present → mixed, one → that label, none → neutral.
  *  - classify(text, labels): label with the highest whole-word occurrence
  *    count of the label itself in the text; ties and zero scores go to the
  *    EARLIEST label (the deterministic analogue of the LLM's forced choice).
  *  - extract(text, labels): per label, a rule regex — email / number /
  *    capitalized name — else NULL (absent key semantics follow the
  *    reference returning no value for unextractable labels).
  *  - mask(text, labels): replace each label's rule regex with '[MASKED]'.
  */
object AiFunctions {

  private val positiveWords = Seq("good", "great", "excellent", "love", "happy",
    "wonderful", "best", "amazing", "positive", "success")
  private val negativeWords = Seq("bad", "terrible", "awful", "hate", "sad",
    "worst", "horrible", "negative", "failure", "poor")

  private def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  private def countIn(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** ai_analyze_sentiment(text) → positive | negative | neutral | mixed. */
  def aiAnalyzeSentiment(text: Column): Column = {
    val pos = countIn(text, positiveWords)
    val neg = countIn(text, negativeWords)
    when(pos > 0 && neg > 0, "mixed")
      .when(pos > 0, "positive")
      .when(neg > 0, "negative")
      .otherwise("neutral")
  }

  /** ai_classify(text, labels) → the argmax-occurrence label (earliest wins
    * ties). Scoring folds over the labels array, so the label set is fully
    * dynamic per row. */
  def aiClassify(text: Column, labels: Column): Column = {
    val toks = tokens(text)
    val scored = aggregate(
      labels,
      struct(lit(-1).as("score"), lit("").as("label")),
      (acc, l) => {
        val score = size(filter(toks, t => t === lower(l)))
        when(score > acc("score"), struct(score.as("score"), l.as("label")))
          .otherwise(acc)
      })
    scored("label")
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val numberRe = "[0-9]+(\\.[0-9]+)?"
  private val nameRe = "\\b[A-Z][a-z]+\\b"

  private def ruleExtract(label: Column, text: Column): Column =
    when(lower(label) === "email", nullif(regexp_extract(text, emailRe, 0), lit("")))
      .when(lower(label) === "number", nullif(regexp_extract(text, numberRe, 0), lit("")))
      .when(lower(label) === "name", nullif(regexp_extract(text, nameRe, 0), lit("")))
      .otherwise(lit(null))

  /** ai_extract(text, labels) → map(label → extracted value or NULL). */
  def aiExtract(text: Column, labels: Column): Column =
    map_from_arrays(labels, transform(labels, l => ruleExtract(l, text)))

  private def ruleRegex(label: Column): Column =
    when(lower(label) === "email", emailRe)
      .when(lower(label) === "number", numberRe)
      .when(lower(label) === "name", nameRe)
      .otherwise(lit(null))

  /** ai_mask(text, labels): every label's rule pattern → '[MASKED]'. */
  def aiMask(text: Column, labels: Column): Column =
    aggregate(labels, text, (acc, l) =>
      when(ruleRegex(l).isNull, acc)
        .otherwise(regexp_replace(acc, ruleRegex(l), lit("[MASKED]"))))

  /** Generative stubs — tagged deterministic echoes; a real deployment swaps
    * these for the endpoint client (AnthropicClient/OpenAiClient in the
    * reference). Pinned by AiFunctionsSpec, not by a value oracle. */
  def aiFixGrammar(text: Column): Column = concat(lit("[fixed] "), text)
  def aiGen(prompt: Column): Column = concat(lit("[gen] "), prompt)
  def aiTranslate(text: Column, language: Column): Column =
    concat(lit("["), language, lit("] "), text)
}
