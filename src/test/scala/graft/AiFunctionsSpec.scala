package graft

import graft.functions.AiFunctions._
import org.apache.spark.sql.functions._

/** Pins the AI-function stub-model contract (graft.functions.AiFunctions):
  * the analytical four are exact rule systems (also oracle-checked by
  * q_ai_functions); the generative three are TAGGED DETERMINISTIC ECHOES —
  * this spec is their contract: a real deployment swaps only the model
  * behind the same signatures (reference AiFunctions.java signature table). */
class AiFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("sentiment covers all four labels") {
    val rows = Seq(
      ("great amazing work", "positive"),
      ("terrible awful day", "negative"),
      ("great but awful", "mixed"),
      ("completely factual text", "neutral")
    ).toDF("txt", "expected")
      .withColumn("got", aiAnalyzeSentiment($"txt"))
      .collect()
    rows.foreach(r => assert(r.getString(2) == r.getString(1), r.getString(0)))
  }

  test("classify: argmax occurrences, earliest label wins ties and zero-score") {
    val df = Seq(
      ("ship ship invoice", Seq("invoice", "ship"), "ship"),
      ("ship invoice", Seq("invoice", "ship"), "invoice"), // tie → earliest
      ("nothing relevant", Seq("a", "b"), "a")             // zero → earliest
    ).toDF("txt", "labels", "expected")
      .withColumn("got", aiClassify($"txt", $"labels"))
      .collect()
    df.foreach(r => assert(r.getString(3) == r.getString(2), r.getString(0)))
  }

  test("extract and mask follow the rule regexes; unknown labels are inert") {
    val row = Seq("Call Alice at alice@example.com about invoice 42")
      .toDF("txt")
      .select(
        element_at(aiExtract($"txt", array(lit("email"), lit("number"), lit("name"),
          lit("mystery"))), "email").as("email"),
        element_at(aiExtract($"txt", array(lit("mystery"))), "mystery").as("mystery"),
        aiMask($"txt", array(lit("email"), lit("number"), lit("mystery"))).as("masked"))
      .head()
    assert(row.getString(0) == "alice@example.com")
    assert(row.isNullAt(1))
    assert(row.getString(2) == "Call Alice at [MASKED] about invoice [MASKED]")
  }

  test("generative stubs: tagged deterministic echoes (the swap point)") {
    val row = Seq(("fix me", "hello", "de"))
      .toDF("a", "b", "lang")
      .select(aiFixGrammar($"a"), aiGen($"b"), aiTranslate($"b", $"lang"))
      .head()
    assert(row.getString(0) == "[fixed] fix me")
    assert(row.getString(1) == "[gen] hello")
    assert(row.getString(2) == "[de] hello")
  }
}
