package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The fused minhash kernel (ext.MinHashShinglesAndSig) must be bit-identical
  * to the legacy two-expression spelling — distinct shingle hashes AND the
  * k-wide signature, including element ORDER — on the real documents fixture
  * and on crafted edge shapes (short docs, empty strings, repeated shingles).
  * q_dedup_minhash / q_dedup_incremental ride on this equality: their LSH
  * candidate sets (hence outputs) cannot move if both fields are equal. */
class TextKernelFusionSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def assertFusedMatchesLegacy(texts: org.apache.spark.sql.DataFrame): Unit = {
    val toks = tokens($"text")
    val rows = texts
      .select(
        shingleHashes3(toks).as("shs_legacy"),
        minhashSignature(shingles3(toks), K).as("sig_legacy"),
        minhashShinglesSig(toks, K).as("ss"))
      .select($"shs_legacy", $"sig_legacy", $"ss.shs".as("shs_fused"), $"ss.sig".as("sig_fused"))
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2), s"shs mismatch at row $i")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"sig mismatch at row $i")
    }
  }

  test("fused kernel equals legacy shingleHashes3 + minhashSignature on the documents fixture") {
    assertFusedMatchesLegacy(
      graft.sources.Tables.load(spark, sfDir, "documents").select($"text"))
  }

  test("fused kernel equals legacy on edge shapes") {
    val edge = Seq(
      "",                                   // empty → one empty-string shingle
      "one",                                // 1 token (short-doc fallback)
      "two words",                          // 2 tokens (short-doc fallback)
      "a b c",                              // exactly one trigram
      "a b c d",                            // two trigrams
      "x y z x y z x y z",                  // heavy intra-doc duplication
      "a  b   c",                           // empty tokens from repeated spaces
      "Mixed CASE and   puncT!? tokens a b c d e f g")
      .toDF("text")
    assertFusedMatchesLegacy(edge)
  }

  test("q_dedup_minhash output is unchanged by the fusion (vs exact ngram pair set)") {
    // AnnSpec already asserts minhash == ngram; re-assert here so a fusion
    // regression is attributed to this change, not to LSH recall
    val exact = operators.Dedup.q_dedup_ngram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val mh = operators.Dedup.q_dedup_minhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(mh == exact)
  }
}
