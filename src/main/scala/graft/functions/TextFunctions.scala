package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/dedup function bundle (extension track: LLM-data-pipeline ops).
  *
  * Everything here composes built-in codegen'd HOFs — per-row work, no shuffle,
  * no UDFs. The shuffle-bearing parts (LSH bucket joins) live in the operator
  * layer (graft.operators.Dedup) where partitioning is explicit.
  *
  * Hash family: xxhash64 with distinct integer salts, i.e. k independent-enough
  * permutation approximations for minhash (the standard single-hash+salt scheme;
  * cf. Broder, "On the resemblance and containment of documents", 1997 —
  * listed in /root/repo/PAPERS.md).
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles (n=3) of the token array. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array_distinct(array(array_join(toks, " "))))

  /** k-wide minhash signature of a shingle array (array<bigint>, length k). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleCol, s => xxhash64(i, s))))

  /** LSH band keys: hash of each r-wide slice of the signature; a shared band
    * key between two docs makes them dedup candidates. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))

  /** Estimated Jaccard similarity from two minhash signatures: fraction of
    * agreeing positions. */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v).cast("double") / size(sigA)

  /** 64-bit simhash packed as 4×16-bit band values (array<bigint>, length 4) —
    * band layout serves both as the fingerprint and as the hamming-LSH key
    * (two docs within hamming distance 3 share ≥1 of 4 bands by pigeonhole). */
  def simhashBands(toks: Column): Column = {
    val hashes = transform(array_distinct(toks), t => xxhash64(t))
    transform(sequence(lit(0), lit(3)), t =>
      aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) => {
        val bitPos = t * 16 + j
        val vote = aggregate(hashes, lit(0L), (a, h) =>
          a + when(bit_get(h, bitPos) === 1, 1L).otherwise(-1L))
        acc * 2 + when(vote > 0, 1L).otherwise(0L)
      }))
  }

  /** Hamming distance between two simhash band arrays. */
  def simhashHamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Deterministic polynomial rolling-hash fingerprint of a string
    * (base 31, mod 1e9+7) — reproducible in plain SQL on any engine. */
  def polyFingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L), (acc, c) => (acc * 31 + c.cast("long")) % 1000000007L)
}
