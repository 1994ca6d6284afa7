package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregate functions (SURVEY.md §2.4 gap list).
  *
  * Reference counterparts:
  *  - reduce_agg (reference: core/trino-main/src/main/java/io/trino/operator/
  *    aggregation/ReduceAggregationFunction.java:49): user-supplied
  *    fold — here a typed `Aggregator` over bigint with caller-supplied
  *    reduce function. Spark's Aggregator contract (zero/reduce/merge) maps
  *    1:1 onto the reference's (initial, input_fn, combine_fn) triple; the
  *    function must be commutative+associative for the distributed merge to
  *    be deterministic, exactly as the reference documents for combine_fn.
  *  - checksum (reference: operator/aggregation/ChecksumAggregationFunction.java):
  *    order-independent XOR of per-row hashes. The fast path hashes with
  *    XXH64 (engine-internal, like the reference); the portable variant uses
  *    an md5-prefix hash both our engine and the DuckDB oracle can compute,
  *    making checksum results hash-comparable across engines.
  *
  * Scale: Aggregator-based UDAFs participate in partial aggregation — the
  * buffer is a single long, so map-side combine reduces each partition to
  * |groups| longs before the shuffle.
  */
object AggregateFunctions {

  /** Large prime for modular-product folds (fits 31 bits; products of two
    * residues fit comfortably in a long). */
  val ModP: Long = 1000000007L

  private class LongReduceAgg(zeroVal: Long, f: (Long, Long) => Long)
      extends Aggregator[Long, Long, Long] {
    def zero: Long = zeroVal
    def reduce(b: Long, a: Long): Long = f(b, a)
    def merge(b1: Long, b2: Long): Long = f(b1, b2)
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** reduce_agg over a BIGINT column: fold with `f` from `zeroVal`.
    * `f` must be commutative + associative (it is used as both the per-row
    * reduce and the cross-partition merge). */
  def reduceAggLong(c: Column, zeroVal: Long, f: (Long, Long) => Long): Column =
    udaf(new LongReduceAgg(zeroVal, f), Encoders.scalaLong).apply(c)

  /** Modular product fold — an exact, order-independent "product" usable as a
    * reduce_agg demonstration with a portable oracle. */
  def modProduct(c: Column): Column =
    reduceAggLong(c, 1L, (a, b) => (a * b) % ModP)

  /** XOR fold (equivalent to bit_xor, expressed through reduce_agg). */
  def xorAgg(c: Column): Column =
    reduceAggLong(c, 0L, _ ^ _)

  /** Order-independent checksum: XOR of XXH64 row hashes (engine-internal,
    * fast path — mirrors the reference's checksum()). */
  def checksum(c: Column): Column = bit_xor(xxhash64(c))

  /** Portable checksum: XOR of the first 60 bits of md5, computable
    * identically in any engine with md5 + hex parsing. */
  def checksumPortable(c: Column): Column =
    bit_xor(conv(substring(md5(c), 1, 15), 16, 10).cast("long"))
}
