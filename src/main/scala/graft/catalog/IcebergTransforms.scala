package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg partition transforms (spec §Partition Transforms; reference
  * plugin/trino-iceberg PartitionFields/PartitionTransforms): the bucket
  * hash is murmur3_x86_32 over the value's little-endian 8-byte form with
  * seed 0 (int/long/date widen to long; published spec vector:
  * hash(34) = 2017239379), then `(h & Int.MaxValue) % N`; truncate[W] is
  * floor-to-width `v - (((v % W) + W) % W)`. */
object IcebergTransforms {

  val Bucket = """bucket\[(\d+)\]""".r
  val Truncate = """truncate\[(\d+)\]""".r
  val Temporal = Set("year", "month", "day", "hour")

  /** Spark's Murmur3_x86_32.hashLong consumes the long as two little-endian
    * int blocks — exactly the spec's hashBytes(littleEndian(v)); asserted
    * against the spec vector in IcebergReadSpec. */
  def hashLong(v: Long): Int =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 0)

  def bucketOf(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n

  def truncateOf(v: Long, w: Long): Long = v - (((v % w) + w) % w)

  /** The spec field name convention for a transform over `source`
    * (Iceberg's own naming: `col_bucket`, `col_trunc`). */
  def fieldName(source: String, transform: String): String = transform match {
    case "identity" => source
    case Bucket(_) => s"${source}_bucket"
    case Truncate(_) => s"${source}_trunc"
    case t if Temporal(t) => s"${source}_$t"
    case "void" => s"${source}_null" // spec: void's field name suffix
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other'")
  }

  /** Column expression computing the transformed partition value (codegen'd
    * Catalyst nodes, no UDF): used by the write path to direct rows into
    * partition directories. */
  def transformColumn(c: Column, transform: String): Column = transform match {
    case "identity" => c
    case Bucket(n) =>
      import org.apache.spark.sql.graft.ColumnBridge
      val h = ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
          Seq(ColumnBridge.expression(c.cast("long"))), 0))
      (h.bitwiseAND(lit(Integer.MAX_VALUE)) % lit(n.toInt)).cast("int")
    case Truncate(w) =>
      val lw = lit(w.toLong)
      (c.cast("long") - (((c.cast("long") % lw) + lw) % lw))
    // temporal transforms over DATE sources (spec: counts from 1970)
    case "year" => (year(c) - lit(1970)).cast("int")
    case "month" => ((year(c) - lit(1970)) * lit(12) + month(c) - lit(1)).cast("int")
    case "day" => datediff(c, to_date(lit("1970-01-01"))).cast("int")
    // hour counts from 1970-01-01 00:00:00 over a TIMESTAMP source
    // (spec §Partition Transforms); exact floorDiv on epoch seconds
    case "hour" =>
      val secs = c.cast("long")
      val w = lit(3600L)
      ((secs - (((secs % w) + w) % w)) / w).cast("int")
    // void always produces null — the spec's drop-a-field evolution tool
    case "void" => lit(null).cast("int")
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other'")
  }

  /** Can a file whose partition value is `pv` hold rows in [lo, hi] on the
    * SOURCE column? False ⇒ the file is provably prunable. */
  def mayMatch(transform: String, pv: Long,
      lo: Option[Long], hi: Option[Long]): Boolean = transform match {
    case "identity" =>
      !(hi.exists(pv > _) || lo.exists(pv < _))
    case Bucket(n) =>
      // only an equality point prunes a bucket: range order is destroyed
      (lo, hi) match {
        case (Some(l), Some(h)) if l == h => pv == bucketOf(l, n.toInt)
        case _ => true
      }
    case Truncate(w) =>
      val width = w.toLong
      !(hi.exists(pv > _) || lo.exists(pv + width - 1 < _))
    // temporal: pv covers a DAY RANGE of the source date column (prune
    // bounds for date columns are epoch days, matching the stats codec)
    case "year" =>
      val first = java.time.LocalDate.of(1970 + pv.toInt, 1, 1).toEpochDay
      val last = java.time.LocalDate.of(1970 + pv.toInt, 12, 31).toEpochDay
      !(hi.exists(first > _) || lo.exists(last < _))
    case "month" =>
      val y = 1970 + java.lang.Math.floorDiv(pv.toInt, 12)
      val m = java.lang.Math.floorMod(pv.toInt, 12) + 1
      val firstD = java.time.LocalDate.of(y, m, 1)
      val first = firstD.toEpochDay
      val last = firstD.plusMonths(1).minusDays(1).toEpochDay
      !(hi.exists(first > _) || lo.exists(last < _))
    case "day" =>
      !(hi.exists(pv > _) || lo.exists(pv < _))
    // hour/void: no pruning — hour's source bounds are timestamp-encoded
    // (a convention no caller passes yet) and void carries no information;
    // returning true is never wrong
    case _ => true // unknown transforms never prune (never wrong)
  }
}
