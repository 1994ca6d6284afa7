package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TIMESTAMP(p>6) — picosecond precision — and TIME WITH TIME ZONE emulation
  * (SURVEY.md §1.2).
  *
  * The reference supports timestamp precisions up to 12 (picoseconds,
  * reference: core/trino-spi/src/main/java/io/trino/spi/type/TimestampType.java:35
  * MAX_PRECISION = 12, stored as (epochMicros, picosOfMicro) in
  * LongTimestamp) while Spark tops out at microseconds. Emulation mirrors the
  * reference's own two-field layout exactly:
  * `struct<micros: bigint, picos: bigint>` with picos ∈ [0, 999999] counting
  * picoseconds WITHIN the microsecond. Struct ordering (micros, then picos)
  * is the correct value ordering, so the emulated type sorts/joins/groups
  * natively.
  *
  * TIME WITH TIME ZONE (reference: spi/type/TimeWithTimeZoneType.java:23 —
  * time-of-day + UTC offset) is `struct<nanos: bigint, offset_minutes:
  * bigint>`: wall-clock nanos-of-day plus the zone offset, compared by the
  * UTC-normalized instant like the reference's comparison operators.
  *
  * All functions are plain codegen'd column expressions — per-row arithmetic,
  * no shuffle implications. Fractions beyond the stated precision TRUNCATE on
  * parse (reference cast semantics round; parse truncates excess digits) and
  * casting down to timestamp(6) rounds HALF-UP on the picos field, matching
  * the reference's round(picos, 6) in Timestamps.java. Pre-1970 instants are
  * out of scope for the fixture surface (negative micros would need floor
  * semantics on the fraction split).
  */
object TimestampPicos {

  /** Parse 'yyyy-MM-dd HH:mm:ss[.f{1,12}]' into struct<micros, picos>. */
  def parsePicos(s: Column): Column = {
    val base = regexp_extract(s, "^([^.]+)", 1)
    val frac12 = rpad(coalesce(regexp_extract(s, "\\.(\\d+)$", 1), lit("")), 12, "0")
    val micros = unix_micros(to_timestamp(base, "yyyy-MM-dd HH:mm:ss")) +
      substring(frac12, 1, 6).cast("long")
    val picos = substring(frac12, 7, 6).cast("long")
    struct(micros.as("micros"), picos.as("picos"))
  }

  /** Render with `p` fractional digits (0 < p <= 12). */
  def formatPicos(tsp: Column, p: Int): Column = {
    val micros = tsp.getField("micros")
    val frac12 = concat(
      lpad((micros % 1000000L).cast("string"), 6, "0"),
      lpad(tsp.getField("picos").cast("string"), 6, "0"))
    val secs = date_format(timestamp_micros(micros - micros % 1000000L), "yyyy-MM-dd HH:mm:ss")
    if (p <= 0) secs else concat(secs, lit("."), substring(frac12, 1, p))
  }

  /** Cast down to Spark-native timestamp(6): HALF-UP on the picos field. */
  def toMicros(tsp: Column): Column =
    timestamp_micros(tsp.getField("micros") +
      when(tsp.getField("picos") >= 500000L, 1L).otherwise(0L))

  /** Add a (possibly negative) picosecond delta with carry into micros. */
  def addPicos(tsp: Column, deltaPicos: Column): Column = {
    val total = tsp.getField("picos") + deltaPicos
    val carry = floor(total.cast("double") / 1000000.0).cast("long")
    struct(
      (tsp.getField("micros") + carry).as("micros"),
      (total - carry * 1000000L).as("picos"))
  }

  // ----------------------------------------------------- TIME WITH TIME ZONE

  /** Parse 'HH:mm:ss[.fff][+HH:MM|-HH:MM]' into struct<nanos, offset_minutes>. */
  def parseTimeTz(s: Column): Column = {
    val m = regexp_extract(s, "^(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d+))?([+-])(\\d{2}):(\\d{2})$", 0)
    def g(i: Int) = regexp_extract(s, "^(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d+))?([+-])(\\d{2}):(\\d{2})$", i)
    val nanos = g(1).cast("long") * 3600000000000L +
      g(2).cast("long") * 60000000000L +
      g(3).cast("long") * 1000000000L +
      rpad(coalesce(g(4), lit("")), 9, "0").cast("long")
    val off = (g(6).cast("long") * 60L + g(7).cast("long")) *
      when(g(5) === "-", -1L).otherwise(1L)
    when(m === "", lit(null)).otherwise(
      struct(nanos.as("nanos"), off.as("offset_minutes")))
  }

  /** UTC-normalized nanos-of-day — the reference's comparison key. */
  def timeTzUtcNanos(t: Column): Column = {
    val day = 86400000000000L
    ((t.getField("nanos") - t.getField("offset_minutes") * 60000000000L) % day + day) % day
  }

  /** Render 'HH:mm:ss.fff+HH:MM'. Spark's `/` is floating-point — every
    * quotient goes through an explicit long cast. */
  def formatTimeTz(t: Column): Column = {
    val n = t.getField("nanos")
    val off = t.getField("offset_minutes")
    val absOff = abs(off)
    def d2(c: Column) = lpad(c.cast("long").cast("string"), 2, "0")
    concat(
      d2(n / 3600000000000L), lit(":"),
      d2(n % 3600000000000L / 60000000000L), lit(":"),
      d2(n % 60000000000L / 1000000000L), lit("."),
      lpad((n % 1000000000L / 1000000L).cast("long").cast("string"), 3, "0"),
      when(off < 0, "-").otherwise("+"),
      d2(absOff / 60L), lit(":"),
      d2(absOff % 60L))
  }
}
