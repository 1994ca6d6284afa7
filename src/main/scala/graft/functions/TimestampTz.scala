package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TIMESTAMP WITH TIME ZONE emulation (SURVEY.md §1.2).
  *
  * Spark has no zone-preserving timestamp type (TimestampType is an instant
  * rendered in the session zone), while the reference's timestamp-with-tz
  * carries the zone with the value
  * (reference: core/trino-spi/src/main/java/io/trino/spi/type/TimestampWithTimeZoneType.java).
  * Emulation: `struct<utc_micros: bigint, zone: string>` — instant + zone,
  * exactly the reference's packed (millisUtc, zoneKey) encoding, widened to
  * micros. All operations are plain column expressions over the struct, so
  * the type flows through joins/aggregations/shuffles like any other value.
  *
  * Function surface mirrors the reference's DateTimeFunctions
  * (reference: core/trino-main/src/main/java/io/trino/operator/scalar/DateTimeFunctions.java:72):
  *  - with_timezone(localTs, zone) — interpret a wall-clock timestamp in a
  *    zone, producing the instant+zone value.
  *  - at_timezone(tstz, zone)     — same instant, displayed zone changed.
  *  - tstz_local(tstz)            — wall-clock rendering in the carried zone.
  *  - tstz_format(tstz, fmt)      — zone-aware format_datetime.
  *
  * Scale: purely per-row codegen'd arithmetic (Spark's own tz conversion
  * intrinsics); no shuffle implications. DST handling comes from the JVM's
  * IANA tzdb, matching the oracle's ICU tzdb.
  */
object TimestampTz {

  /** Interpret `localTs` (a naive wall-clock timestamp) in `zone`. */
  def withTimezone(localTs: Column, zone: Column): Column =
    struct(
      unix_micros(to_utc_timestamp(localTs, zone)).as("utc_micros"),
      zone.as("zone"))

  /** Same instant, carried zone changed (reference at_timezone). */
  def atTimezone(tstz: Column, zone: Column): Column =
    struct(tstz.getField("utc_micros").as("utc_micros"), zone.as("zone"))

  /** Wall-clock timestamp of the instant in its carried zone. */
  def tstzLocal(tstz: Column): Column =
    from_utc_timestamp(timestamp_micros(tstz.getField("utc_micros")), tstz.getField("zone"))

  /** Zone-aware rendering: local wall time + the carried zone id. */
  def tstzFormat(tstz: Column, fmt: String): Column =
    concat(date_format(tstzLocal(tstz), fmt), lit(" "), tstz.getField("zone"))
}
