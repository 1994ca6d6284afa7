package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-system gap layer (SURVEY.md §1.2): char(n) comparison semantics and
  * the TIME-of-day type.
  *
  *  - char(n) (reference: core/trino-spi/src/main/java/io/trino/spi/type/
  *    CharType.java): blank-padded storage with pad-insensitive comparison.
  *    Spark's CharType is DDL-only, so the engine normalizes: `rpad` on
  *    write/compare, `rtrim` equality — exactly the semantics the reference
  *    implements in its Char comparison operators.
  *  - TIME(p) (reference: spi/type/TimeType.java — p ≤ 12, stored as
  *    picos-of-day): Spark has no time-of-day type; represented as
  *    nanos-of-day BIGINT + a function set (hour/minute/second extraction,
  *    wrap-around arithmetic), the representation SURVEY.md §1.2 prescribes.
  */
object Types {

  /** char(10) semantics over mktsegment values. */
  def q_type_char(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "customer").filter($"c_custkey" <= 500)
      .withColumn("seg_char10", rpad($"c_mktsegment", 10, " "))
      .select($"c_custkey",
        concat(lit("["), $"seg_char10", lit("]")).as("padded_display"),
        length($"seg_char10").cast("long").as("stored_len"),
        length($"c_mktsegment").cast("long").as("logical_len"),
        (rtrim($"seg_char10") === $"c_mktsegment").as("pad_insensitive_eq"),
        (rpad(lit("BUILDING"), 10, " ") === $"seg_char10").as("eq_building_char"))
      .orderBy($"c_custkey")
  }
  val qTypeCharSql: String =
    """SELECT c_custkey,
       '[' || rpad(c_mktsegment, 10, ' ') || ']' AS padded_display,
       CAST(length(rpad(c_mktsegment, 10, ' ')) AS BIGINT) AS stored_len,
       CAST(length(c_mktsegment) AS BIGINT) AS logical_len,
       rtrim(rpad(c_mktsegment, 10, ' ')) = c_mktsegment AS pad_insensitive_eq,
       rpad('BUILDING', 10, ' ') = rpad(c_mktsegment, 10, ' ') AS eq_building_char
       FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey"""

  /** TIME-of-day as nanos-of-day bigint + function set over event timestamps. */
  def q_type_time(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayNanos = 86400000000000L
    table(s, dir, "events").filter($"event_id" < 2000)
      .withColumn("us_of_day", expr("unix_micros(ts) % 86400000000"))
      .withColumn("time_ns", $"us_of_day" * 1000L)
      .select($"event_id", $"time_ns",
        ($"time_ns" / 3600000000000L).cast("long").as("t_hour"),
        ($"time_ns" % 3600000000000L / 60000000000L).cast("long").as("t_minute"),
        ($"time_ns" % 60000000000L / 1000000000L).cast("long").as("t_second"),
        (($"time_ns" + 2L * 3600000000000L) % dayNanos).as("plus_2h_wrapped"),
        hour($"ts").cast("long").as("hour_check"))
      .orderBy($"event_id")
  }
  val qTypeTimeSql: String =
    """WITH t AS (
         SELECT event_id, epoch_us(ts) % 86400000000 AS us_of_day, ts
         FROM events WHERE event_id < 2000)
       SELECT event_id, us_of_day * 1000 AS time_ns,
         us_of_day * 1000 // 3600000000000 AS t_hour,
         us_of_day * 1000 % 3600000000000 // 60000000000 AS t_minute,
         us_of_day * 1000 % 60000000000 // 1000000000 AS t_second,
         (us_of_day * 1000 + 2 * 3600000000000) % 86400000000000 AS plus_2h_wrapped,
         CAST(hour(ts) AS BIGINT) AS hour_check
       FROM t ORDER BY event_id"""

  /** Exact decimal arithmetic semantics (reference: spi/type/DecimalType.java
    * — Int128-backed exact decimals, max precision 38, HALF_UP rounding).
    * Multiplication/addition widen exactly; scale reduction goes through
    * round() (round-half-away in both engines — decimal CAST disagrees at the
    * .5 boundary: Spark HALF_UP vs DuckDB truncation, so casts that drop
    * scale are NOT portable and the engine avoids them); division is done in
    * IEEE double, bit-identical everywhere. */
  def q_type_decimal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    table(s, dir, "lineitem").filter($"l_orderkey" <= 2000)
      .select($"l_orderkey", $"l_linenumber",
        asDouble((dec($"l_extendedprice") * dec($"l_discount")).cast(DecimalType(25, 4))).as("exact_mul"),
        asDouble(dec($"l_extendedprice") + dec($"l_tax")).as("exact_add"),
        asDouble(round(dec($"l_extendedprice") * dec($"l_discount"), 2)).as("half_away_round"),
        ($"l_extendedprice" / $"l_quantity").as("ieee_div"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val qTypeDecimalSql: String =
    """SELECT l_orderkey, l_linenumber,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4)) AS DOUBLE) AS exact_mul,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)) AS DOUBLE) AS exact_add,
       CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)), 2) AS DOUBLE) AS half_away_round,
       l_extendedprice / l_quantity AS ieee_div
       FROM lineitem WHERE l_orderkey <= 2000
       ORDER BY l_orderkey, l_linenumber"""

  /** VARIANT open type (reference: spi/type/VariantType.java:51 → Spark 4
    * VariantType, a direct mapping per SURVEY §1.2): parse_json into a
    * variant column, typed path extraction via variant_get, canonical
    * re-serialization. The oracle states the expected values from the json
    * text directly. */
  def q_type_variant(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_id,
         variant_get(parse_json(props), '$.k', 'bigint') AS k,
         variant_get(parse_json(props), '$.k', 'string') AS k_str,
         variant_get(parse_json(props), '$.missing', 'bigint') AS missing,
         to_json(parse_json(props)) AS canonical
         FROM events WHERE event_id < 2000
         ORDER BY event_id""")
  }
  val qTypeVariantSql: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.k') AS k_str,
       CAST(NULL AS BIGINT) AS missing,
       '{"k":' || json_extract_string(props, '$.k') || '}' AS canonical
       FROM events WHERE event_id < 2000
       ORDER BY event_id"""

  /** TIMESTAMP WITH TIME ZONE (struct<utc_micros, zone> emulation — see
    * graft.functions.TimestampTz). Events get a deterministic zone; the query
    * exercises with_timezone (wall→instant), at_timezone (instant re-zoned),
    * zone-aware formatting, and an instant-preservation roundtrip boolean.
    * DuckDB's ICU timezone() reproduces every conversion. */
  def q_type_tstz(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TimestampTz._
    val zones = array(lit("UTC"), lit("America/New_York"), lit("Europe/Paris"), lit("Asia/Tokyo"))
    val e = table(s, dir, "events")
      .filter($"event_id" < 2000)
      .withColumn("zone", element_at(zones, ($"event_id" % 4 + 1).cast("int")))
    // ts is a UTC instant: carry it with the assigned zone
    val tstz = struct(unix_micros($"ts").as("utc_micros"), $"zone".as("zone"))
    e.select(
        $"event_id",
        tstz.getField("utc_micros").as("utc_micros"),
        tstzFormat(tstz, "yyyy-MM-dd HH:mm:ss").as("local_str"),
        tstzFormat(atTimezone(tstz, lit("Asia/Tokyo")), "yyyy-MM-dd HH:mm:ss").as("tokyo_str"),
        // wall→instant→wall roundtrip must preserve the instant
        (withTimezone(tstzLocal(tstz), $"zone").getField("utc_micros") ===
          tstz.getField("utc_micros")).as("roundtrip_ok"))
      .orderBy($"event_id")
  }
  val qTypeTstzSql: String =
    """WITH z AS (
         SELECT event_id, ts,
           ['UTC', 'America/New_York', 'Europe/Paris', 'Asia/Tokyo'][CAST(event_id % 4 + 1 AS INT)] AS zone
         FROM events WHERE event_id < 2000)
       SELECT event_id,
         epoch_us(ts) AS utc_micros,
         strftime(timezone(zone, ts::TIMESTAMPTZ), '%Y-%m-%d %H:%M:%S') || ' ' || zone AS local_str,
         strftime(timezone('Asia/Tokyo', ts::TIMESTAMPTZ), '%Y-%m-%d %H:%M:%S') || ' Asia/Tokyo' AS tokyo_str,
         TRUE AS roundtrip_ok
       FROM z ORDER BY event_id"""

  /** TIMESTAMP(12) — picosecond precision — and TIME WITH TIME ZONE
    * (struct emulations, graft.functions.TimestampPicos; reference
    * spi/type/TimestampType.java:35 MAX_PRECISION=12 stored as
    * (epochMicros, picosOfMicro), spi/type/TimeWithTimeZoneType.java:23).
    * Both engines derive the same 12-digit-fraction timestamp strings and
    * offset time strings from event rows; the query parses, formats (exact
    * roundtrip), half-up-casts to timestamp(6), carries picos addition into
    * micros, orders by the struct, and UTC-normalizes time-with-tz values.
    * The oracle replays the identical integer/string arithmetic. */
  def q_type_ts_picos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TimestampPicos._
    val e = table(s, dir, "events").filter($"event_id" < 2000)
      .withColumn("frac12",
        lpad(($"event_id" * 999983L % 1000000000000L).cast("string"), 12, "0"))
      .withColumn("ts_str",
        concat(date_format($"ts", "yyyy-MM-dd HH:mm:ss"), lit("."), $"frac12"))
      .withColumn("off_min", (($"event_id" % 25L) - 12L) * 30L)
      .withColumn("twtz_str", concat(
        date_format($"ts", "HH:mm:ss"), lit("."),
        lpad(($"event_id" % 1000L).cast("string"), 3, "0"),
        when($"off_min" < 0, "-").otherwise("+"),
        lpad((abs($"off_min") / 60L).cast("long").cast("string"), 2, "0"), lit(":"),
        lpad((abs($"off_min") % 60L).cast("string"), 2, "0")))
    val tsp = parsePicos($"ts_str")
    val twtz = parseTimeTz($"twtz_str")
    e.select($"event_id",
        tsp.getField("micros").as("micros"),
        tsp.getField("picos").as("picos"),
        formatPicos(tsp, 12).as("p12_str"),
        (formatPicos(tsp, 12) === $"ts_str").as("roundtrip_ok"),
        unix_micros(toMicros(tsp)).as("rounded_us"),
        formatPicos(addPicos(tsp, lit(999999L)), 12).as("plus_ps_str"),
        (addPicos(tsp, lit(1L)) > tsp).as("order_ok"),
        timeTzUtcNanos(twtz).as("twtz_utc_nanos"),
        (formatTimeTz(twtz) === $"twtz_str").as("twtz_roundtrip_ok"))
      .orderBy($"event_id")
  }
  val qTypeTsPicosSql: String =
    """WITH b AS (
         SELECT event_id,
           lpad(CAST(event_id * 999983 % 1000000000000 AS VARCHAR), 12, '0') AS frac12,
           epoch_us(date_trunc('second', ts)) AS sec_us,
           epoch_us(ts) % 86400000000 // 1000000 AS sec_of_day,
           (event_id % 25 - 12) * 30 AS off_min,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS sec_str,
           strftime(ts, '%H:%M:%S') AS tod_str
         FROM events WHERE event_id < 2000),
       p AS (
         SELECT *,
           sec_us + CAST(substr(frac12, 1, 6) AS BIGINT) AS micros,
           CAST(substr(frac12, 7, 6) AS BIGINT) AS picos,
           sec_of_day * 1000000000 + (event_id % 1000) * 1000000 AS nanos
         FROM b),
       q AS (
         SELECT *,
           micros + (picos + 999999) // 1000000 AS micros2,
           (picos + 999999) % 1000000 AS picos2
         FROM p)
       SELECT event_id, micros, picos,
         sec_str || '.' || frac12 AS p12_str,
         TRUE AS roundtrip_ok,
         micros + CASE WHEN picos >= 500000 THEN 1 ELSE 0 END AS rounded_us,
         strftime(make_timestamp(micros2 - micros2 % 1000000), '%Y-%m-%d %H:%M:%S')
           || '.' || lpad(CAST(micros2 % 1000000 AS VARCHAR), 6, '0')
           || lpad(CAST(picos2 AS VARCHAR), 6, '0') AS plus_ps_str,
         TRUE AS order_ok,
         ((nanos - off_min * 60000000000) % 86400000000000 + 86400000000000)
           % 86400000000000 AS twtz_utc_nanos,
         TRUE AS twtz_roundtrip_ok
       FROM q ORDER BY event_id"""

  val queries: Map[String, Q] = Map(
    "q_type_ts_picos" -> q_type_ts_picos _,
    "q_type_variant" -> q_type_variant _,
    "q_type_char" -> q_type_char _,
    "q_type_time" -> q_type_time _,
    "q_type_tstz" -> q_type_tstz _,
    "q_type_decimal" -> q_type_decimal _)

  val oracles: Map[String, String] = Map(
    "q_type_ts_picos" -> qTypeTsPicosSql,
    "q_type_variant" -> qTypeVariantSql,
    "q_type_char" -> qTypeCharSql,
    "q_type_time" -> qTypeTimeSql,
    "q_type_tstz" -> qTypeTstzSql,
    "q_type_decimal" -> qTypeDecimalSql)
}
