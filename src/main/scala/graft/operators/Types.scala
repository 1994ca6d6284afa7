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

  val queries: Map[String, Q] = Map(
    "q_type_variant" -> q_type_variant _,
    "q_type_char" -> q_type_char _,
    "q_type_time" -> q_type_time _,
    "q_type_tstz" -> q_type_tstz _,
    "q_type_decimal" -> q_type_decimal _)

  val oracles: Map[String, String] = Map(
    "q_type_variant" -> qTypeVariantSql,
    "q_type_char" -> qTypeCharSql,
    "q_type_time" -> qTypeTimeSql,
    "q_type_tstz" -> qTypeTstzSql,
    "q_type_decimal" -> qTypeDecimalSql)
}
