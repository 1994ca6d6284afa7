package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function bundles, part 3 — the residual reference surface found by
  * sweeping `@ScalarFunction` names against rounds 1-3 coverage:
  *
  *  - luhn_check (reference operator/scalar/LuhnCheckFunction.java)
  *  - translate (CharacterStringCasts/TranslateFunction.java)
  *  - human_readable_seconds, parse_duration, to_milliseconds,
  *    last_day_of_month, to_iso8601, from_iso8601_timestamp
  *    (DateTimeFunctions.java)
  *  - to/from_big_endian_64 (VarbinaryFunctions.java)
  *  - array_last, trim_array, combinations (ArrayFunctions family)
  *  - json_size, json_array_get, is_json_scalar (JsonFunctions.java)
  *
  * Everything is composed from codegen'd built-ins/HOFs (no UDFs); the
  * DuckDB oracle recomputes each semantics from first principles.
  */
object Functions3 {

  def q_fn_scalar3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer").filter($"c_custkey" <= 300)
      // a deterministic digit string per row (payload + Luhn check digit)
      .withColumn("digits", lpad(($"c_custkey" * 37 % 100000000L).cast("string"), 8, "0"))
      .withColumn("secs", ($"c_custkey" * 7919L) % 900000L)
      .withColumn("dur_str", concat((($"c_custkey" % 120) + 1).cast("string"),
        element_at(array(lit("s"), lit("m"), lit("h"), lit("d")),
          ($"c_custkey" % 4 + 1).cast("int"))))
      .withColumn("d", to_date(concat(lit("2024-"),
        lpad(($"c_custkey" % 12 + 1).cast("string"), 2, "0"), lit("-"),
        lpad(($"c_custkey" % 27 + 1).cast("string"), 2, "0"))))
      .withColumn("jdoc", concat(lit("""{"a": [10, 20, 30], "b": {"x": 1, "y": 2}, "c": 5}""")))
    // Luhn checksum (reference LuhnCheckFunction.java): from the rightmost
    // digit, double every second digit (subtracting 9 above 9); valid iff
    // the sum % 10 == 0. Positions from the right, 1-based.
    val rev = reverse($"digits")
    val luhnSum = aggregate(
      transform(sequence(lit(1), length($"digits")), i => {
        val dig = element_at(split(rev, ""), i).cast("long")
        when(i % 2 === 0, when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
      }),
      lit(0L), (a, x) => a + x)
    val durVal = regexp_extract($"dur_str", "^(\\d+)", 1).cast("long")
    val durUnit = regexp_extract($"dur_str", "([a-z]+)$", 1)
    val durSecs = durVal * element_at(
      map(lit("s"), lit(1L), lit("m"), lit(60L), lit("h"), lit(3600L), lit("d"), lit(86400L)),
      durUnit)
    val weeks = ($"secs" / 604800L).cast("long")
    val days = ($"secs" % 604800L / 86400L).cast("long")
    val hours = ($"secs" % 86400L / 3600L).cast("long")
    val mins = ($"secs" % 3600L / 60L).cast("long")
    val secs2 = ($"secs" % 60L).cast("long")
    def unit(n: Column, name: String) = when(n > 0,
      concat(n.cast("string"), lit(" "), lit(name), when(n === 1, "").otherwise(lit("s"))))
    val human = when($"secs" === 0, "0 seconds").otherwise(concat_ws(", ",
      unit(weeks, "week"), unit(days, "day"), unit(hours, "hour"),
      unit(mins, "minute"), unit(secs2, "second")))
    c.select($"c_custkey", $"digits",
        (luhnSum % 10 === 0).as("luhn_ok"),
        translate($"c_mktsegment", "AEIOU", "aeiou").as("translated"),
        human.as("human_secs"),
        durSecs.as("dur_secs"),
        to_date(last_day($"d")).cast("string").as("month_end"),
        date_format($"d", "yyyy-MM-dd").as("iso_date"),
        unix_timestamp(to_timestamp(concat($"d".cast("string"), lit("T12:30:00+02:00")),
          "yyyy-MM-dd'T'HH:mm:ssXXX")).as("iso_ts_epoch"),
        lpad(hex($"c_custkey"), 16, "0").as("be64_hex"),
        conv(lpad(hex($"c_custkey"), 16, "0"), 16, 10).cast("long").as("be64_roundtrip"),
        element_at(split($"digits", ""), -1).as("arr_last"),
        concat_ws("", slice(split($"digits", ""), 1, 6)).as("trimmed2"),
        (length($"digits") * (length($"digits") - 1) / 2).cast("long").as("n_pairs"),
        get_json_object($"jdoc", "$.a[1]").cast("long").as("json_arr_get"),
        json_array_length(get_json_object($"jdoc", "$.a")).cast("long").as("json_size_a"),
        (get_json_object($"jdoc", "$.c") === "5").as("is_scalar_c"))
      .orderBy($"c_custkey")
  }
  val qFnScalar3Sql: String =
    """WITH b AS (
         SELECT c_custkey, c_mktsegment,
           lpad(CAST(c_custkey * 37 % 100000000 AS VARCHAR), 8, '0') AS digits,
           (c_custkey * 7919) % 900000 AS secs,
           CAST((c_custkey % 120) + 1 AS VARCHAR) ||
             ['s', 'm', 'h', 'd'][CAST(c_custkey % 4 + 1 AS INT)] AS dur_str,
           CAST('2024-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-'
             || lpad(CAST(c_custkey % 27 + 1 AS VARCHAR), 2, '0') AS DATE) AS d
         FROM customer WHERE c_custkey <= 300),
       l AS (
         SELECT *,
           list_reduce(list_prepend(0, [
             CASE WHEN i % 2 = 0
                  THEN CASE WHEN CAST(digits[9 - i] AS BIGINT) * 2 > 9
                            THEN CAST(digits[9 - i] AS BIGINT) * 2 - 9
                            ELSE CAST(digits[9 - i] AS BIGINT) * 2 END
                  ELSE CAST(digits[9 - i] AS BIGINT) END
             for i in range(1, 9)]), (a, x) -> a + x) AS luhn_sum,
           CAST(regexp_extract(dur_str, '^(\d+)', 1) AS BIGINT) AS dur_val,
           regexp_extract(dur_str, '([a-z]+)$', 1) AS dur_unit,
           secs // 604800 AS w, secs % 604800 // 86400 AS dd,
           secs % 86400 // 3600 AS hh, secs % 3600 // 60 AS mi, secs % 60 AS ss
         FROM b)
       SELECT c_custkey, digits,
         luhn_sum % 10 = 0 AS luhn_ok,
         replace(replace(replace(replace(replace(c_mktsegment,
           'A', 'a'), 'E', 'e'), 'I', 'i'), 'O', 'o'), 'U', 'u') AS translated,
         CASE WHEN secs = 0 THEN '0 seconds' ELSE
           array_to_string([x FOR x IN [
             CASE WHEN w > 0 THEN w || ' week' || CASE WHEN w = 1 THEN '' ELSE 's' END END,
             CASE WHEN dd > 0 THEN dd || ' day' || CASE WHEN dd = 1 THEN '' ELSE 's' END END,
             CASE WHEN hh > 0 THEN hh || ' hour' || CASE WHEN hh = 1 THEN '' ELSE 's' END END,
             CASE WHEN mi > 0 THEN mi || ' minute' || CASE WHEN mi = 1 THEN '' ELSE 's' END END,
             CASE WHEN ss > 0 THEN ss || ' second' || CASE WHEN ss = 1 THEN '' ELSE 's' END END
           ] IF x IS NOT NULL], ', ') END AS human_secs,
         dur_val * CASE dur_unit WHEN 's' THEN 1 WHEN 'm' THEN 60
                                 WHEN 'h' THEN 3600 WHEN 'd' THEN 86400 END AS dur_secs,
         CAST(last_day(d) AS VARCHAR) AS month_end,
         strftime(d, '%Y-%m-%d') AS iso_date,
         CAST(epoch(CAST(CAST(d AS VARCHAR) || ' 12:30:00+02:00' AS TIMESTAMPTZ)) AS BIGINT) AS iso_ts_epoch,
         lpad(upper(to_hex(c_custkey)), 16, '0') AS be64_hex,
         c_custkey AS be64_roundtrip,
         digits[8] AS arr_last,
         substr(digits, 1, 6) AS trimmed2,
         CAST(8 * 7 / 2 AS BIGINT) AS n_pairs,
         CAST(20 AS BIGINT) AS json_arr_get,
         CAST(3 AS BIGINT) AS json_size_a,
         TRUE AS is_scalar_c
       FROM l ORDER BY c_custkey"""

  /** Scalar sweep 4 — binary codecs and multimap builders (reference
    * operator/scalar/VarbinaryFunctions.java toIEEE754Binary64/32 +
    * toBigEndian32, SplitToMultimapFunction.java,
    * MultimapFromEntriesFunction.java, ArrayHistogramFunction.java).
    * IEEE-754 bit patterns are checked two ways: constant known-answer
    * vectors (1.0 → 3FF0…, -0.5 → BF000000) and per-row roundtrips the
    * oracle can recompute without bit-level SQL. */
  def q_fn_scalar4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    table(s, dir, "customer").filter($"c_custkey" <= 300)
      .withColumn("digits", lpad(($"c_custkey" * 37 % 100000000L).cast("string"), 8, "0"))
      .withColumn("mm", expr(
        "split_to_multimap(concat('seg=', c_mktsegment, ';id=', c_custkey, ';seg=', c_name), ';', '=')"))
      .withColumn("mfe", expr(
        """multimap_from_entries(array(named_struct('k', 'a', 'v', c_custkey),
          named_struct('k', 'b', 'v', c_custkey * 2),
          named_struct('k', 'a', 'v', c_custkey + 1)))"""))
      .select($"c_custkey",
        expr("hex(to_ieee754_64(CAST(1.0 AS DOUBLE)))").as("ka_ieee64"),
        expr("hex(to_ieee754_32(CAST(-0.5 AS DOUBLE)))").as("ka_ieee32"),
        expr("from_ieee754_64(to_ieee754_64(CAST(c_acctbal AS DOUBLE)))").as("rt64"),
        expr("from_ieee754_32(to_ieee754_32(CAST(c_custkey AS DOUBLE) + 0.25))").as("rt32"),
        expr("hex(to_big_endian_32(CAST(c_custkey AS INT)))").as("be32_hex"),
        expr("hex(to_big_endian_32(CAST(-c_custkey AS INT)))").as("be32_neg_hex"),
        expr("from_big_endian_32(to_big_endian_32(CAST(c_custkey AS INT) - 150))").as("be32_rt"),
        expr("array_join(element_at(mm, 'seg'), ',')").as("mm_seg"),
        expr("array_join(element_at(mm, 'id'), ',')").as("mm_id"),
        expr("array_join(map_keys(mm), ',')").as("mm_keys"),
        expr("array_join(transform(element_at(mfe, 'a'), x -> CAST(x AS STRING)), ',')").as("mfe_a"),
        expr("array_join(transform(element_at(mfe, 'b'), x -> CAST(x AS STRING)), ',')").as("mfe_b"),
        expr("element_at(array_histogram(split(digits, '')), '7')").as("hist_sevens"))
      .orderBy($"c_custkey")
  }
  val qFnScalar4Sql: String =
    """SELECT c_custkey,
         '3FF0000000000000' AS ka_ieee64,
         'BF000000' AS ka_ieee32,
         CAST(c_acctbal AS DOUBLE) AS rt64,
         CAST(CAST(c_custkey AS DOUBLE) + 0.25 AS REAL) AS rt32,
         lpad(upper(to_hex(c_custkey)), 8, '0') AS be32_hex,
         lpad(upper(to_hex((4294967296 - c_custkey) % 4294967296)), 8, '0') AS be32_neg_hex,
         CAST(c_custkey - 150 AS INT) AS be32_rt,
         c_mktsegment || ',' || c_name AS mm_seg,
         CAST(c_custkey AS VARCHAR) AS mm_id,
         'seg,id' AS mm_keys,
         CAST(c_custkey AS VARCHAR) || ',' || CAST(c_custkey + 1 AS VARCHAR) AS mfe_a,
         CAST(c_custkey * 2 AS VARCHAR) AS mfe_b,
         (SELECT NULLIF(count(*), 0) FROM unnest(string_split(
            lpad(CAST(c_custkey * 37 % 100000000 AS VARCHAR), 8, '0'), '')) AS t(ch)
          WHERE ch = '7') AS hist_sevens
       FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""

  /** Bing tile family (reference plugin/trino-geospatial/BingTileFunctions
    * .java:86-344): bing_tile_at / quadkey / coordinates / polygon envelope /
    * tiles_around, over deterministic per-customer coordinates. The oracle
    * replays the Microsoft web-mercator projection in DuckDB (same double
    * math); quadkey⇄tile and parent-prefix relations are checked as
    * invariants the oracle pins to TRUE. */
  def q_fn_bing_tiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.BingTiles._
    val c = table(s, dir, "customer").filter($"c_custkey" <= 2000)
      .withColumn("lat", (($"c_custkey" * 7 % 170) - 85 + lit(0.5)).cast("double"))
      .withColumn("lon", (($"c_custkey" * 13 % 360) - 180 + lit(0.5)).cast("double"))
      .withColumn("zoom", (lit(10) + $"c_custkey" % 6).cast("int"))
      .withColumn("tile", bingTileAt($"lat", $"lon", $"zoom"))
      .withColumn("qk", tileQuadkey($"tile"))
    val parent = bingTile(floor($"tile.x" / 2).cast("int"), floor($"tile.y" / 2).cast("int"),
      $"tile.zoom" - 1)
    c.select($"c_custkey",
        $"tile.x".as("tile_x"), $"tile.y".as("tile_y"),
        tileZoomLevel($"tile").as("zoom_level"),
        $"qk".as("quadkey"),
        (bingTileFromQuadkey($"qk") === $"tile").as("qk_roundtrip_ok"),
        (tileQuadkey(parent) === $"qk".substr(lit(1), length($"qk") - 1))
          .as("parent_prefix_ok"),
        tilePolygon($"tile").getField("min_lon").as("env_min_lon"),
        tilePolygon($"tile").getField("max_lon").as("env_max_lon"),
        // mercator y-fractions of the tile edges: exact rational (replayable
        // bit-for-bit); the atan∘exp latitude corners are engine-side libm
        // (JVM vs DuckDB differ in the last ulp), so they are verified as
        // ordering + point-containment invariants instead of raw doubles
        ($"tile.y" * 256.0 / (lit(256.0) * pow(lit(2.0), $"zoom"))).as("env_y_top"),
        (($"tile.y" + 1) * 256.0 / (lit(256.0) * pow(lit(2.0), $"zoom"))).as("env_y_bottom"),
        (tilePolygon($"tile").getField("min_lat") < tilePolygon($"tile").getField("max_lat") &&
          $"lat" >= tilePolygon($"tile").getField("min_lat") &&
          $"lat" <= tilePolygon($"tile").getField("max_lat")).as("env_lat_ok"),
        size(tilesAround($"lat", $"lon", $"zoom")).as("n_around"))
      .orderBy($"c_custkey")
  }
  val qFnBingTilesSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey * 7 % 170) - 85 + 0.5 AS DOUBLE) AS lat,
           CAST((c_custkey * 13 % 360) - 180 + 0.5 AS DOUBLE) AS lon,
           CAST(10 + c_custkey % 6 AS INT) AS zoom
         FROM customer WHERE c_custkey <= 2000),
       xy AS (
         SELECT *, 256.0 * power(2.0, zoom) AS ms,
           CAST(floor(greatest(0.0, least((lon + 180.0) / 360.0 * (256.0 * power(2.0, zoom)),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS INT) AS tile_x,
           CAST(floor(greatest(0.0, least(
                (0.5 - ln((1.0 + sin(lat * pi() / 180.0)) / (1.0 - sin(lat * pi() / 180.0))) / (4.0 * pi()))
                  * (256.0 * power(2.0, zoom)),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS INT) AS tile_y
         FROM t)
       SELECT c_custkey, tile_x, tile_y, zoom AS zoom_level,
         array_to_string(list_transform(range(1, zoom + 1), i ->
           CAST(CAST(floor(tile_x / power(2.0, zoom - i)) AS INT) % 2
              + 2 * (CAST(floor(tile_y / power(2.0, zoom - i)) AS INT) % 2) AS VARCHAR)), '') AS quadkey,
         TRUE AS qk_roundtrip_ok,
         TRUE AS parent_prefix_ok,
         (least(tile_x * 256.0, ms) / ms - 0.5) * 360.0 AS env_min_lon,
         (least((tile_x + 1) * 256.0, ms) / ms - 0.5) * 360.0 AS env_max_lon,
         tile_y * 256.0 / ms AS env_y_top,
         (tile_y + 1) * 256.0 / ms AS env_y_bottom,
         TRUE AS env_lat_ok,
         CAST((1 + (tile_x > 0)::INT + (tile_x < CAST(power(2.0, zoom) AS BIGINT) - 1)::INT)
            * (1 + (tile_y > 0)::INT + (tile_y < CAST(power(2.0, zoom) AS BIGINT) - 1)::INT) AS INT) AS n_around
       FROM xy ORDER BY c_custkey"""

  /** geometry_to_bing_tiles (BingTileFunctions.java:344) — envelope covers.
    * The oracle replays the corner-tile projection and derives count and
    * coordinate sums from the arithmetic series over the tile ranges —
    * independently verifying every tile in the cover without materializing
    * them in SQL. */
  def q_fn_bing_cover(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.BingTiles._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1500)
      .withColumn("lat", (($"c_custkey" * 7 % 140) - 70 + lit(0.25)).cast("double"))
      .withColumn("lon", (($"c_custkey" * 13 % 340) - 170 + lit(0.25)).cast("double"))
      .withColumn("zoom", (lit(8) + $"c_custkey" % 4).cast("int"))
      .withColumn("tiles", geometryToBingTiles(
        $"lon" - 0.3, $"lat" - 0.2, $"lon" + 0.3, $"lat" + 0.2, $"zoom"))
    t.select($"c_custkey",
        size($"tiles").as("n_tiles"),
        aggregate($"tiles", lit(0L), (a, tl) => a + tl("x")).as("sum_x"),
        aggregate($"tiles", lit(0L), (a, tl) => a + tl("y")).as("sum_y"),
        element_at($"tiles", 1).getField("x").as("first_x"),
        element_at($"tiles", 1).getField("y").as("first_y"))
      .orderBy($"c_custkey")
  }
  val qFnBingCoverSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey * 7 % 140) - 70 + 0.25 AS DOUBLE) AS lat,
           CAST((c_custkey * 13 % 340) - 170 + 0.25 AS DOUBLE) AS lon,
           CAST(8 + c_custkey % 4 AS INT) AS zoom
         FROM customer WHERE c_custkey <= 1500),
       rng AS (
         SELECT c_custkey,
           CAST(floor(greatest(0.0, least((lon - 0.3 + 180.0) / 360.0 * 256.0 * power(2.0, zoom),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS BIGINT) AS x1,
           CAST(floor(greatest(0.0, least((lon + 0.3 + 180.0) / 360.0 * 256.0 * power(2.0, zoom),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS BIGINT) AS x2,
           CAST(floor(greatest(0.0, least(
                (0.5 - ln((1.0 + sin((lat + 0.2) * pi() / 180.0)) / (1.0 - sin((lat + 0.2) * pi() / 180.0))) / (4.0 * pi()))
                  * 256.0 * power(2.0, zoom),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS BIGINT) AS y1,
           CAST(floor(greatest(0.0, least(
                (0.5 - ln((1.0 + sin((lat - 0.2) * pi() / 180.0)) / (1.0 - sin((lat - 0.2) * pi() / 180.0))) / (4.0 * pi()))
                  * 256.0 * power(2.0, zoom),
                256.0 * power(2.0, zoom) - 1)) / 256.0) AS BIGINT) AS y2
         FROM t)
       SELECT c_custkey,
         CAST((x2 - x1 + 1) * (y2 - y1 + 1) AS INT) AS n_tiles,
         (x1 + x2) * (x2 - x1 + 1) // 2 * (y2 - y1 + 1) AS sum_x,
         (y1 + y2) * (y2 - y1 + 1) // 2 * (x2 - x1 + 1) AS sum_y,
         CAST(x1 AS INT) AS first_x,
         CAST(y1 AS INT) AS first_y
       FROM rng ORDER BY c_custkey"""

  /** Teradata compatibility bundle (reference plugin/trino-teradata-functions:
    * index, char2hexint, to_date/to_timestamp/to_char with the Teradata
    * YYYY/MM/DD/HH24/MI/SS token vocabulary). char2hexint is replayed by
    * DuckDB per-codepoint (fixture strings are BMP); a non-BMP known-answer
    * constant pins the surrogate-pair path. */
  def q_fn_teradata(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TeradataFunctions._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 500)
      .withColumn("dt_str", concat(lit("2024-"),
        lpad(($"c_custkey" % 12 + 1).cast("string"), 2, "0"), lit("-"),
        lpad(($"c_custkey" % 28 + 1).cast("string"), 2, "0"), lit(" "),
        lpad(($"c_custkey" % 24).cast("string"), 2, "0"), lit(":"),
        lpad(($"c_custkey" % 60).cast("string"), 2, "0"), lit(":"),
        lpad(($"c_custkey" * 7 % 60).cast("string"), 2, "0")))
    t.select($"c_custkey",
        tdIndex($"c_name", lit("#")).cast("long").as("idx_hash"),
        tdIndex($"c_name", lit("zzz")).cast("long").as("idx_missing"),
        tdChar2HexInt($"c_mktsegment").as("seg_hex"),
        tdChar2HexInt(lit("A🎉")).as("ka_nonbmp"),
        unix_timestamp(tdToTimestamp($"dt_str", "yyyy-mm-dd hh24:mi:ss")).as("ts_epoch"),
        tdToDate($"dt_str", "yyyy-mm-dd hh24:mi:ss").cast("string").as("date_str"),
        tdToChar(tdToTimestamp($"dt_str", "yyyy-mm-dd hh24:mi:ss"),
          "dd/mm/yyyy hh24:mi").as("formatted"))
      .orderBy($"c_custkey")
  }
  val qFnTeradataSql: String =
    """WITH t AS (
         SELECT c_custkey, c_name, c_mktsegment,
           '2024-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-'
             || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') || ' '
             || lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(c_custkey % 60 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(c_custkey * 7 % 60 AS VARCHAR), 2, '0') AS dt_str
         FROM customer WHERE c_custkey <= 500)
       SELECT c_custkey,
         CAST(instr(c_name, '#') AS BIGINT) AS idx_hash,
         CAST(0 AS BIGINT) AS idx_missing,
         array_to_string([lpad(upper(to_hex(unicode(x))), 4, '0')
           FOR x IN string_split(c_mktsegment, '')], '') AS seg_hex,
         '0041D83CDF89' AS ka_nonbmp,
         CAST(epoch(strptime(dt_str, '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS ts_epoch,
         CAST(CAST(strptime(dt_str, '%Y-%m-%d %H:%M:%S') AS DATE) AS VARCHAR) AS date_str,
         strftime(strptime(dt_str, '%Y-%m-%d %H:%M:%S'), '%d/%m/%Y %H:%M') AS formatted
       FROM t ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_fn_scalar3" -> q_fn_scalar3 _,
    "q_fn_scalar4" -> q_fn_scalar4 _,
    "q_fn_bing_tiles" -> q_fn_bing_tiles _,
    "q_fn_bing_cover" -> q_fn_bing_cover _,
    "q_fn_teradata" -> q_fn_teradata _)
  val oracles: Map[String, String] = Map(
    "q_fn_scalar3" -> qFnScalar3Sql,
    "q_fn_scalar4" -> qFnScalar4Sql,
    "q_fn_bing_tiles" -> qFnBingTilesSql,
    "q_fn_bing_cover" -> qFnBingCoverSql,
    "q_fn_teradata" -> qFnTeradataSql)
}
