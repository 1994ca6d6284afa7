package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar sweep 5 — the round-8 name-parity batch (reference names that
  * previously had no registration under the reference's spelling):
  * levenshtein_distance, the bitwise_* family (JoniRegexp/Bitwise
  * Functions.java), ISO date-part names (day_of_week/dow, day_of_year/doy,
  * week_of_year/week, year_of_week/yow — DateTimeFunctions.java),
  * to_unixtime, from/to_utf8, from/to_hex, from/to_base64url
  * (VarbinaryFunctions.java), is_finite/is_infinite (MathFunctions.java),
  * cosine_distance, combine_hash, space_trimmed_length, t_cdf
  * (MathFunctions.java:826 via the regularized incomplete beta),
  * regexp_position, json_array_contains/json_parse (JsonFunctions.java),
  * title_case.
  *
  * Oracle notes: ISO date parts replay via DuckDB's isodow/dayofyear/
  * weekofyear/isoyear; t_cdf is pinned against the CLOSED FORMS at df=1
  * (½ + atan(x)/π) and df=2 (½ + x/(2√(2+x²))) under round-9 (atan/sqrt
  * ulps); arithmetic-right-shift of negatives replays as floor division;
  * regexp_position replays analytically on the known fixture shape. */
object Functions4 {

  def q_fn_scalar5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    table(s, dir, "customer").filter($"c_custkey" <= 500)
      .withColumn("d", expr("date_add(DATE '1995-01-01', CAST(c_custkey % 1000 AS INT))"))
      .withColumn("x", (($"c_custkey" % 41) - 20).cast("double") / 4.0)
      .select($"c_custkey",
        expr("levenshtein_distance(c_name, reverse(c_name))").as("lev"),
        expr("bitwise_and(c_custkey, 170)").as("b_and"),
        expr("bitwise_or(c_custkey, 12)").as("b_or"),
        expr("bitwise_xor(c_custkey, 255)").as("b_xor"),
        expr("bitwise_not(c_custkey)").as("b_not"),
        expr("bitwise_left_shift(c_custkey % 16, 3)").as("b_shl"),
        expr("bitwise_right_shift(c_custkey * 1024, 5)").as("b_shr"),
        expr("bitwise_right_shift_arithmetic(-c_custkey, 2)").as("b_shra"),
        expr("day_of_week(d)").cast("long").as("dow"),
        expr("day_of_year(d)").cast("long").as("doy"),
        expr("week_of_year(d)").cast("long").as("woy"),
        expr("year_of_week(d)").cast("long").as("yow"),
        expr("to_unixtime(timestamp_seconds(1577836800 + c_custkey))").as("unixt"),
        expr("from_utf8(to_utf8(c_name))").as("utf8_rt"),
        expr("to_hex(to_utf8('J'))").as("hex_ka"),
        expr("from_utf8(from_hex(to_hex(to_utf8(c_name))))").as("hex_rt"),
        expr("to_base64url(to_utf8(concat(c_name, '?~')))").as("b64url"),
        expr("from_utf8(from_base64url(to_base64url(to_utf8(c_name))))").as("b64_rt"),
        expr("is_finite(CAST(c_acctbal AS DOUBLE))").as("fin"),
        expr("is_infinite(CAST('Infinity' AS DOUBLE))").as("inf_ka"),
        expr("is_finite(CAST('NaN' AS DOUBLE))").as("nan_not_finite"),
        expr("""cosine_distance(
            CAST(array(c_custkey % 7 + 1, c_custkey % 5 + 1) AS ARRAY<FLOAT>),
            CAST(array(c_custkey % 3 + 1, c_custkey % 2 + 1) AS ARRAY<FLOAT>)) + 0.0""")
          .as("cos_d"),
        expr("combine_hash(c_custkey, c_custkey * 31 + 7)").as("ch"),
        expr("space_trimmed_length(concat(c_name, '   '))").cast("long").as("stl"),
        expr("round(t_cdf(x, CAST(1.0 AS DOUBLE)), 9)").as("tcdf1"),
        expr("round(t_cdf(x, CAST(2.0 AS DOUBLE)), 9)").as("tcdf2"),
        expr("regexp_position(c_name, '[0-9]+')").cast("long").as("rpos"),
        expr("regexp_position(c_mktsegment, '[0-9]')").cast("long").as("rpos_none"),
        expr("""json_array_contains(
            concat('[', c_custkey % 3, ',', c_custkey % 3 + 1, ']'),
            c_custkey % 5)""").as("jac_num"),
        expr("json_array_contains('[\"a\",\"b\"]', 'b')").as("jac_str"),
        expr("json_parse(' {\"b\" : 1, \"a\": [1, 2]} ')").as("jparse"),
        expr("json_parse('{oops')").isNull.as("jparse_bad_null"),
        expr("title_case(lower(c_mktsegment))").as("title"))
      .orderBy($"c_custkey")
  }
  val qFnScalar5Sql: String =
    """SELECT c_custkey,
         CAST(levenshtein(c_name, reverse(c_name)) AS INT) AS lev,
         c_custkey & 170 AS b_and,
         c_custkey | 12 AS b_or,
         xor(c_custkey, 255) AS b_xor,
         ~c_custkey AS b_not,
         (c_custkey % 16) << 3 AS b_shl,
         (c_custkey * 1024) >> 5 AS b_shr,
         CAST(floor((-c_custkey) / 4.0) AS BIGINT) AS b_shra,
         CAST(isodow(d) AS BIGINT) AS dow,
         CAST(dayofyear(d) AS BIGINT) AS doy,
         CAST(weekofyear(d) AS BIGINT) AS woy,
         CAST(isoyear(d) AS BIGINT) AS yow,
         CAST(1577836800 + c_custkey AS DOUBLE) AS unixt,
         c_name AS utf8_rt,
         '4A' AS hex_ka,
         c_name AS hex_rt,
         replace(replace(to_base64(encode(c_name || '?~')), '+', '-'), '/', '_') AS b64url,
         c_name AS b64_rt,
         TRUE AS fin,
         TRUE AS inf_ka,
         FALSE AS nan_not_finite,
         1.0 - ((c_custkey % 7 + 1) * (c_custkey % 3 + 1) + (c_custkey % 5 + 1) * (c_custkey % 2 + 1))
           / (sqrt((c_custkey % 7 + 1) * (c_custkey % 7 + 1) + (c_custkey % 5 + 1) * (c_custkey % 5 + 1))
            * sqrt((c_custkey % 3 + 1) * (c_custkey % 3 + 1) + (c_custkey % 2 + 1) * (c_custkey % 2 + 1))) + 0.0 AS cos_d,
         c_custkey * 31 + (c_custkey * 31 + 7) AS ch,
         CAST(length(c_name) AS BIGINT) AS stl,
         round(0.5 + atan(x) / pi(), 9) AS tcdf1,
         round(0.5 + x / (2 * sqrt(2 + x * x)), 9) AS tcdf2,
         CAST(strpos(c_name, '#') + 1 AS BIGINT) AS rpos,
         CAST(-1 AS BIGINT) AS rpos_none,
         (c_custkey % 5 = c_custkey % 3 OR c_custkey % 5 = c_custkey % 3 + 1) AS jac_num,
         TRUE AS jac_str,
         '{"b":1,"a":[1,2]}' AS jparse,
         TRUE AS jparse_bad_null,
         upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS title
       FROM (SELECT *, DATE '1995-01-01' + INTERVAL (c_custkey % 1000) DAY AS d,
               ((c_custkey % 41) - 20) / 4.0 AS x
             FROM customer WHERE c_custkey <= 500)
       ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map("q_fn_scalar5" -> q_fn_scalar5 _)
  val oracles: Map[String, String] = Map("q_fn_scalar5" -> qFnScalar5Sql)
}
