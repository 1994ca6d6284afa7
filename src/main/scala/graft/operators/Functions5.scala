package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar sweeps 6 + 7 — the round-8 name-parity batch 2: every remaining
  * reference spelling registered in functions.Registry, exercised through
  * SQL text so the driver verifies name → semantics end-to-end.
  *
  * q_fn_scalar6 (strings / arrays / JSON): strpos (incl. Nth-occurrence
  * instance form, StringFunctions.java stringPosition), codepoint,
  * normalize, regexp_split, split_to_map, sha256/sha512 (varbinary),
  * starts/ends_with, array_first/array_last (+ _match HOF forms),
  * all/any/none_match, trim_array, combinations, ngrams, contains_sequence
  * (Array*Function.java), legacy-path json_extract/_scalar/json_size/
  * json_array_get/is_json_scalar (JsonFunctions.java, JsonExtract.java),
  * to_base/from_base, to/from_big_endian_64.
  *
  * q_fn_scalar7 (datetime / math / misc): last_day_of_month, millisecond,
  * to_iso8601, date_parse (MySQL dialect), format_datetime/parse_datetime
  * (Joda dialect), parse_duration → to_milliseconds, human_readable_seconds,
  * parse_data_size, truncate, wilson_interval_lower/upper
  * (WilsonInterval.java — exact operation order), normal_cdf (A&S 7.1.26
  * kernel, oracle-replayed constant for constant), beta_cdf /
  * inverse_beta_cdf at the a=1 closed form (1−(1−v)^b — analytically exact
  * in the oracle), with_timezone/at_timezone/timezone/timezone_hour/
  * timezone_minute over the tstz struct, nan/infinity/is_nan, rgb.
  *
  * Oracle notes: strpos-instance replays via instr/reverse arithmetic;
  * human_readable_seconds is replayed segment-by-segment with a
  * list_filter join; parse_data_size uses DECIMAL multiplication so the
  * binary unit factor stays exact; sha512 is pinned to the FIPS 180-2
  * known-answer vector. */
object Functions5 {

  def q_fn_scalar6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    table(s, dir, "documents").filter($"doc_id" < 500)
      .withColumn("toks", split($"text", " "))
      .withColumn("t6", slice($"toks", 1, 6))
      .select($"doc_id",
        expr("strpos(text, 'a')").as("sp1"),
        expr("strpos(text, 'a', 2)").as("sp2"),
        expr("strpos(text, 'a', -1)").as("spm1"),
        expr("strpos(text, 'zqxv')").as("sp_none"),
        expr("codepoint(substr(text, 1, 1))").cast("long").as("cp"),
        expr("normalize(concat('Cafe\u0301', substr(text, 1, 20)))").as("nfc"),
        expr("array_join(regexp_split(text, '[aeiou]+'), '|')").as("rsplit"),
        expr("element_at(split_to_map(concat('a=', doc_id % 5, ',b=', doc_id % 7), ',', '='), 'a')").as("s2m_a"),
        expr("element_at(split_to_map(concat('a=', doc_id % 5, ',b=', doc_id % 7), ',', '='), 'b')").as("s2m_b"),
        expr("lower(hex(sha256(to_utf8(text))))").as("sha256hex"),
        expr("lower(hex(sha512(to_utf8('abc'))))").as("sha512_ka"),
        expr("starts_with(lower(text), 'the')").as("sw"),
        expr("ends_with(text, '.')").as("ew"),
        expr("array_first(toks)").as("af"),
        expr("array_last(toks)").as("al"),
        expr("array_first_match(toks, x -> length(x) > 4)").as("afm"),
        expr("array_last_match(toks, x -> length(x) > 4)").as("alm"),
        expr("all_match(toks, x -> length(x) <= 20)").as("am"),
        expr("any_match(toks, x -> length(x) = 3)").as("anym"),
        expr("none_match(toks, x -> length(x) > 20)").as("nonem"),
        expr("array_join(trim_array(toks, 1), '|')").as("ta"),
        expr("cardinality(combinations(t6, 2))").cast("long").as("comb_n"),
        expr("array_join(element_at(combinations(t6, 2), 1), ' ')").as("comb_first"),
        expr("array_join(element_at(combinations(t6, 2), -1), ' ')").as("comb_last"),
        expr("array_join(transform(ngrams(t6, 2), g -> concat_ws(' ', g)), '|')").as("ng"),
        expr("contains_sequence(toks, slice(toks, 2, 2))").as("cs_yes"),
        expr("contains_sequence(toks, array('zqxv', 'vvvv'))").as("cs_no"),
        expr("json_extract(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'), '$.a.arr[1]')").as("je"),
        expr("json_extract_scalar(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'), '$.s')").as("jes"),
        expr("json_size(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'), '$.a')").as("jsz"),
        expr("json_array_get(json_extract(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'), '$.a.arr'), -1)").as("jag"),
        expr("is_json_scalar(json_extract(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'), '$.a.k'))").as("ijs_yes"),
        expr("is_json_scalar(concat('{\"a\":{\"k\":', doc_id % 9, ',\"arr\":[1,', doc_id % 4, ',5]},\"s\":\"x\"}'))").as("ijs_no"),
        expr("to_base(doc_id * 7 + 3, 16)").as("tb"),
        expr("from_base(to_base(doc_id + 1, 8), 8)").as("fb_rt"),
        expr("hex(to_big_endian_64(doc_id * 1000000007))").as("be64hex"),
        expr("from_big_endian_64(to_big_endian_64(-doc_id - 1))").as("fbe64_rt"),
        expr("hex(spooky_hash_v2_64(to_utf8('hello')))").as("spooky64_ka"),
        expr("hex(spooky_hash_v2_32(to_utf8('hello')))").as("spooky32_ka"))
      .orderBy($"doc_id")
  }

  val qFnScalar6Sql: String =
    """SELECT doc_id,
         CAST(instr(text, 'a') AS BIGINT) AS sp1,
         CAST(CASE WHEN instr(text, 'a') > 0
                    AND instr(substr(text, instr(text, 'a') + 1), 'a') > 0
              THEN instr(text, 'a') + instr(substr(text, instr(text, 'a') + 1), 'a')
              ELSE 0 END AS BIGINT) AS sp2,
         CAST(CASE WHEN instr(text, 'a') > 0
              THEN len(text) - instr(reverse(text), 'a') + 1
              ELSE 0 END AS BIGINT) AS spm1,
         CAST(0 AS BIGINT) AS sp_none,
         CAST(unicode(substr(text, 1, 1)) AS BIGINT) AS cp,
         nfc_normalize('Cafe' || chr(769) || substr(text, 1, 20)) AS nfc,
         array_to_string(regexp_split_to_array(text, '[aeiou]+'), '|') AS rsplit,
         CAST(doc_id % 5 AS VARCHAR) AS s2m_a,
         CAST(doc_id % 7 AS VARCHAR) AS s2m_b,
         sha256(text) AS sha256hex,
         'ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f' AS sha512_ka,
         starts_with(lower(text), 'the') AS sw,
         ends_with(text, '.') AS ew,
         toks[1] AS af,
         toks[-1] AS al,
         list_filter(toks, x -> len(x) > 4)[1] AS afm,
         list_filter(toks, x -> len(x) > 4)[-1] AS alm,
         len(list_filter(toks, x -> len(x) > 20)) = 0 AS am,
         len(list_filter(toks, x -> len(x) = 3)) > 0 AS anym,
         len(list_filter(toks, x -> len(x) > 20)) = 0 AS nonem,
         array_to_string(toks[1:len(toks) - 1], '|') AS ta,
         CAST(len(t6) * (len(t6) - 1) / 2 AS BIGINT) AS comb_n,
         t6[1] || ' ' || t6[2] AS comb_first,
         t6[len(t6) - 1] || ' ' || t6[len(t6)] AS comb_last,
         CASE WHEN len(t6) >= 2
              THEN array_to_string([t6[i] || ' ' || t6[i+1] for i in range(1, len(t6))], '|')
              ELSE '' END AS ng,
         len(toks) >= 3 AS cs_yes,
         FALSE AS cs_no,
         CAST(doc_id % 4 AS VARCHAR) AS je,
         'x' AS jes,
         CAST(2 AS BIGINT) AS jsz,
         '5' AS jag,
         TRUE AS ijs_yes,
         FALSE AS ijs_no,
         lower(to_base(doc_id * 7 + 3, 16)) AS tb,
         doc_id + 1 AS fb_rt,
         upper(printf('%016x', doc_id * 1000000007)) AS be64hex,
         -doc_id - 1 AS fbe64_rt,
         '3768826AD382E6CA' AS spooky64_ka,
         'D382E6CA' AS spooky32_ka
       FROM (SELECT *, string_split(text, ' ') AS toks,
               string_split(text, ' ')[1:6] AS t6
             FROM documents WHERE doc_id < 500)
       ORDER BY doc_id"""

  def q_fn_scalar7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    table(s, dir, "customer").filter($"c_custkey" <= 500)
      .withColumn("d", expr("date_add(DATE '1995-01-01', CAST(c_custkey % 1000 AS INT))"))
      .withColumn("ts", expr("timestamp_micros(1577836800000000 + c_custkey * 123456789)"))
      .withColumn("xs", (($"c_custkey" % 37) - 18).cast("double") / 3.0)
      .select($"c_custkey",
        expr("to_iso8601(last_day_of_month(d))").as("ldm"),
        expr("millisecond(ts)").as("ms"),
        expr("to_iso8601(ts)").as("iso_ts"),
        expr("to_iso8601(d)").as("iso_d"),
        expr("to_iso8601(CAST(date_parse(replace(to_iso8601(d), '-', '/'), '%Y/%m/%d') AS DATE))").as("dp"),
        expr("format_datetime(ts, 'yyyy-MM-dd HH:mm:ss')").as("fdt"),
        expr("parse_datetime(format_datetime(ts, 'yyyy-MM-dd HH:mm:ss'), 'yyyy-MM-dd HH:mm:ss')").as("pdt"),
        expr("to_milliseconds(parse_duration(concat(CAST(c_custkey % 500 AS STRING), ' m')))").as("pd_ms"),
        expr("to_milliseconds(parse_duration('3.81 d'))").as("pd2"),
        expr("human_readable_seconds(CAST(c_custkey * 97 % 2000000 AS DOUBLE))").as("hrs"),
        expr("CAST(CAST(parse_data_size(concat(CAST(c_custkey % 97 AS STRING), '.', CAST(c_custkey % 10 AS STRING), 'MB')) AS DECIMAL(38,0)) AS BIGINT)").as("pds"),
        expr("truncate(CAST(c_acctbal AS DOUBLE) / 7.0)").as("trunc1"),
        expr("truncate(CAST(c_acctbal AS DOUBLE) / 7.0, 2)").as("trunc2"),
        expr("round(wilson_interval_lower(c_custkey % 50, 100, 1.96), 9)").as("wl"),
        expr("round(wilson_interval_upper(c_custkey % 50, 100, 1.96), 9)").as("wu"),
        expr("round(normal_cdf(0.0, 2.0, xs), 9) + 0.0").as("ncdf"),
        expr("round(beta_cdf(1.0, CAST(1 + c_custkey % 5 AS DOUBLE), (c_custkey % 10) / 10.0), 9)").as("bc1"),
        expr("round(inverse_beta_cdf(1.0, CAST(1 + c_custkey % 5 AS DOUBLE), (c_custkey % 9) / 10.0), 9)").as("ib1"),
        expr("is_nan(nan())").as("isn"),
        expr("infinity() > 1e308").as("inf_gt"),
        expr("rgb(CAST(c_custkey % 256 AS INT), CAST(c_custkey * 7 % 256 AS INT), CAST(c_custkey * 13 % 256 AS INT))").cast("long").as("rgbv"),
        expr("timezone_hour(with_timezone(ts, 'Asia/Kolkata'))").as("tzh"),
        expr("timezone_minute(with_timezone(ts, 'Asia/Kolkata'))").as("tzm"),
        expr("timezone(at_timezone(with_timezone(ts, 'Asia/Kolkata'), 'UTC'))").as("tzn"))
      .orderBy($"c_custkey")
  }

  val qFnScalar7Sql: String =
    """SELECT c_custkey,
         strftime(last_day(d), '%Y-%m-%d') AS ldm,
         (extract(microseconds FROM ts) % 1000000) // 1000 AS ms,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso_ts,
         strftime(d, '%Y-%m-%d') AS iso_d,
         strftime(d, '%Y-%m-%d') AS dp,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS fdt,
         date_trunc('second', ts) AS pdt,
         CAST(c_custkey % 500 AS BIGINT) * 60000 AS pd_ms,
         CAST(329184000 AS BIGINT) AS pd2,
         COALESCE(NULLIF(COALESCE(array_to_string(list_filter([
                CASE WHEN sec // 604800 > 0 THEN (sec // 604800) || ' week' || (CASE WHEN sec // 604800 = 1 THEN '' ELSE 's' END) END,
                CASE WHEN (sec % 604800) // 86400 > 0 THEN ((sec % 604800) // 86400) || ' day' || (CASE WHEN (sec % 604800) // 86400 = 1 THEN '' ELSE 's' END) END,
                CASE WHEN (sec % 86400) // 3600 > 0 THEN ((sec % 86400) // 3600) || ' hour' || (CASE WHEN (sec % 86400) // 3600 = 1 THEN '' ELSE 's' END) END,
                CASE WHEN (sec % 3600) // 60 > 0 THEN ((sec % 3600) // 60) || ' minute' || (CASE WHEN (sec % 3600) // 60 = 1 THEN '' ELSE 's' END) END,
                CASE WHEN sec % 60 > 0 THEN (sec % 60) || ' second' || (CASE WHEN sec % 60 = 1 THEN '' ELSE 's' END) END
              ], x -> x IS NOT NULL), ', '), ''), ''), '0 seconds') AS hrs,
         CAST(floor(CAST(CAST(c_custkey % 97 AS VARCHAR) || '.' || CAST(c_custkey % 10 AS VARCHAR) AS DECIMAL(18,1)) * 1048576) AS BIGINT) AS pds,
         trunc(CAST(c_acctbal AS DOUBLE) / 7.0) + 0.0 AS trunc1,
         (CASE WHEN sign(CAST(c_acctbal AS DOUBLE) / 7.0) < 0 THEN -1.0 ELSE 1.0 END)
           * floor(abs(CAST(c_acctbal AS DOUBLE) / 7.0) * pow(10.0, 2.0)) / pow(10.0, 2.0) + 0.0 AS trunc2,
         round((p + zz / (2 * 100.0) - 1.96 * sqrt(p * (1 - p) / 100.0 + zz / (4 * 100.0 * 100.0)))
           / (1 + zz / 100.0), 9) AS wl,
         round((p + zz / (2 * 100.0) + 1.96 * sqrt(p * (1 - p) / 100.0 + zz / (4 * 100.0 * 100.0)))
           / (1 + zz / 100.0), 9) AS wu,
         round((1 + (CASE WHEN xn >= 0 THEN erfa ELSE -erfa END)) / 2, 9) + 0.0 AS ncdf,
         round(1 - pow(1 - (c_custkey % 10) / 10.0, CAST(1 + c_custkey % 5 AS DOUBLE)), 9) AS bc1,
         round(1 - pow(1 - (c_custkey % 9) / 10.0, 1.0 / CAST(1 + c_custkey % 5 AS DOUBLE)), 9) AS ib1,
         TRUE AS isn,
         TRUE AS inf_gt,
         CAST((c_custkey % 256) * 65536 + (c_custkey * 7 % 256) * 256 + (c_custkey * 13 % 256) AS BIGINT) AS rgbv,
         CAST(5 AS BIGINT) AS tzh,
         CAST(30 AS BIGINT) AS tzm,
         'UTC' AS tzn
       FROM (SELECT *,
               (c_custkey % 50) / 100.0 AS p,
               1.96 * 1.96 AS zz,
               1 - tpoly * exp(-za * za) AS erfa
             FROM (SELECT *,
               tv * (0.254829592 + tv * (-0.284496736 + tv * (1.421413741 + tv * (-1.453152027 + tv * 1.061405429)))) AS tpoly
             FROM (SELECT *,
               1.0 / (1.0 + 0.3275911 * za) AS tv
             FROM (SELECT *,
               DATE '1995-01-01' + INTERVAL (c_custkey % 1000) DAY AS d,
               make_timestamp(1577836800000000 + c_custkey * 123456789) AS ts,
               ((c_custkey % 37) - 18) / 3.0 AS xs,
               ((((c_custkey % 37) - 18) / 3.0) - 0.0) / (2.0 * sqrt(2.0)) AS xn,
               abs(((((c_custkey % 37) - 18) / 3.0) - 0.0) / (2.0 * sqrt(2.0))) AS za,
               c_custkey * 97 % 2000000 AS sec
             FROM customer WHERE c_custkey <= 500))))
       ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_fn_scalar6" -> q_fn_scalar6 _,
    "q_fn_scalar7" -> q_fn_scalar7 _)
  val oracles: Map[String, String] = Map(
    "q_fn_scalar6" -> qFnScalar6Sql,
    "q_fn_scalar7" -> qFnScalar7Sql)
}
