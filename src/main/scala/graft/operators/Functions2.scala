package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ScalarFunctions._

/** Scalar function bundles, part 2 (SURVEY.md §2.8 gap categories):
  * URL functions, UUID/IP functions, radix conversion, n-gram / sequence
  * containment array helpers.
  *
  * The oracle has no native URL/UUID/IP functions, so each query synthesizes
  * deterministic inputs from fixture keys and the oracle recomputes the same
  * semantics from first principles (regexes for URL parts, split+arithmetic
  * for IPv4, md5 formatting for UUIDs) — a genuinely independent check of the
  * function results, not an echo of our implementation.
  */
object Functions2 {

  /** URL parsing (reference: operator/scalar/UrlFunctions.java:41). */
  def q_fn_url(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer").filter($"c_custkey" <= 300)
      .withColumn("url", concat(
        lit("https://c"), $"c_custkey" % 50, lit(".example.com:"),
        ($"c_custkey" % 10 + 8000), lit("/seg/"), lower(regexp_replace($"c_mktsegment", " ", "")),
        lit("?seg="), lower(regexp_replace($"c_mktsegment", " ", "")),
        lit("&k="), $"c_custkey", lit("#frag"), $"c_custkey" % 7))
    c.select($"c_custkey", $"url",
        urlExtractProtocol($"url").as("proto"),
        urlExtractHost($"url").as("host"),
        urlExtractPort($"url").as("port"),
        urlExtractPath($"url").as("path"),
        urlExtractQuery($"url").as("query"),
        urlExtractFragment($"url").as("fragment"),
        urlExtractParameter($"url", "k").as("param_k"),
        urlEncode(concat($"c_mktsegment", lit(" & more"))).as("encoded"),
        urlDecode(urlEncode($"c_mktsegment")).as("roundtrip"))
      .orderBy($"c_custkey")
  }
  val qFnUrlSql: String =
    """WITH u AS (
         SELECT c_custkey, c_mktsegment,
           'https://c' || (c_custkey % 50) || '.example.com:' || (c_custkey % 10 + 8000)
             || '/seg/' || lower(replace(c_mktsegment, ' ', ''))
             || '?seg=' || lower(replace(c_mktsegment, ' ', ''))
             || '&k=' || c_custkey || '#frag' || (c_custkey % 7) AS url
         FROM customer WHERE c_custkey <= 300)
       SELECT c_custkey, url,
         regexp_extract(url, '^([a-z]+)://', 1) AS proto,
         regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
         CAST(regexp_extract(url, '^[a-z]+://[^/:?#]+:([0-9]+)', 1) AS BIGINT) AS port,
         regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS query,
         regexp_extract(url, '#(.*)$', 1) AS fragment,
         regexp_extract(url, '[?&]k=([^&#]*)', 1) AS param_k,
         replace(c_mktsegment, ' ', '+') || '+%26+more' AS encoded,
         c_mktsegment AS roundtrip
       FROM u ORDER BY c_custkey"""

  /** UUID formatting, IPv4 arithmetic, radix conversion (reference:
    * UuidFunctions, IpAddressFunctions.java, MathFunctions from/to_base). */
  def q_fn_uuid_ip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer").filter($"c_custkey" <= 300)
      .withColumn("ip", concat(
        lit("10."), $"c_custkey" % 256, lit("."),
        ($"c_custkey" * 7) % 256, lit("."), ($"c_custkey" * 13) % 251 + 1))
    c.select($"c_custkey", $"ip",
        uuidFromHash($"c_custkey").as("uuid"),
        ipToLong($"ip").as("ip_num"),
        ipInCidr($"ip", lit("10.5.0.0"), 16).as("in_10_5_16"),
        ipInCidr($"ip", concat(lit("10."), $"c_custkey" % 256, lit(".0.0")), 16).as("in_own_16"),
        toBase($"c_custkey", 16).as("hex"),
        toBase($"c_custkey", 2).as("bin"),
        fromBase(toBase($"c_custkey", 16), 16).as("roundtrip"))
      .orderBy($"c_custkey")
  }
  val qFnUuidIpSql: String =
    """WITH b AS (
         SELECT c_custkey,
           '10.' || (c_custkey % 256) || '.' || ((c_custkey * 7) % 256) || '.' || ((c_custkey * 13) % 251 + 1) AS ip
         FROM customer WHERE c_custkey <= 300),
       i AS (
         SELECT *, CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                 + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                 + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                 + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
         FROM b)
       SELECT c_custkey, ip,
         substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || '-' ||
         substr(md5(CAST(c_custkey AS VARCHAR)), 9, 4) || '-' ||
         substr(md5(CAST(c_custkey AS VARCHAR)), 13, 4) || '-' ||
         substr(md5(CAST(c_custkey AS VARCHAR)), 17, 4) || '-' ||
         substr(md5(CAST(c_custkey AS VARCHAR)), 21, 12) AS uuid,
         ip_num,
         (ip_num // 65536) = (10 * 256 + 5) AS in_10_5_16,
         (ip_num // 65536) = (10 * 256 + (c_custkey % 256)) AS in_own_16,
         lower(to_base(c_custkey, 16)) AS hex,
         lower(to_base(c_custkey, 2)) AS bin,
         c_custkey AS roundtrip
       FROM i ORDER BY c_custkey"""

  /** Array n-grams + word-sequence containment (reference:
    * operator/scalar/ArrayNgramsFunction / ArraysOverlapFunction family). */
  def q_fn_ngrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = table(s, dir, "documents").filter($"doc_id" < 100)
      .withColumn("toks", split(lower($"text"), " "))
    d.select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        array_join(
          when(size($"toks") >= 2,
            transform(sequence(lit(0), size($"toks") - 2), i =>
              concat_ws(" ", element_at($"toks", i + 1), element_at($"toks", i + 2))))
            .otherwise(array()), "|").as("bigrams"),
        (size($"toks") - 1).cast("long").as("n_bigrams"),
        (instr(concat(lit(" "), array_join($"toks", " "), lit(" ")), " of the ") > 0).as("has_of_the"))
      .orderBy($"doc_id")
  }
  val qFnNgramsSql: String =
    """WITH t AS (
         SELECT doc_id, string_split(lower(text), ' ') AS toks
         FROM documents WHERE doc_id < 100)
       SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) >= 2
              THEN array_to_string([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))], '|')
              ELSE '' END AS bigrams,
         CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
         instr(' ' || array_to_string(toks, ' ') || ' ', ' of the ') > 0 AS has_of_the
       FROM t ORDER BY doc_id"""

  /** SQL/JSON 2016 subset (json_value/json_query/json_exists — reference
    * operator/scalar/json/) round-tripped through to_json. The oracle states
    * the expected values directly from the source columns — an independent
    * check that encode → path-extract → decode is lossless and correct. */
  def q_fn_sqljson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.JsonFunctions._
    val d = table(s, dir, "customer").filter($"c_custkey" <= 200)
      .withColumn("doc", to_json(struct(
        $"c_custkey".as("id"),
        $"c_mktsegment".as("seg"),
        struct($"c_acctbal".as("bal"), $"c_nationkey".as("nat")).as("acct"),
        array($"c_custkey", $"c_custkey" % 7, $"c_custkey" % 3).as("xs"))))
    d.select($"c_custkey",
        jsonValueLong($"doc", "$.id").as("id"),
        jsonValue($"doc", "$.seg").as("seg"),
        jsonValueDouble($"doc", "$.acct.bal").as("bal"),
        jsonValueLong($"doc", "$.xs[1]").as("xs1"),
        jsonExists($"doc", "$.acct.nat").as("has_nat"),
        jsonExists($"doc", "$.missing").as("has_missing"),
        jsonArrayLength(jsonQuery($"doc", "$.xs")).as("n_xs"))
      .orderBy($"c_custkey")
  }
  val qFnSqljsonSql: String =
    """SELECT c_custkey,
       c_custkey AS id,
       c_mktsegment AS seg,
       c_acctbal AS bal,
       c_custkey % 7 AS xs1,
       true AS has_nat,
       false AS has_missing,
       CAST(3 AS BIGINT) AS n_xs
       FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""

  /** SQL/JSON lax/strict path engine subset (graft.ext.JsonPath; reference
    * jsonpath/JsonPathEvaluator.java): filters, wildcards, arithmetic in
    * paths, and the observable lax-vs-strict split (auto-unwrap/auto-wrap vs
    * structural error) surfaced through status columns the oracle pins to
    * literals. */
  def q_fn_jsonpath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.JsonFunctions._
    val d = table(s, dir, "part")
      .withColumn("doc", to_json(struct(
        $"p_partkey".as("id"),
        ($"p_size" > 25).as("big"),
        split($"p_type", " ").as("words"),
        struct($"p_size".cast("long").as("size")).as("meta"),
        concat(lit("2024-03-"), lpad(($"p_size" % 28 + 1).cast("string"), 2, "0")).as("d"),
        array(
          struct(lit(1L).as("v"), lit("a").as("t")),
          struct($"p_size".cast("long").as("v"), lit("b").as("t"))).as("items"),
        array(
          struct(struct($"p_size".cast("long").as("v")).as("m"), lit("z").as("t"))).as("items2"))))
    d.select($"p_partkey",
        jsonPathValue($"doc", "lax $.items[?(@.v > 10)].t").as("filt_t"),
        jsonPathValue($"doc", "lax $.meta.size * 2").cast("long").as("size2"),
        jsonPathValue($"doc", "lax $.words[0]").as("word0"),
        jsonPathStatus($"doc", "lax $.words[5]").as("status_lax"),
        jsonPathStatus($"doc", "strict $.words[5]").as("status_strict"),
        jsonPathStatus($"doc", "lax $.items.v").as("unwrap_lax"),
        jsonPathStatus($"doc", "strict $.items.v").as("unwrap_strict"),
        jsonPathQuery($"doc", "lax $.meta").as("meta_json"),
        // item methods: datetime() canonicalization, size(), type()
        jsonPathValue($"doc", "lax $.d.datetime()").as("dt"),
        jsonPathValue($"doc", "lax $.words.size()").cast("long").as("words_n"),
        jsonPathValue($"doc", "lax $.meta.type()").as("meta_type"),
        // nested filter path + conjunction + path variable (PASSING analogue)
        jsonPathValue($"doc", "lax $.items2[?(@.m.v > 10)].t").as("nested_t"),
        jsonPathValue($"doc", """lax $.items[?(@.v > 10 && @.t == "b")].t""").as("combo_t"),
        jsonPathValue($"doc", "lax $.items[?(@.v > $th)].t",
          vars = Some("""{"th": 10}""")).as("var_t"),
        // extended predicate grammar: exists()/negation, parenthesized
        // sub-predicates with ||, starts with, like_regex, boolean literals
        jsonPathValue($"doc", "lax $.items[?(!(exists(@.missing)) && @.v > 10)].t").as("ex_t"),
        jsonPathValue($"doc", """lax $.items[?((@.v > 10 || @.t == "x") && @.v < 26)].t""").as("paren_t"),
        jsonPathValue($"doc", """lax $.words[?(@ starts with "S")]""").as("sw_word"),
        jsonPathValue($"doc", """lax $.words[?(@ like_regex "ARD$|OMO$")]""").as("re_word"),
        jsonPathValue($"doc", "lax $[?(@.big == true)].id").cast("long").as("big_id"),
        // NON-SCALAR PASSING variables (closing the scalar-only limit):
        // array-valued vars as path ROOTS, structural vars in comparisons
        // (incomparable → unknown → dropped, SQL/JSON 3VL), bool/null vars
        jsonPathValue($"doc", "lax $arr[1]",
          vars = Some("""{"arr": [7, 11, 13]}""")).cast("long").as("rootvar_2nd"),
        jsonPathValue($"doc", "lax $arr[?(@ > $th)]",
          vars = Some("""{"arr": [7, 11, 13], "th": 12}""")).as("rootvar_filter"),
        jsonPathStatus($"doc", "lax $.items[?(@.v == $obj)].t",
          vars = Some("""{"obj": {"x": 1}}""")).as("objvar_incomparable"),
        jsonPathValue($"doc", "lax $[?(@.big == $b)].id",
          vars = Some("""{"b": true}""")).cast("long").as("boolvar_big"),
        jsonPathValue($"doc", """lax $.items[?(@.t == "b" && @.v != $nothing)].v""",
          vars = Some("""{"nothing": null}""")).cast("long").as("nullvar_v"))
      .orderBy($"p_partkey")
  }
  val qFnJsonpathSql: String =
    """SELECT p_partkey,
       CASE WHEN p_size > 10 THEN 'b' END AS filt_t,
       CAST(p_size * 2 AS BIGINT) AS size2,
       string_split(p_type, ' ')[1] AS word0,
       'empty' AS status_lax,
       'error' AS status_strict,
       'value' AS unwrap_lax,
       'error' AS unwrap_strict,
       '{"size":' || p_size || '}' AS meta_json,
       '2024-03-' || lpad(CAST(p_size % 28 + 1 AS VARCHAR), 2, '0') || ' 00:00:00' AS dt,
       CAST(len(string_split(p_type, ' ')) AS BIGINT) AS words_n,
       'object' AS meta_type,
       CASE WHEN p_size > 10 THEN 'z' END AS nested_t,
       CASE WHEN p_size > 10 THEN 'b' END AS combo_t,
       CASE WHEN p_size > 10 THEN 'b' END AS var_t,
       CASE WHEN p_size > 10 THEN 'b' END AS ex_t,
       CASE WHEN p_size > 10 AND p_size < 26 THEN 'b' END AS paren_t,
       CASE WHEN p_type LIKE 'S%' THEN p_type END AS sw_word,
       CASE WHEN regexp_matches(p_type, 'ARD$|OMO$') THEN p_type END AS re_word,
       CASE WHEN p_size > 25 THEN CAST(p_partkey AS BIGINT) END AS big_id,
       CAST(11 AS BIGINT) AS rootvar_2nd,
       '13' AS rootvar_filter,
       'empty' AS objvar_incomparable,
       CASE WHEN p_size > 25 THEN CAST(p_partkey AS BIGINT) END AS boolvar_big,
       CAST(p_size AS BIGINT) AS nullvar_v
       FROM part ORDER BY p_partkey"""

  /** Keyed hashes + base32 (reference HmacFunctions.java, StringFunctions.java
    * to_base32/from_base32). Keyed digests are not reconstructible in DuckDB
    * SQL, so the oracle pins public known-answer vectors over fixed inputs —
    * the same technique the reference's own function tests use. */
  def q_fn_crypto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.CryptoFunctions._
    Seq(
      ("graft-key", "the quick brown fox"),
      ("k2", "jumps over"),
      ("secret", "graft engine")).toDF("k", "m")
      .select($"k", $"m",
        hmacMd5($"k", $"m").as("hmac_md5"),
        hmacSha256($"k", $"m").as("hmac_sha256"),
        toBase32($"m").as("b32"),
        (fromBase32(toBase32($"m")) === $"m").as("b32_roundtrip"))
      .orderBy($"k")
  }
  val qFnCryptoSql: String =
    """SELECT * FROM (VALUES
       ('graft-key', 'the quick brown fox', '703d71a8cdda1a91635e96fc60c7ece8',
        'bbf8e396fce4790342ceecdad0612b3260dd32e82f658d5ad91a130ab08e38f4',
        'ORUGKIDROVUWG2ZAMJZG653OEBTG66A=', TRUE),
       ('k2', 'jumps over', '25688c0e43d87aeec09e4627aec0fabe',
        'bf82e7e4403398f0a04099d672e3955278cbf3ee34400b7f63a47193c2332891',
        'NJ2W24DTEBXXMZLS', TRUE),
       ('secret', 'graft engine', '8c69633ae9a10a6ca697cc42a74804be',
        'ac862725680cf623bf676ac600a9c42aadf717c2f70d2175c9a23288a32b42c8',
        'M5ZGCZTUEBSW4Z3JNZSQ====', TRUE))
       t(k, m, hmac_md5, hmac_sha256, b32, b32_roundtrip)
       ORDER BY k"""

  /** wilson_interval_lower/upper (reference MathFunctions.java wilson_interval)
    * + split_to_map (reference StringFunctions.java:70 splitToMap). The
    * interval formula is written with identical operation order in both
    * engines; round-8 absorbs any final-ulp noise per the error-model spec.
    * `+ 0.0` on both sides normalizes IEEE -0.0 to +0.0 (DuckDB's round()
    * yields -0.0 for exactly-zero numerators where Spark yields +0.0 —
    * equal as doubles but distinct under the driver's bit-hash). */
  def q_fn_wilson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z = 1.96
    val c = table(s, dir, "customer")
      .withColumn("succ", $"c_custkey" % 50)
      .withColumn("n", lit(50) + $"c_custkey" % 30)
    val p = $"succ".cast("double") / $"n"
    val z2 = lit(z * z)
    def wilson(sign: Double) = round(
      (p + z2 / ($"n" * 2) +
        lit(sign * z) * sqrt(p * (lit(1.0) - p) / $"n" + z2 / (lit(4.0) * $"n" * $"n"))) /
        (lit(1.0) + z2 / $"n"), 8) + lit(0.0)
    c.select($"c_custkey",
        wilson(-1.0).as("wilson_lo"),
        wilson(1.0).as("wilson_hi"),
        element_at(str_to_map(
          concat(lit("seg="), $"c_mktsegment", lit(",nat="), $"c_nationkey"), lit(","), lit("=")),
          "seg").as("seg"),
        element_at(str_to_map(
          concat(lit("seg="), $"c_mktsegment", lit(",nat="), $"c_nationkey"), lit(","), lit("=")),
          "nat").cast("long").as("nat"))
      .orderBy($"c_custkey")
  }
  val qFnWilsonSql: String =
    """WITH t AS (
         SELECT c_custkey, c_mktsegment, c_nationkey,
           c_custkey % 50 AS succ, 50 + c_custkey % 30 AS n
         FROM customer)
       SELECT c_custkey,
         round((succ / CAST(n AS DOUBLE) + 1.96 * 1.96 / (n * 2) +
           -1.96 * sqrt(succ / CAST(n AS DOUBLE) * (1.0 - succ / CAST(n AS DOUBLE)) / n
             + 1.96 * 1.96 / (4.0 * n * n))) / (1.0 + 1.96 * 1.96 / n), 8) + 0.0 AS wilson_lo,
         round((succ / CAST(n AS DOUBLE) + 1.96 * 1.96 / (n * 2) +
           1.96 * sqrt(succ / CAST(n AS DOUBLE) * (1.0 - succ / CAST(n AS DOUBLE)) / n
             + 1.96 * 1.96 / (4.0 * n * n))) / (1.0 + 1.96 * 1.96 / n), 8) + 0.0 AS wilson_hi,
         c_mktsegment AS seg,
         c_nationkey AS nat
       FROM t ORDER BY c_custkey"""

  /** TRY error-suppression semantics (reference: operator/scalar/
    * TryFunction.java:40, TryCastFunction.java): failed casts, div-by-zero,
    * out-of-bounds subscripts → null instead of error. Division outputs stay
    * raw doubles — IEEE quotients are bit-identical across engines. */
  def q_fn_try(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_orderkey, l_linenumber,
         try_divide(l_extendedprice, l_quantity - 25) AS safe_div,
         TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS STRING)
                       ELSE 'x' || l_orderkey END AS BIGINT) AS safe_cast,
         try_element_at(array(l_orderkey, l_partkey, l_suppkey), l_linenumber) AS safe_subscript
         FROM lineitem WHERE l_orderkey <= 2000
         ORDER BY l_orderkey, l_linenumber""")
  }
  val qFnTrySql: String =
    """SELECT l_orderkey, l_linenumber,
       l_extendedprice / nullif(l_quantity - 25, 0) AS safe_div,
       TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS VARCHAR)
                     ELSE 'x' || l_orderkey END AS BIGINT) AS safe_cast,
       ([l_orderkey, l_partkey, l_suppkey])[l_linenumber] AS safe_subscript
       FROM lineitem WHERE l_orderkey <= 2000
       ORDER BY l_orderkey, l_linenumber"""

  /** Interval arithmetic, calendar functions, format-dialect parsing,
    * width_bucket (reference: DateTimeFunctions.java:72, MathFunctions
    * width_bucket; Spark dayofweek is 1-based Sunday, DuckDB 0-based). */
  def q_fn_interval(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
         date_format(o_orderdate + INTERVAL '2' MONTH, 'yyyy-MM-dd') AS plus2m,
         date_format(o_orderdate + INTERVAL '10' DAY, 'yyyy-MM-dd') AS plus10d,
         date_format(date_trunc('week', o_orderdate), 'yyyy-MM-dd') AS week_start,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
         date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end,
         date_format(to_date(date_format(o_orderdate, 'dd/MM/yyyy'), 'dd/MM/yyyy'), 'yyyy-MM-dd') AS dialect_roundtrip,
         CAST(width_bucket(o_totalprice, 0, 600000, 12) AS BIGINT) AS price_bucket
         FROM orders WHERE o_orderkey <= 2000
         ORDER BY o_orderkey""")
  }
  val qFnIntervalSql: String =
    """SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
       strftime(o_orderdate + INTERVAL 10 DAY, '%Y-%m-%d') AS plus10d,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y'), '%Y-%m-%d') AS dialect_roundtrip,
       CAST(CASE WHEN o_totalprice >= 600000 THEN 13
                 WHEN o_totalprice < 0 THEN 0
                 ELSE floor(o_totalprice / (600000.0 / 12)) + 1 END AS BIGINT) AS price_bucket
       FROM orders WHERE o_orderkey <= 2000
       ORDER BY o_orderkey"""

  /** String distance + Unicode normalization (reference: StringFunctions.java
    * levenshtein/hamming/normalize). Char-set Jaccard composed from array
    * builtins; hamming runs on equal-length md5 prefixes. */
  def q_fn_strdist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    def nfc(c: org.apache.spark.sql.Column) = column(graft.ext.NormalizeNfc(expression(c)))
    def hammingStr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      column(graft.ext.StringHamming(expression(a), expression(b)))
    val decomposed = concat(lit("cafe"), lit("́"), lit(" "), $"c_mktsegment")
    table(s, dir, "customer").filter($"c_custkey" <= 300)
      .select($"c_custkey",
        levenshtein($"c_name", $"c_mktsegment").cast("long").as("lev"),
        hammingStr(substring(md5($"c_name"), 1, 8), substring(md5($"c_mktsegment"), 1, 8)).as("ham"),
        (size(array_intersect(array_distinct(split($"c_name", "")), array_distinct(split($"c_mktsegment", "")))).cast("double") /
          size(array_union(array_distinct(split($"c_name", "")), array_distinct(split($"c_mktsegment", "")))))
          .as("char_jaccard"),
        length(decomposed).cast("long").as("len_decomposed"),
        length(nfc(decomposed)).cast("long").as("len_nfc"))
      .orderBy($"c_custkey")
  }
  val qFnStrdistSql: String =
    """SELECT c_custkey,
       levenshtein(c_name, c_mktsegment) AS lev,
       hamming(substr(md5(c_name), 1, 8), substr(md5(c_mktsegment), 1, 8)) AS ham,
       jaccard(c_name, c_mktsegment) AS char_jaccard,
       CAST(length('cafe' || chr(769) || ' ' || c_mktsegment) AS BIGINT) AS len_decomposed,
       CAST(length(nfc_normalize('cafe' || chr(769) || ' ' || c_mktsegment)) AS BIGINT) AS len_nfc
       FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""

  /** json_table-style decomposition (reference: operator/table/json/
    * JsonTable.java — SQL/JSON table function): a JSON array document
    * decomposed into relational rows WITH ORDINALITY via from_json + the
    * posexplode generator. The oracle states the expected rows directly from
    * the generating columns — verifying encode → decompose is lossless. */
  def q_fn_json_table(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = "array<struct<i:bigint,v:double,tag:string>>"
    val d = table(s, dir, "customer").filter($"c_custkey" <= 200)
      .withColumn("doc", to_json(array(
        struct(lit(1L).as("i"), $"c_acctbal".as("v"), lit("bal").as("tag")),
        struct(lit(2L).as("i"), ($"c_custkey" % 100).cast("double").as("v"), lit("mod").as("tag")),
        struct(lit(3L).as("i"), lit(0.5).as("v"), lit("const").as("tag")))))
    d.select($"c_custkey", posexplode(from_json($"doc", lit(schema))))
      .select($"c_custkey", ($"pos" + 1).cast("long").as("ordinality"),
        $"col.i".as("i"), $"col.v".as("v"), $"col.tag".as("tag"))
      .orderBy($"c_custkey", $"ordinality")
  }
  val qFnJsonTableSql: String =
    """WITH rows_expected AS (
         SELECT c_custkey, 1 AS ordinality, CAST(1 AS BIGINT) AS i, c_acctbal AS v, 'bal' AS tag
         FROM customer WHERE c_custkey <= 200
         UNION ALL
         SELECT c_custkey, 2, 2, CAST(c_custkey % 100 AS DOUBLE), 'mod'
         FROM customer WHERE c_custkey <= 200
         UNION ALL
         SELECT c_custkey, 3, 3, 0.5, 'const'
         FROM customer WHERE c_custkey <= 200)
       SELECT c_custkey, CAST(ordinality AS BIGINT) AS ordinality, i, v, tag
       FROM rows_expected ORDER BY c_custkey, ordinality"""

  /** json_table NESTED PATH columns (reference operator/table/json/
    * JsonTable.java — NESTED COLUMNS with the PLAN clause): a document whose
    * items carry a nested array, decomposed into parent-child rows. OUTER
    * plan semantics (parents with empty nested arrays still emit one row
    * with null child columns) via posexplode_outer; INNER is the `present`
    * filter. Ordinality at both levels. The oracle states the expected
    * relational rows directly from the generating columns. */
  def q_fn_json_table_nested(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = "array<struct<i:bigint,tag:string,evs:array<struct<e:bigint,k:string>>>>"
    val emptyEvs = array().cast("array<struct<e:bigint,k:string>>")
    val d = table(s, dir, "customer").filter($"c_custkey" <= 200)
      .withColumn("doc", to_json(array(
        struct(lit(1L).as("i"), lit("a").as("tag"),
          array(struct(lit(10L).as("e"), lit("p").as("k")),
            struct(lit(11L).as("e"), lit("q").as("k"))).as("evs")),
        struct(lit(2L).as("i"), lit("b").as("tag"),
          when($"c_custkey" % 2 === 0,
            array(struct(lit(20L).as("e"), lit("x").as("k"))))
            .otherwise(emptyEvs).as("evs")))))
    d.select($"c_custkey", posexplode(from_json($"doc", lit(schema))))
      .select($"c_custkey", ($"pos" + 1).cast("long").as("ord"),
        $"col.i".as("i"), $"col.tag".as("tag"),
        posexplode_outer($"col.evs").as(Seq("epos", "ev")))
      .select($"c_custkey", $"ord", $"i", $"tag",
        ($"epos" + 1).cast("long").as("ev_ord"),
        $"ev.e".as("e"), $"ev.k".as("k"),
        $"ev".isNotNull.as("present"))
      .orderBy($"c_custkey", $"ord", $"ev_ord".asc_nulls_first)
  }
  val qFnJsonTableNestedSql: String =
    """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey <= 200),
       expected AS (
         SELECT c_custkey, 1 AS ord, CAST(1 AS BIGINT) AS i, 'a' AS tag,
           CAST(1 AS BIGINT) AS ev_ord, CAST(10 AS BIGINT) AS e, 'p' AS k, TRUE AS present
         FROM c
         UNION ALL
         SELECT c_custkey, 1, 1, 'a', 2, 11, 'q', TRUE FROM c
         UNION ALL
         SELECT c_custkey, 2, 2, 'b', 1, 20, 'x', TRUE FROM c WHERE c_custkey % 2 = 0
         UNION ALL
         SELECT c_custkey, 2, 2, 'b', NULL, NULL, NULL, FALSE FROM c WHERE c_custkey % 2 = 1)
       SELECT c_custkey, CAST(ord AS BIGINT) AS ord, i, tag, ev_ord, e, k, present
       FROM expected ORDER BY c_custkey, ord, ev_ord NULLS FIRST"""

  /** json_table at NESTING DEPTH 3 (reference operator/table/json/
    * JsonTable.java — the PLAN tree recurses arbitrarily; r10 verdict
    * carried the ≤2-level residue): parent → child → grandchild, OUTER
    * semantics at EVERY level (an empty array at any depth still emits
    * its ancestor row with null descendant columns), ordinality at all
    * three levels. Lowering: a posexplode chain, one per level — depth-N
    * is N chained explodes, so the 2-level limit was never structural. */
  def q_fn_json_table_deep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = "array<struct<i:bigint,items:array<struct<j:bigint," +
      "evs:array<struct<e:bigint,k:string>>>>>>"
    val noEvs = array().cast("array<struct<e:bigint,k:string>>")
    val noItems = array().cast("array<struct<j:bigint," +
      "evs:array<struct<e:bigint,k:string>>>>")
    val d = table(s, dir, "customer").filter($"c_custkey" <= 200)
      .withColumn("doc", to_json(array(
        struct(lit(1L).as("i"), array(
          struct(lit(10L).as("j"), array(
            struct(lit(100L).as("e"), lit("p").as("k")),
            struct(lit(101L).as("e"), lit("q").as("k"))).as("evs")),
          struct(lit(11L).as("j"),
            when($"c_custkey" % 2 === 0, array(
              struct(lit(110L).as("e"), lit("r").as("k"))))
              .otherwise(noEvs).as("evs"))).as("items")),
        struct(lit(2L).as("i"),
          when($"c_custkey" % 3 === 0, array(
            struct(lit(20L).as("j"), noEvs.as("evs"))))
            .otherwise(noItems).as("items")))))
    d.select($"c_custkey", posexplode(from_json($"doc", lit(schema))))
      .select($"c_custkey", ($"pos" + 1).cast("long").as("ord"),
        $"col.i".as("i"), posexplode_outer($"col.items").as(Seq("jpos", "item")))
      .select($"c_custkey", $"ord", $"i",
        ($"jpos" + 1).cast("long").as("j_ord"), $"item.j".as("j"),
        posexplode_outer($"item.evs").as(Seq("epos", "ev")))
      .select($"c_custkey", $"ord", $"i", $"j_ord", $"j",
        ($"epos" + 1).cast("long").as("e_ord"),
        $"ev.e".as("e"), $"ev.k".as("k"))
      .orderBy($"c_custkey", $"ord", $"j_ord".asc_nulls_first,
        $"e_ord".asc_nulls_first)
  }
  val qFnJsonTableDeepSql: String =
    """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey <= 200),
       expected AS (
         SELECT c_custkey, CAST(1 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS i,
                CAST(1 AS BIGINT) AS j_ord, CAST(10 AS BIGINT) AS j,
                CAST(1 AS BIGINT) AS e_ord, CAST(100 AS BIGINT) AS e, 'p' AS k
         FROM c
         UNION ALL SELECT c_custkey, 1, 1, 1, 10, 2, 101, 'q' FROM c
         UNION ALL SELECT c_custkey, 1, 1, 2, 11, 1, 110, 'r' FROM c
           WHERE c_custkey % 2 = 0
         UNION ALL SELECT c_custkey, 1, 1, 2, 11, NULL, NULL, NULL FROM c
           WHERE c_custkey % 2 = 1
         UNION ALL SELECT c_custkey, 2, 2, 1, 20, NULL, NULL, NULL FROM c
           WHERE c_custkey % 3 = 0
         UNION ALL SELECT c_custkey, 2, 2, NULL, NULL, NULL, NULL, NULL FROM c
           WHERE c_custkey % 3 <> 0)
       SELECT * FROM expected
       ORDER BY c_custkey, ord, j_ord NULLS FIRST, e_ord NULLS FIRST"""

  /** json_table SIBLING nested paths with both PLAN combinators (reference
    * operator/table/json/JsonTable.java; SqlBase.g4 jsonTablePlan — PLAN
    * (P OUTER (C1 UNION C2)) and PLAN (P INNER (C1 CROSS C2))): each item
    * carries TWO nested arrays. UNION emits each sibling's child rows with
    * the other sibling's columns null, plus one all-null row when BOTH
    * siblings are empty under an OUTER parent; CROSS emits the cartesian
    * product of the siblings (parents with any empty sibling drop). Both
    * plans in one result, discriminated by a `plan` column; the oracle
    * states every expected row from the generating parities. */
  def q_fn_json_table_siblings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = "array<struct<i:bigint,ms:array<bigint>,ns:array<string>>>"
    val noM = array().cast("array<bigint>")
    val noN = array().cast("array<string>")
    val d = table(s, dir, "customer").filter($"c_custkey" <= 200)
      .withColumn("doc", to_json(array(
        struct(lit(1L).as("i"), array(lit(100L)).as("ms"),
          array(lit("u"), lit("v")).as("ns")),
        struct(lit(2L).as("i"),
          when($"c_custkey" % 2 === 0, array(lit(200L), lit(201L))).otherwise(noM).as("ms"),
          when($"c_custkey" % 3 === 0, array(lit("w"))).otherwise(noN).as("ns")))))
    val parent = d
      .select($"c_custkey", posexplode(from_json($"doc", lit(schema))))
      .select($"c_custkey", ($"pos" + 1).cast("long").as("ord"),
        $"col.ms".as("ms"), $"col.ns".as("ns"))
    val nullM = Seq(lit(null).cast("long").as("m_ord"), lit(null).cast("long").as("m"))
    val nullN = Seq(lit(null).cast("long").as("n_ord"), lit(null).cast("string").as("n"))
    val mRows = parent.select(Seq($"c_custkey", $"ord") :+
        posexplode($"ms").as(Seq("mp", "m")): _*)
      .select(Seq($"c_custkey", $"ord", ($"mp" + 1).cast("long").as("m_ord"), $"m") ++ nullN: _*)
    val nRows = parent.select(Seq($"c_custkey", $"ord") :+
        posexplode($"ns").as(Seq("np", "n")): _*)
      .select(Seq($"c_custkey", $"ord") ++ nullM ++
        Seq(($"np" + 1).cast("long").as("n_ord"), $"n"): _*)
    val bothEmpty = parent.filter(size($"ms") === 0 && size($"ns") === 0)
      .select(Seq($"c_custkey", $"ord") ++ nullM ++ nullN: _*)
    val unionPlan = mRows.unionByName(nRows).unionByName(bothEmpty)
      .withColumn("plan", lit("union"))
    val crossPlan = parent
      .select(Seq($"c_custkey", $"ord", $"ns") :+ posexplode($"ms").as(Seq("mp", "m")): _*)
      .select(Seq($"c_custkey", $"ord", ($"mp" + 1).cast("long").as("m_ord"), $"m") :+
        posexplode($"ns").as(Seq("np", "n")): _*)
      .select($"c_custkey", $"ord", $"m_ord", $"m",
        ($"np" + 1).cast("long").as("n_ord"), $"n")
      .withColumn("plan", lit("cross"))
    unionPlan.unionByName(crossPlan)
      .orderBy($"c_custkey", $"plan", $"ord",
        $"m_ord".asc_nulls_first, $"n_ord".asc_nulls_first)
  }
  val qFnJsonTableSiblingsSql: String =
    """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey <= 200),
       u AS (
         SELECT c_custkey, CAST(1 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS m_ord,
                CAST(100 AS BIGINT) AS m, CAST(NULL AS BIGINT) AS n_ord, CAST(NULL AS VARCHAR) AS n
         FROM c
         UNION ALL SELECT c_custkey, 1, NULL, NULL, 1, 'u' FROM c
         UNION ALL SELECT c_custkey, 1, NULL, NULL, 2, 'v' FROM c
         UNION ALL SELECT c_custkey, 2, 1, 200, NULL, NULL FROM c WHERE c_custkey % 2 = 0
         UNION ALL SELECT c_custkey, 2, 2, 201, NULL, NULL FROM c WHERE c_custkey % 2 = 0
         UNION ALL SELECT c_custkey, 2, NULL, NULL, 1, 'w' FROM c WHERE c_custkey % 3 = 0
         UNION ALL SELECT c_custkey, 2, NULL, NULL, NULL, NULL FROM c
           WHERE c_custkey % 2 = 1 AND c_custkey % 3 <> 0),
       x AS (
         SELECT c_custkey, CAST(1 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS m_ord,
                CAST(100 AS BIGINT) AS m, CAST(1 AS BIGINT) AS n_ord, 'u' AS n
         FROM c
         UNION ALL SELECT c_custkey, 1, 1, 100, 2, 'v' FROM c
         UNION ALL SELECT c_custkey, 2, 1, 200, 1, 'w' FROM c WHERE c_custkey % 6 = 0
         UNION ALL SELECT c_custkey, 2, 2, 201, 1, 'w' FROM c WHERE c_custkey % 6 = 0)
       SELECT c_custkey, ord, m_ord, m, n_ord, n, 'union' AS plan FROM u
       UNION ALL
       SELECT c_custkey, ord, m_ord, m, n_ord, n, 'cross' AS plan FROM x
       ORDER BY c_custkey, plan, ord, m_ord NULLS FIRST, n_ord NULLS FIRST"""

  /** Geospatial-lite (reference GeoFunctions.java ST_Distance on spherical
    * geography / ST_Contains): synthesized lat/lon points, haversine distance
    * to a fixed point, bbox containment — pure arithmetic, so the oracle
    * recomputes the same formulas. Transcendentals rounded at 1e-8. */
  def q_fn_geo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GeoFunctions._
    val c = table(s, dir, "customer").filter($"c_custkey" <= 500)
      .withColumn("lat", ($"c_custkey" % 180) - 90 + 0.5)
      .withColumn("lon", ($"c_custkey" * 7 % 360) - 180 + 0.5)
    c.select($"c_custkey", $"lat", $"lon",
        round(haversineKm($"lat", $"lon", lit(40.7), lit(-74.0)), 8).as("dist_nyc_km"),
        bboxContains(lit(30.0), lit(-90.0), lit(50.0), lit(-60.0), $"lat", $"lon").as("in_na_box"))
      .orderBy($"c_custkey")
  }
  val qFnGeoSql: String =
    """WITH p AS (
         SELECT c_custkey,
           (c_custkey % 180) - 90 + 0.5 AS lat,
           (c_custkey * 7 % 360) - 180 + 0.5 AS lon
         FROM customer WHERE c_custkey <= 500)
       SELECT c_custkey, lat, lon,
         round(2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(40.7 - lat) / 2), 2) +
           cos(radians(lat)) * cos(radians(40.7)) * pow(sin(radians(-74.0 - lon) / 2), 2))), 8) AS dist_nyc_km,
         lat >= 30.0 AND lat <= 50.0 AND lon >= -90.0 AND lon <= -60.0 AS in_na_box
       FROM p ORDER BY c_custkey"""

  /** Polygon geometry (reference plugin/trino-geospatial GeoFunctions.java
    * ST_Area/ST_Perimeter/ST_Contains) over coordinate-array polygons
    * (graft.ext.GeoExpressions): a notched pentagon per customer + a probe
    * point. Area is verified against the independent closed form (exact in
    * doubles for these integer/half coordinates); perimeter and containment
    * are replayed per-edge by the oracle with identical IEEE arithmetic. */
  def q_fn_geo_polygon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GeoFunctions._
    val t = table(s, dir, "customer")
      .withColumn("w", (($"c_custkey" % 7) + 3).cast("double"))
      .withColumn("h", (($"c_custkey" % 5) + 2).cast("double"))
      .withColumn("k", (($"c_custkey" % 4) + 1).cast("double"))
      .withColumn("px", ($"c_custkey" % 11).cast("double") * lit(0.7))
      .withColumn("py", ($"c_custkey" % 9).cast("double") * lit(0.8))
      .withColumn("xs", array(lit(0.0), $"w", $"w", $"w" * 0.5, lit(0.0)))
      .withColumn("ys", array(lit(0.0), lit(0.0), $"h", $"h" + $"k", $"h"))
    t.select($"c_custkey",
        stArea($"xs", $"ys").as("area"),
        round(stPerimeter($"xs", $"ys"), 8).as("perim"),
        stContains($"px", $"py", $"xs", $"ys").as("inside"))
      .orderBy($"c_custkey")
  }
  val qFnGeoPolygonSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey % 7) + 3 AS DOUBLE) AS w,
           CAST((c_custkey % 5) + 2 AS DOUBLE) AS h,
           CAST((c_custkey % 4) + 1 AS DOUBLE) AS k,
           CAST(c_custkey % 11 AS DOUBLE) * CAST(0.7 AS DOUBLE) AS px,
           CAST(c_custkey % 9 AS DOUBLE) * CAST(0.8 AS DOUBLE) AS py
         FROM customer),
       g AS (
         SELECT *, [0.0, w, w, w * 0.5, 0.0] AS xs, [0.0, 0.0, h, h + k, h] AS ys
         FROM t)
       SELECT c_custkey,
         w * h + w * k * 0.5 AS area,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           [sqrt((xs[1 + i % 5] - xs[i]) * (xs[1 + i % 5] - xs[i])
               + (ys[1 + i % 5] - ys[i]) * (ys[1 + i % 5] - ys[i]))
            for i in range(1, 6)]), (a, x) -> a + x), 8) AS perim,
         (list_reduce(list_prepend(0, [
            CASE WHEN ((ys[i] > py) <> (ys[CASE WHEN i = 1 THEN 5 ELSE i - 1 END] > py))
                  AND px < (xs[CASE WHEN i = 1 THEN 5 ELSE i - 1 END] - xs[i]) * (py - ys[i])
                           / (ys[CASE WHEN i = 1 THEN 5 ELSE i - 1 END] - ys[i]) + xs[i]
                 THEN 1 ELSE 0 END for i in range(1, 6)]), (a, x) -> a + x) % 2) = 1 AS inside
       FROM g ORDER BY c_custkey"""

  /** WKT geometry I/O + polygon-polygon predicates (reference
    * GeoFunctions.java ST_GeometryFromText:123 / ST_AsText / ST_Intersects /
    * ST_Within; graft.ext.WktExpressions). Per-customer square A (dyadic .5
    * coordinates) against a fixed square B (.25 coordinates — never collinear
    * with A, so every predicate stays off boundaries); the general kernels
    * (ray casting + orientation tests) are checked against the ANALYTIC truth
    * for axis-aligned squares (interval containment/overlap), and
    * format(parse(wkt)) roundtrips exactly. */
  def q_fn_geo_wkt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GeoFunctions._
    val t = table(s, dir, "customer")
      .withColumn("x0", (($"c_custkey" % 13) * 2).cast("double") + 0.5)
      .withColumn("y0", (($"c_custkey" % 9) * 2).cast("double") + 0.5)
      .withColumn("sa", (($"c_custkey" % 3) * 2 + 1).cast("double"))
      .withColumn("x1", $"x0" + $"sa")
      .withColumn("y1", $"y0" + $"sa")
      .withColumn("wkt_a", concat(
        lit("POLYGON (("),
        $"x0".cast("string"), lit(" "), $"y0".cast("string"), lit(", "),
        $"x1".cast("string"), lit(" "), $"y0".cast("string"), lit(", "),
        $"x1".cast("string"), lit(" "), $"y1".cast("string"), lit(", "),
        $"x0".cast("string"), lit(" "), $"y1".cast("string"), lit(", "),
        $"x0".cast("string"), lit(" "), $"y0".cast("string"), lit("))")))
      .withColumn("ga", stGeometryFromText($"wkt_a"))
      .withColumn("gl", stGeometryFromText(concat(
        lit("LINESTRING ("),
        $"x0".cast("string"), lit(" "), $"y0".cast("string"), lit(", "),
        $"x1".cast("string"), lit(" "), $"y0".cast("string"), lit(", "),
        $"x1".cast("string"), lit(" "), $"y1".cast("string"), lit(")"))))
      .withColumn("bxs", array(lit(4.25), lit(18.25), lit(18.25), lit(4.25)))
      .withColumn("bys", array(lit(4.25), lit(4.25), lit(18.25), lit(18.25)))
    t.select($"c_custkey",
        $"ga".getField("kind").as("kind"),
        stArea($"ga".getField("xs"), $"ga".getField("ys")).as("area"),
        stPerimeter($"ga".getField("xs"), $"ga".getField("ys")).as("perim"),
        (stAsText($"ga") === $"wkt_a").as("roundtrip_ok"),
        stWithin($"ga".getField("xs"), $"ga".getField("ys"), $"bxs", $"bys").as("within_b"),
        stIntersects($"ga".getField("xs"), $"ga".getField("ys"), $"bxs", $"bys").as("intersects_b"),
        stGeometryFromText(lit("MULTIPOLYGON (((0 0)))")).isNull.as("unsupported_null"),
        stLength($"gl".getField("xs"), $"gl".getField("ys")).as("line_len"))
      .orderBy($"c_custkey")
  }
  val qFnGeoWktSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey % 13) * 2 AS DOUBLE) + 0.5 AS x0,
           CAST((c_custkey % 9) * 2 AS DOUBLE) + 0.5 AS y0,
           CAST((c_custkey % 3) * 2 + 1 AS DOUBLE) AS sa
         FROM customer)
       SELECT c_custkey,
         'POLYGON' AS kind,
         sa * sa AS area,
         4 * sa AS perim,
         TRUE AS roundtrip_ok,
         (x0 > 4.25 AND x0 + sa < 18.25 AND y0 > 4.25 AND y0 + sa < 18.25) AS within_b,
         (x0 < 18.25 AND x0 + sa > 4.25 AND y0 < 18.25 AND y0 + sa > 4.25) AS intersects_b,
         TRUE AS unsupported_null,
         2 * sa AS line_len
       FROM t ORDER BY c_custkey"""

  /** Ring-aware geometry (reference plugin/trino-geospatial GeoFunctions.java
    * ST_Area/ST_Perimeter/ST_Contains/ST_Centroid/ST_XMax/ST_NumGeometries/
    * ST_NumInteriorRing/ST_NumPoints over polygons WITH HOLES, MULTIPOLYGON,
    * MULTILINESTRING). Axis-aligned dyadic rectangles make every measure
    * ANALYTIC (products/sums of dyadics are IEEE-exact, and sqrt of a perfect
    * square and the final centroid division are correctly rounded on
    * identical operands in both engines), so the oracle recomputes them in
    * plain arithmetic. */
  def q_fn_geo_multi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GeoFunctions._
    def n(c: org.apache.spark.sql.Column) = c.cast("string")
    val t = table(s, dir, "part").filter($"p_partkey" <= 400)
      .withColumn("w", $"p_size".cast("double"))
      .withColumn("h", ($"p_size" % 7 + 2).cast("double"))
      // shell (0,0)-(w,h) with hole (w/4,h/4)-(w/2,h/2), closed rings
      .withColumn("wkt_p", concat(
        lit("POLYGON ((0.0 0.0, "), n($"w"), lit(" 0.0, "), n($"w"), lit(" "), n($"h"),
        lit(", 0.0 "), n($"h"), lit(", 0.0 0.0), ("),
        n($"w" / 4), lit(" "), n($"h" / 4), lit(", "),
        n($"w" / 2), lit(" "), n($"h" / 4), lit(", "),
        n($"w" / 2), lit(" "), n($"h" / 2), lit(", "),
        n($"w" / 4), lit(" "), n($"h" / 2), lit(", "),
        n($"w" / 4), lit(" "), n($"h" / 4), lit("))")))
      // two disjoint rectangles
      .withColumn("wkt_mp", concat(
        lit("MULTIPOLYGON (((0.0 0.0, "), n($"w"), lit(" 0.0, "), n($"w"), lit(" "), n($"h"),
        lit(", 0.0 "), n($"h"), lit(", 0.0 0.0)), (("),
        n($"w" + 2), lit(" 0.0, "), n($"w" + 3), lit(" 0.0, "),
        n($"w" + 3), lit(" "), n($"h"), lit(", "),
        n($"w" + 2), lit(" "), n($"h"), lit(", "),
        n($"w" + 2), lit(" 0.0)))")))
      .withColumn("wkt_ml", concat(
        lit("MULTILINESTRING ((0.0 0.0, "), n($"w"), lit(" 0.0), (0.0 "), n($"h"),
        lit(", "), n($"w"), lit(" "), n($"h"), lit("))")))
      .withColumn("gp", stGeometryFromText($"wkt_p"))
      .withColumn("gmp", stGeometryFromText($"wkt_mp"))
      .withColumn("gml", stGeometryFromText($"wkt_ml"))
    t.select($"p_partkey",
        stGeomArea($"gp").as("area_p"),
        stGeomPerimeter($"gp").as("peri_p"),
        stGeomArea($"gmp").as("area_mp"),
        stGeomContains($"gp", $"w" / 8, $"h" / 8).as("c_in"),
        stGeomContains($"gp", $"w" * 3 / 8, $"h" * 3 / 8).as("c_hole"),
        stCentroidX($"gp").as("cx_p"),
        stCentroidY($"gp").as("cy_p"),
        stXMax($"gmp").as("x_max"),
        stYMin($"gmp").as("y_min"),
        stNumGeometries($"gmp").as("n_geoms"),
        stNumInteriorRing($"gp").as("n_holes"),
        stNumPoints($"gp").as("n_points"),
        stGeomLength($"gml").as("ml_len"),
        (stAsText($"gp") === $"wkt_p").as("rt_p_ok"),
        (stAsText($"gmp") === $"wkt_mp").as("rt_mp_ok"))
      .orderBy($"p_partkey")
  }
  val qFnGeoMultiSql: String =
    """WITH t AS (
         SELECT p_partkey, CAST(p_size AS DOUBLE) AS w,
           CAST(p_size % 7 + 2 AS DOUBLE) AS h
         FROM part WHERE p_partkey <= 400)
       SELECT p_partkey,
         w*h - (w/4)*(h/4) AS area_p,
         2*(w+h) + 2*(w/4 + h/4) AS peri_p,
         w*h + h AS area_mp,
         TRUE AS c_in,
         FALSE AS c_hole,
         (w*h*(w/2) - (w/4)*(h/4)*(3*w/8)) / (w*h - (w/4)*(h/4)) AS cx_p,
         (w*h*(h/2) - (w/4)*(h/4)*(3*h/8)) / (w*h - (w/4)*(h/4)) AS cy_p,
         w + 3 AS x_max,
         0.0 AS y_min,
         CAST(2 AS INTEGER) AS n_geoms,
         CAST(1 AS INTEGER) AS n_holes,
         CAST(10 AS INTEGER) AS n_points,
         2*w AS ml_len,
         TRUE AS rt_p_ok,
         TRUE AS rt_mp_ok
       FROM t ORDER BY p_partkey"""

  /** Color/diagnostic render functions (reference operator/scalar/
    * ColorFunctions.java: rgb, color, bar) — deterministic subset: packed rgb
    * ints, hex rendering, and an ANSI-free bar() (the reference's bar embeds
    * terminal color codes; the geometry of the bar is what is verified). */
  def q_fn_color(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
      .withColumn("r", ($"c_custkey" % 256).cast("int"))
      .withColumn("g", ($"c_custkey" * 7 % 256).cast("int"))
      .withColumn("b", ($"c_custkey" * 13 % 256).cast("int"))
      .withColumn("frac", ($"c_acctbal" + 1000.0) / 11000.0)
    val width = 20
    val fill = floor(greatest(lit(0.0), least(lit(1.0), $"frac")) * width).cast("int")
    c.select($"c_custkey",
        (shiftleft($"r", 16) + shiftleft($"g", 8) + $"b").cast("long").as("rgb"),
        lpad(hex(shiftleft($"r", 16) + shiftleft($"g", 8) + $"b"), 6, "0").as("hex"),
        concat(lit("["), rpad(repeat(lit("#"), fill), width, " "), lit("]")).as("bar"))
      .orderBy($"c_custkey")
  }
  val qFnColorSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST(c_custkey % 256 AS INT) AS r,
           CAST(c_custkey * 7 % 256 AS INT) AS g,
           CAST(c_custkey * 13 % 256 AS INT) AS b,
           CAST(FLOOR(GREATEST(0.0, LEAST(1.0, (c_acctbal + 1000.0) / 11000.0)) * 20) AS INT) AS fill
         FROM customer)
       SELECT c_custkey,
         CAST((r << 16) + (g << 8) + b AS BIGINT) AS rgb,
         lpad(hex((r << 16) + (g << 8) + b), 6, '0') AS hex,
         '[' || rpad(repeat('#', fill), 20, ' ') || ']' AS bar
       FROM t ORDER BY c_custkey"""

  /** ST_ConvexHull (reference plugin/trino-geospatial GeoFunctions.java
    * ST_ConvexHull): Andrew's monotone chain over a shuffled complete grid
    * plus one off-lattice outlier per nation — the hull is analytically a
    * 5-gon (4 grid corners + the outlier), so the oracle states its exact
    * area (dyadic shoelace, order-independent), perimeter (replayed in the
    * kernel's edge order), vertex count, canonical first vertex, and
    * coordinate sums. The input permutation (i·37 mod w², a bijection since
    * 37 is prime > w) proves the hull does not depend on point order. */
  def q_fn_geo_convexhull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GeoFunctions._
    val t = table(s, dir, "nation")
      .withColumn("w", ($"n_nationkey" % 3 + 5).cast("int"))
      .withColumn("gx", ($"n_nationkey" * 20).cast("double"))
      .withColumn("gy", ($"n_nationkey" * 10).cast("double"))
      .withColumn("xs", concat(
        transform(sequence(lit(0), $"w" * $"w" - 1),
          i => $"gx" + pmod(i * 37, $"w" * $"w") % $"w"),
        array($"gx" + $"w" + 1)))
      .withColumn("ys", concat(
        transform(sequence(lit(0), $"w" * $"w" - 1),
          i => $"gy" + floor(pmod(i * 37, $"w" * $"w") / $"w")),
        array($"gy" + ($"w" - 1) / 2.0)))
      .withColumn("hull", stConvexHull($"xs", $"ys"))
    t.select($"n_nationkey",
        size($"hull.xs").as("n_hull"),
        element_at($"hull.xs", 1).as("first_x"),
        element_at($"hull.ys", 1).as("first_y"),
        aggregate($"hull.xs", lit(0.0), (a, x) => a + x).as("sum_xs"),
        aggregate($"hull.ys", lit(0.0), (a, y) => a + y).as("sum_ys"),
        stArea($"hull.xs", $"hull.ys").as("hull_area"),
        stPerimeter($"hull.xs", $"hull.ys").as("hull_perimeter"))
      .orderBy($"n_nationkey")
  }
  val qFnGeoConvexhullSql: String =
    """WITH t AS (
         SELECT n_nationkey,
           CAST(n_nationkey % 3 + 5 AS DOUBLE) AS w,
           CAST(n_nationkey * 20 AS DOUBLE) AS gx,
           CAST(n_nationkey * 10 AS DOUBLE) AS gy
         FROM nation)
       SELECT n_nationkey,
         5 AS n_hull,
         gx AS first_x,
         gy AS first_y,
         5 * gx + 3 * w - 1 AS sum_xs,
         5 * gy + 2 * (w - 1) + (w - 1) / 2.0 AS sum_ys,
         (w - 1) * (w - 1) + (w - 1) AS hull_area,
         (((0.0 + (w - 1)) + sqrt(4.0 + ((w - 1) / 2.0) * ((w - 1) / 2.0)))
            + sqrt(4.0 + ((w - 1) / 2.0) * ((w - 1) / 2.0)) + (w - 1)) + (w - 1) AS hull_perimeter
       FROM t ORDER BY n_nationkey"""

  /** IPADDRESS with IPv6 (reference spi/type/IpAddressType 16-byte encoding +
    * operator/scalar/IpAddressFunctions.java:40 contains): parse of padded/
    * uppercase/compressed/v4-mapped forms, RFC 5952 canonical rendering
    * (longest zero run compressed, first on ties, single groups kept,
    * v4-mapped rendered dotted), and CIDR containment across both families.
    * The oracle rebuilds every canonical string with independent hex math. */
  def q_fn_ipv6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    def toIp(c: org.apache.spark.sql.Column) = column(graft.ext.ToIpAddress(expression(c)))
    def fmt(c: org.apache.spark.sql.Column) = column(graft.ext.IpAddressFormat(expression(c)))
    def cont(n: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column) =
      column(graft.ext.IpContains(expression(n), expression(a)))
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("x", ($"c_custkey" % 65535 + 1).cast("long"))
      .withColumn("y", ($"c_custkey" * 7 % 65535 + 1).cast("long"))
      .withColumn("hx", lpad(upper(hex($"x")), 4, "0"))
      .withColumn("hy", lpad(upper(hex($"y")), 4, "0"))
      // tie of two 2-zero runs → FIRST compresses
      .withColumn("raw_tie", concat(lit("2001:0DB8:0:0:"), $"hx", lit(":0:0:"), $"hy"))
      // single zero group + 3-zero run → only the long run compresses
      .withColumn("raw_single", concat(lit("2001:0DB8:0000:"), $"hx", lit(":0:0:0:"), $"hy"))
      .withColumn("dotted", concat(lit("10."), $"c_custkey" % 256, lit("."),
        $"c_custkey" * 3 % 256, lit(".7")))
      .withColumn("raw_mapped", concat(lit("::FFFF:"), $"dotted"))
    t.select($"c_custkey",
        fmt(toIp($"raw_tie")).as("canon_tie"),
        fmt(toIp($"raw_single")).as("canon_single"),
        fmt(toIp($"raw_mapped")).as("canon_mapped"),
        (fmt(toIp(fmt(toIp($"raw_tie")))) === fmt(toIp($"raw_tie"))).as("roundtrip_ok"),
        cont(lit("2001:db8::/32"), toIp($"raw_tie")).as("in_db8_32"),
        cont(lit("2001:db9::/32"), toIp($"raw_tie")).as("in_db9_32"),
        cont(lit("2001:0DB8:0:0:0:0:0:0/128"), toIp($"raw_tie")).as("in_exact_128"),
        cont(concat(lit("10."), $"c_custkey" % 256, lit(".0.0/16")), toIp($"dotted")).as("in_own_16"),
        cont(lit("10.0.0.0/8"), toIp($"raw_tie")).as("v6_in_v4_net"),
        fmt(toIp(lit("not-an-ip"))).isNull.as("malformed_null"))
      .orderBy($"c_custkey")
  }
  val qFnIpv6Sql: String =
    """SELECT c_custkey,
         '2001:db8::' || lower(to_hex(c_custkey % 65535 + 1)) || ':0:0:' || lower(to_hex(c_custkey * 7 % 65535 + 1)) AS canon_tie,
         '2001:db8:0:' || lower(to_hex(c_custkey % 65535 + 1)) || '::' || lower(to_hex(c_custkey * 7 % 65535 + 1)) AS canon_single,
         '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || CAST(c_custkey * 3 % 256 AS VARCHAR) || '.7' AS canon_mapped,
         TRUE AS roundtrip_ok,
         TRUE AS in_db8_32,
         FALSE AS in_db9_32,
         FALSE AS in_exact_128,
         TRUE AS in_own_16,
         FALSE AS v6_in_v4_net,
         TRUE AS malformed_null
       FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey"""

  /** Session/system functions (reference operator/scalar/SessionFunctions.java,
    * TypeOfFunction.java, VersionFunction.java): current_user / current
    * catalog / version() / typeof(x) in the reference's type vocabulary.
    * typeof is foldable and constant-folds to a literal; the oracle pins the
    * exact type-name strings, and current_user is checked as a non-empty
    * invariant rather than an environment-dependent value. */
  def q_fn_session(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    graft.functions.Registry.registerAll(s)
    def typeofCol(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.TrinoTypeOf(ColumnBridge.expression(c)))
    table(s, dir, "customer").limit(1)
      .select(
        lit(graft.functions.SessionFunctions.catalogName).as("catalog_name"),
        lit(graft.functions.SessionFunctions.engineVersion).as("engine_version"),
        (length(current_user()) > 0).as("user_ok"),
        typeofCol($"c_custkey").as("t_bigint"),
        typeofCol($"c_name").as("t_varchar"),
        typeofCol($"c_acctbal".cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("t_decimal"),
        typeofCol(split($"c_name", "#")).as("t_array"),
        typeofCol($"c_acctbal" > 0).as("t_boolean"))
  }
  val qFnSessionSql: String =
    s"""SELECT 'graft' AS catalog_name,
       '${graft.functions.SessionFunctions.engineVersion}' AS engine_version,
       TRUE AS user_ok,
       'bigint' AS t_bigint, 'varchar' AS t_varchar,
       'decimal(12,2)' AS t_decimal, 'array(varchar)' AS t_array,
       'boolean' AS t_boolean"""

  val queries: Map[String, Q] = Map(
    "q_fn_session" -> q_fn_session _,
    "q_fn_geo_wkt" -> q_fn_geo_wkt _,
    "q_fn_geo_multi" -> q_fn_geo_multi _,
    "q_fn_color" -> q_fn_color _,
    "q_fn_geo_polygon" -> q_fn_geo_polygon _,
    "q_fn_geo_convexhull" -> q_fn_geo_convexhull _,
    "q_fn_geo" -> q_fn_geo _,
    "q_fn_json_table" -> q_fn_json_table _,
    "q_fn_json_table_nested" -> q_fn_json_table_nested _,
    "q_fn_json_table_siblings" -> q_fn_json_table_siblings _,
    "q_fn_json_table_deep" -> q_fn_json_table_deep _,
    "q_fn_strdist" -> q_fn_strdist _,
    "q_fn_try" -> q_fn_try _,
    "q_fn_interval" -> q_fn_interval _,
    "q_fn_url" -> q_fn_url _,
    "q_fn_uuid_ip" -> q_fn_uuid_ip _,
    "q_fn_ipv6" -> q_fn_ipv6 _,
    "q_fn_ngrams" -> q_fn_ngrams _,
    "q_fn_sqljson" -> q_fn_sqljson _,
    "q_fn_jsonpath" -> q_fn_jsonpath _,
    "q_fn_crypto" -> q_fn_crypto _,
    "q_fn_wilson" -> q_fn_wilson _)

  val oracles: Map[String, String] = Map(
    "q_fn_session" -> qFnSessionSql,
    "q_fn_geo_wkt" -> qFnGeoWktSql,
    "q_fn_geo_multi" -> qFnGeoMultiSql,
    "q_fn_color" -> qFnColorSql,
    "q_fn_geo_polygon" -> qFnGeoPolygonSql,
    "q_fn_geo_convexhull" -> qFnGeoConvexhullSql,
    "q_fn_geo" -> qFnGeoSql,
    "q_fn_json_table" -> qFnJsonTableSql,
    "q_fn_json_table_nested" -> qFnJsonTableNestedSql,
    "q_fn_json_table_siblings" -> qFnJsonTableSiblingsSql,
    "q_fn_json_table_deep" -> qFnJsonTableDeepSql,
    "q_fn_strdist" -> qFnStrdistSql,
    "q_fn_try" -> qFnTrySql,
    "q_fn_interval" -> qFnIntervalSql,
    "q_fn_url" -> qFnUrlSql,
    "q_fn_uuid_ip" -> qFnUuidIpSql,
    "q_fn_ipv6" -> qFnIpv6Sql,
    "q_fn_ngrams" -> qFnNgramsSql,
    "q_fn_sqljson" -> qFnSqljsonSql,
    "q_fn_jsonpath" -> qFnJsonpathSql,
    "q_fn_crypto" -> qFnCryptoSql,
    "q_fn_wilson" -> qFnWilsonSql)
}
