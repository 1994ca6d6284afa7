package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function bundles (SURVEY.md §2.8) + UNNEST (§2.9).
  *
  * Each query exercises one bundle of the reference's function library
  * (558 @ScalarFunction impls under core/trino-main/.../operator/scalar/) through
  * Spark's codegen'd built-ins — no UDFs anywhere, so every expression stays
  * inside whole-stage codegen.
  *
  * Reference anchors: StringFunctions.java:70, MathFunctions.java:79,
  * DateTimeFunctions.java:72, JoniRegexpFunctions.java:48, VarbinaryFunctions.java:41,
  * ArrayTransformFunction.java:72 and the array/map packages, unnest/UnnestOperator.java:45.
  */
object Functions {

  def q_fn_string(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        upper($"p_name").as("uname"),
        length($"p_name").cast("int").as("name_len"),
        substring($"p_name", 1, 8).as("name8"),
        lpad($"p_brand", 12, "*").as("brand_pad"),
        regexp_replace($"p_name", " ", "_").as("snake"),
        reverse($"p_brand").as("brand_rev"),
        split_part($"p_type", lit(" "), lit(1)).as("type_head"),
        instr($"p_name", "a").cast("int").as("pos_a"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        expr("left(p_name, 5)").as("name_l5"),
        expr("right(p_name, 5)").as("name_r5"),
        repeat($"p_brand", 2).as("brand2"),
        translate($"p_brand", "#", "N").as("brand_tl"),
        levenshtein($"p_name", $"p_type").cast("long").as("lev"))
      .orderBy($"p_partkey")
  }
  val qFnStringSql: String =
    """SELECT p_partkey, upper(p_name) AS uname, CAST(length(p_name) AS INT) AS name_len,
       substr(p_name, 1, 8) AS name8, lpad(p_brand, 12, '*') AS brand_pad,
       replace(p_name, ' ', '_') AS snake, reverse(p_brand) AS brand_rev,
       split_part(p_type, ' ', 1) AS type_head, CAST(instr(p_name, 'a') AS INT) AS pos_a,
       concat_ws('-', p_brand, p_type) AS brand_type,
       left(p_name, 5) AS name_l5, right(p_name, 5) AS name_r5,
       repeat(p_brand, 2) AS brand2, translate(p_brand, '#', 'N') AS brand_tl,
       levenshtein(p_name, p_type) AS lev
       FROM part ORDER BY p_partkey"""

  /** Math bundle; transcendentals rounded to 8 decimals (libm implementations
    * differ in the last ulp between engines). */
  def q_fn_math(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_orderkey" % 100 === 0)
      .select($"l_orderkey", $"l_linenumber",
        round(log($"l_extendedprice"), 8).as("ln_price"),
        round(log10($"l_extendedprice"), 8).as("log10_price"),
        round(exp($"l_discount"), 8).as("exp_disc"),
        round(sqrt($"l_quantity"), 8).as("sqrt_qty"),
        pow($"l_quantity", 2).as("qty_sq"),
        ($"l_linenumber" % 3).as("mod3"),
        signum($"l_discount" - 0.05).as("sg"),
        abs($"l_discount" - 0.05).as("ab"),
        ceil($"l_extendedprice" / 1000).cast("long").as("ce"),
        floor($"l_extendedprice" / 1000).cast("long").as("fl"),
        greatest($"l_quantity", lit(25.0)).as("gr"),
        least($"l_quantity", lit(25.0)).as("le"),
        round($"l_extendedprice" * 3, 2).as("price3"),
        width_bucket($"l_quantity", lit(0.0), lit(50.0), lit(5L)).as("qty_bucket"),
        round(atan2($"l_quantity", lit(10.0)), 8).as("at2"),
        round(sin($"l_discount"), 8).as("sin_disc"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val qFnMathSql: String =
    """SELECT l_orderkey, l_linenumber,
       round(ln(l_extendedprice), 8) AS ln_price,
       round(log10(l_extendedprice), 8) AS log10_price,
       round(exp(l_discount), 8) AS exp_disc,
       round(sqrt(l_quantity), 8) AS sqrt_qty,
       power(l_quantity, 2) AS qty_sq,
       CAST(mod(l_linenumber, 3) AS INT) AS mod3,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
       abs(l_discount - 0.05) AS ab,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ce,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS fl,
       greatest(l_quantity, 25.0) AS gr, least(l_quantity, 25.0) AS le,
       round(l_extendedprice * 3, 2) AS price3,
       CAST(CASE WHEN l_quantity >= 50.0 THEN 6 ELSE floor(l_quantity / 10.0) + 1 END AS BIGINT) AS qty_bucket,
       round(atan2(l_quantity, 10.0), 8) AS at2,
       round(sin(l_discount), 8) AS sin_disc
       FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, l_linenumber"""

  def q_fn_datetime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .filter($"o_orderkey" % 50 === 0)
      .select($"o_orderkey",
        year($"o_orderdate").cast("int").as("y"),
        month($"o_orderdate").cast("int").as("m"),
        dayofmonth($"o_orderdate").cast("int").as("d"),
        quarter($"o_orderdate").cast("int").as("q"),
        dayofyear($"o_orderdate").cast("int").as("doy"),
        (weekday($"o_orderdate") + 1).cast("int").as("isodow"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
        date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).cast("long").as("days_to_2002"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }
  val qFnDatetimeSql: String =
    """SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d, CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofyear(o_orderdate) AS INT) AS doy, CAST(isodow(o_orderdate) AS INT) AS isodow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
       FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey"""

  def q_fn_conditional(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .filter($"o_orderkey" % 50 === 0)
      .select($"o_orderkey",
        when($"o_totalprice" > 300000, "high")
          .when($"o_totalprice" > 100000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_x"),
        when($"o_orderpriority".startsWith("1"), 1).otherwise(0).cast("int").as("urgent"),
        greatest($"o_totalprice", lit(150000.0)).as("floor_price"),
        (nullif($"o_orderstatus", lit("P")).isNull).as("is_p"))
      .orderBy($"o_orderkey")
  }
  val qFnConditionalSql: String =
    """SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
       CAST(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS INT) AS urgent,
       greatest(o_totalprice, 150000.0) AS floor_price,
       nullif(o_orderstatus, 'P') IS NULL AS is_p
       FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey"""

  /** Regex bundle — patterns restricted to the RE2/Java-regex common subset. */
  def q_fn_regex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .filter($"doc_id" < 200)
      .select($"doc_id",
        regexp_extract($"text", "([a-z]+)", 1).as("first_word"),
        $"text".rlike("join").as("has_join"),
        $"text".rlike("^the ").as("starts_the"),
        length(regexp_replace($"text", "[aeiou]", "")).cast("long").as("novowel_len"),
        size(regexp_extract_all($"text", lit("data"), lit(0))).cast("long").as("n_data"),
        regexp_replace($"text", "\\s+", " ").substr(1, 40).as("head40"))
      .orderBy($"doc_id")
  }
  val qFnRegexSql: String =
    """SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       regexp_matches(text, 'join') AS has_join,
       regexp_matches(text, '^the ') AS starts_the,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len,
       CAST(len(regexp_extract_all(text, 'data', 0)) AS BIGINT) AS n_data,
       substr(regexp_replace(text, '\s+', ' ', 'g'), 1, 40) AS head40
       FROM documents WHERE doc_id < 200 ORDER BY doc_id"""

  /** Array/lambda bundle over embeddings (HOFs: transform/filter/aggregate/slice;
    * reference: ArrayTransformFunction.java:72, ArrayFilterFunction, ArrayReduceFunction). */
  def q_fn_array(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "embeddings")
      .filter($"vec_id" < 100)
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        round(aggregate($"embedding", lit(0.0d), (acc, x) => acc + x.cast("double")), 6).as("vsum"),
        size(filter($"embedding", x => x > 0.0f)).cast("long").as("n_pos"),
        round(aggregate(transform($"embedding", x => (x * x).cast("double")), lit(0.0d), (a, x) => a + x), 6).as("sumsq"),
        round(element_at($"embedding", 1).cast("double"), 6).as("first_dim"),
        round(aggregate(slice($"embedding", 1, 8), lit(0.0d), (a, x) => a + x.cast("double")), 6).as("head8_sum"),
        array_contains(transform($"embedding", x => x > 0.5f), lit(true)).as("any_gt_half"))
      .orderBy($"vec_id")
  }
  val qFnArraySql: String =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, x) -> a + x), 6) AS vsum,
       CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT) AS n_pos,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x * x AS DOUBLE))), (a, x) -> a + x), 6) AS sumsq,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), (a, x) -> a + x), 6) AS head8_sum,
       list_contains(list_transform(embedding, x -> x > 0.5), true) AS any_gt_half
       FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"""

  /** Hash/binary bundle (reference: VarbinaryFunctions.java:41, HmacFunctions.java). */
  def q_fn_hash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id",
        md5($"text".cast("binary")).as("md5_hex"),
        sha2($"text".cast("binary"), 256).as("sha256_hex"),
        base64(substring($"text", 1, 12).cast("binary")).as("head_b64"),
        hex(substring($"text", 1, 6).cast("binary")).as("head_hex"),
        md5(reverse($"text").cast("binary")).as("md5_rev"))
      .orderBy($"doc_id")
  }
  val qFnHashSql: String =
    """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
       to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS head_b64,
       upper(hex(CAST(substr(text, 1, 6) AS BLOB))) AS head_hex,
       md5(reverse(text)) AS md5_rev
       FROM documents WHERE doc_id < 100 ORDER BY doc_id"""

  /** UNNEST WITH ORDINALITY (reference: operator/unnest/UnnestOperator.java:45)
    * → posexplode; generator runs inside the scan stage, no shuffle. */
  def q_unnest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .filter($"doc_id" < 20)
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("word"))
      .orderBy($"doc_id", $"pos")
  }
  val qUnnestSql: String =
    """SELECT doc_id, CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
       unnest(string_split(text, ' ')) AS word
       FROM documents WHERE doc_id < 20 ORDER BY doc_id, pos"""

  val queries: Map[String, Q] = Map(
    "q_fn_string" -> q_fn_string _,
    "q_fn_math" -> q_fn_math _,
    "q_fn_datetime" -> q_fn_datetime _,
    "q_fn_conditional" -> q_fn_conditional _,
    "q_fn_regex" -> q_fn_regex _,
    "q_fn_array" -> q_fn_array _,
    "q_fn_hash" -> q_fn_hash _,
    "q_unnest" -> q_unnest _)

  val oracles: Map[String, String] = Map(
    "q_fn_string" -> qFnStringSql,
    "q_fn_math" -> qFnMathSql,
    "q_fn_datetime" -> qFnDatetimeSql,
    "q_fn_conditional" -> qFnConditionalSql,
    "q_fn_regex" -> qFnRegexSql,
    "q_fn_array" -> qFnArraySql,
    "q_fn_hash" -> qFnHashSql,
    "q_unnest" -> qUnnestSql)
}
