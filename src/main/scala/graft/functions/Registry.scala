package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration of every custom function in the engine —
  * the analogue of the reference's GlobalFunctionCatalog assembly
  * (reference: core/trino-main/src/main/java/io/trino/metadata/
  * GlobalFunctionCatalog.java:72, fed by SystemFunctionBundle.java:385).
  * Spark built-ins cover the rest of the library; these are the expressions
  * the engine adds. */
object Registry {

  /** Names registered, for discovery/specs. */
  val customFunctions: Seq[String] = Seq(
    "cosine_similarity", "minhash_agreement", "hamming_distance",
    "poly_fingerprint", "simhash_bands", "word_stem",
    "md5_simhash60", "hmac_md5", "hmac_sha256", "hmac_sha512",
    "to_base32", "from_base32", "st_area", "st_perimeter", "st_contains",
    "st_geometry_from_text", "st_as_text", "st_intersects", "st_within", "st_length",
    "json_path_value", "json_path_query", "json_path_status",
    "set_digest_cardinality", "jaccard_index", "intersection_cardinality",
    "typeof",
    "to_ieee754_64", "from_ieee754_64", "to_ieee754_32", "from_ieee754_32",
    "to_big_endian_32", "from_big_endian_32",
    "split_to_multimap", "multimap_from_entries", "array_histogram",
    // scalar-name parity batch (round 8)
    "hmac_sha1", "combine_hash", "levenshtein_distance", "from_utf8", "to_utf8",
    "from_hex", "to_hex", "from_base64", "to_base64", "from_base64url",
    "to_base64url", "is_finite", "is_infinite", "cosine_distance",
    "space_trimmed_length", "to_unixtime", "day_of_week", "dow", "day_of_year",
    "doy", "week_of_year", "week", "year_of_week", "yow", "from_iso8601_date",
    "from_iso8601_timestamp", "bitwise_and", "bitwise_or", "bitwise_xor",
    "bitwise_not", "bitwise_left_shift", "bitwise_right_shift",
    "bitwise_right_shift_arithmetic", "t_cdf", "t_pdf", "murmur3",
    "regexp_position", "json_array_contains", "json_parse", "json_format",
    "title_case")

  def registerAll(spark: SparkSession): Unit = {
    VectorFunctions.register(spark)
    TextFunctions.register(spark)
    SessionFunctions.register(spark)
    val r = spark.sessionState.functionRegistry
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
      e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        .value.toString
    r.createOrReplaceTempFunction("md5_simhash60",
      es => graft.ext.Md5SimHash60(es(0)), "built-in")
    r.createOrReplaceTempFunction("hmac_md5",
      es => graft.ext.HmacHex(es(0), es(1), "HmacMD5"), "built-in")
    r.createOrReplaceTempFunction("hmac_sha256",
      es => graft.ext.HmacHex(es(0), es(1), "HmacSHA256"), "built-in")
    r.createOrReplaceTempFunction("hmac_sha512",
      es => graft.ext.HmacHex(es(0), es(1), "HmacSHA512"), "built-in")
    r.createOrReplaceTempFunction("to_base32",
      es => graft.ext.ToBase32(es(0)), "built-in")
    r.createOrReplaceTempFunction("from_base32",
      es => graft.ext.FromBase32(es(0)), "built-in")
    r.createOrReplaceTempFunction("st_area",
      es => graft.ext.PolygonArea(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("st_perimeter",
      es => graft.ext.PolygonPerimeter(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("st_contains",
      es => graft.ext.PolygonContains(es(0), es(1), es(2), es(3)), "built-in")
    r.createOrReplaceTempFunction("st_geometry_from_text",
      es => graft.ext.WktParse(es(0)), "built-in")
    r.createOrReplaceTempFunction("st_as_text",
      es => graft.ext.WktFormat(es(0)), "built-in")
    r.createOrReplaceTempFunction("st_length",
      es => graft.ext.LineStringLength(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("st_intersects",
      es => graft.ext.PolygonIntersects(es(0), es(1), es(2), es(3)), "built-in")
    r.createOrReplaceTempFunction("st_within",
      es => graft.ext.PolygonWithin(es(0), es(1), es(2), es(3)), "built-in")
    // path (and optional PASSING vars object) must be string literals
    // (parsed at plan time)
    r.createOrReplaceTempFunction("json_path_value",
      es => graft.ext.JsonPathValue(es(0), lit(es(1)), es.drop(2).headOption.map(lit)), "built-in")
    r.createOrReplaceTempFunction("json_path_query",
      es => graft.ext.JsonPathQuery(es(0), lit(es(1)), es.drop(2).headOption.map(lit)), "built-in")
    r.createOrReplaceTempFunction("json_path_status",
      es => graft.ext.JsonPathStatus(es(0), lit(es(1)), es.drop(2).headOption.map(lit)), "built-in")
    r.createOrReplaceTempFunction("set_digest_cardinality",
      es => graft.functions.KmvCardinality(es(0)), "built-in")
    r.createOrReplaceTempFunction("jaccard_index",
      es => graft.functions.KmvJaccard(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("intersection_cardinality",
      es => graft.functions.KmvIntersection(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("to_ieee754_64",
      es => graft.ext.ToIeee754B64(es(0)), "built-in")
    r.createOrReplaceTempFunction("from_ieee754_64",
      es => graft.ext.FromIeee754B64(es(0)), "built-in")
    r.createOrReplaceTempFunction("to_ieee754_32",
      es => graft.ext.ToIeee754B32(es(0)), "built-in")
    r.createOrReplaceTempFunction("from_ieee754_32",
      es => graft.ext.FromIeee754B32(es(0)), "built-in")
    r.createOrReplaceTempFunction("to_big_endian_32",
      es => graft.ext.ToBigEndian32(es(0)), "built-in")
    r.createOrReplaceTempFunction("from_big_endian_32",
      es => graft.ext.FromBigEndian32(es(0)), "built-in")
    r.createOrReplaceTempFunction("split_to_multimap",
      es => graft.ext.SplitToMultimap(es(0), es(1), es(2)), "built-in")
    r.createOrReplaceTempFunction("multimap_from_entries",
      es => graft.ext.MultimapFromEntries(es(0)), "built-in")
    r.createOrReplaceTempFunction("array_histogram",
      es => graft.ext.ArrayHistogram(es(0)), "built-in")

    // ---- scalar-name parity batch (round 8): reference names that are
    // compositions of Spark built-ins or the parity expressions. Each
    // mapping cites the semantic it preserves where it is not obvious.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DateType, DoubleType, TimestampType}
    r.createOrReplaceTempFunction("hmac_sha1",
      es => graft.ext.HmacHex(es(0), es(1), "HmacSHA1"), "built-in")
    // CombineHashFunction.getHash: 31 * previous + value
    r.createOrReplaceTempFunction("combine_hash",
      es => Add(Multiply(es(0), Literal(31L)), es(1)), "built-in")
    r.createOrReplaceTempFunction("levenshtein_distance",
      es => Levenshtein(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("from_utf8",
      es => StringDecode(es(0), Literal("UTF-8")), "built-in")
    r.createOrReplaceTempFunction("to_utf8",
      es => Encode(es(0), Literal("UTF-8")), "built-in")
    r.createOrReplaceTempFunction("from_hex", es => Unhex(es(0)), "built-in")
    r.createOrReplaceTempFunction("to_hex", es => Hex(es(0)), "built-in")
    r.createOrReplaceTempFunction("from_base64", es => UnBase64(es(0)), "built-in")
    r.createOrReplaceTempFunction("to_base64", es => Base64(es(0)), "built-in")
    // base64url = base64 with the URL-safe alphabet (RFC 4648 §5)
    r.createOrReplaceTempFunction("from_base64url",
      es => UnBase64(StringTranslate(es(0), Literal("-_"), Literal("+/"))), "built-in")
    r.createOrReplaceTempFunction("to_base64url",
      es => StringTranslate(Base64(es(0)), Literal("+/"), Literal("-_")), "built-in")
    r.createOrReplaceTempFunction("is_infinite",
      es => EqualTo(Abs(es(0)), Literal(Double.PositiveInfinity)), "built-in")
    r.createOrReplaceTempFunction("is_finite",
      es => Not(Or(IsNaN(es(0)),
        EqualTo(Abs(es(0)), Literal(Double.PositiveInfinity)))), "built-in")
    r.createOrReplaceTempFunction("cosine_distance",
      es => Subtract(Literal(1.0), graft.ext.CosineSimilarity(es(0), es(1))), "built-in")
    r.createOrReplaceTempFunction("space_trimmed_length",
      es => Length(StringTrimRight(es(0), Some(Literal(" ")))), "built-in")
    // Trino returns fractional epoch seconds as DOUBLE; unix_micros is exact
    r.createOrReplaceTempFunction("to_unixtime",
      es => Divide(Cast(UnixMicros(es(0)), DoubleType), Literal(1e6)), "built-in")
    // ISO day numbering: Monday = 1 .. Sunday = 7 (Spark weekday is Mon = 0)
    val dow = (es: Seq[Expression]) => Add(WeekDay(es(0)), Literal(1))
    r.createOrReplaceTempFunction("day_of_week", dow, "built-in")
    r.createOrReplaceTempFunction("dow", dow, "built-in")
    val doy = (es: Seq[Expression]) => DayOfYear(es(0))
    r.createOrReplaceTempFunction("day_of_year", doy, "built-in")
    r.createOrReplaceTempFunction("doy", doy, "built-in")
    val woy = (es: Seq[Expression]) => WeekOfYear(es(0))
    r.createOrReplaceTempFunction("week_of_year", woy, "built-in")
    r.createOrReplaceTempFunction("week", woy, "built-in")
    // ISO week-year = calendar year of that week's Thursday
    val yow = (es: Seq[Expression]) => Year(DateAdd(Cast(es(0), DateType),
      Subtract(Literal(3), WeekDay(es(0)))))
    r.createOrReplaceTempFunction("year_of_week", yow, "built-in")
    r.createOrReplaceTempFunction("yow", yow, "built-in")
    r.createOrReplaceTempFunction("from_iso8601_date",
      es => Cast(es(0), DateType), "built-in")
    r.createOrReplaceTempFunction("from_iso8601_timestamp",
      es => Cast(es(0), TimestampType), "built-in")
    r.createOrReplaceTempFunction("bitwise_and", es => BitwiseAnd(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("bitwise_or", es => BitwiseOr(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("bitwise_xor", es => BitwiseXor(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("bitwise_not", es => BitwiseNot(es(0)), "built-in")
    r.createOrReplaceTempFunction("bitwise_left_shift",
      es => ShiftLeft(es(0), Cast(es(1), org.apache.spark.sql.types.IntegerType)), "built-in")
    // Trino bitwise_right_shift is a LOGICAL shift (zero fill)
    r.createOrReplaceTempFunction("bitwise_right_shift",
      es => ShiftRightUnsigned(es(0), Cast(es(1), org.apache.spark.sql.types.IntegerType)), "built-in")
    r.createOrReplaceTempFunction("bitwise_right_shift_arithmetic",
      es => ShiftRight(es(0), Cast(es(1), org.apache.spark.sql.types.IntegerType)), "built-in")
    r.createOrReplaceTempFunction("t_cdf",
      es => graft.ext.StudentT(es(0), es(1), isCdf = true), "built-in")
    r.createOrReplaceTempFunction("t_pdf",
      es => graft.ext.StudentT(es(0), es(1), isCdf = false), "built-in")
    r.createOrReplaceTempFunction("murmur3",
      es => graft.ext.Murmur3Hash128(es(0)), "built-in")
    r.createOrReplaceTempFunction("regexp_position",
      es => graft.ext.RegexpPosition(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("json_array_contains",
      es => graft.ext.JsonArrayContains(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("json_parse",
      es => graft.ext.JsonCanonical(es(0)), "built-in")
    r.createOrReplaceTempFunction("json_format",
      es => Cast(es(0), org.apache.spark.sql.types.StringType), "built-in")
    r.createOrReplaceTempFunction("title_case",
      es => InitCap(es(0)), "built-in")
  }
}
