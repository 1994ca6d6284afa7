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
    // geometry SQL names (round 8: the full Column-level geo surface
    // exposed to SQL under the reference's call names)
    "st_geometryfromtext", "st_astext", "st_asbinary", "st_geomfrombinary",
    "st_convexhull", "st_distance", "st_buffer", "st_union",
    "st_intersection", "st_difference", "st_symdifference", "st_equals",
    "st_disjoint", "st_touches", "st_overlaps", "st_crosses", "st_boundary",
    "st_points", "st_coorddim", "st_isvalid", "geometry_invalid_reason",
    "to_geojson_geometry", "from_geojson_geometry", "st_x", "st_y",
    "st_xmin", "st_xmax", "st_ymin", "st_ymax", "st_dimension",
    "st_isclosed", "st_isring", "st_isempty", "st_geometrytype",
    "st_numgeometries", "st_numinteriorring", "st_numpoints",
    "st_startpoint", "st_endpoint", "st_exteriorring", "st_envelope",
    "st_pointn", "st_geometryn", "st_interiorringn", "simplify_geometry",
    "line_locate_point", "line_interpolate_point", "st_centroid", "st_point",
    // geometry breadth steps 3-4 (round 8)
    "st_linefromtext", "st_geomfromewkt", "st_geomfromkml",
    "from_encoded_polyline", "to_encoded_polyline", "st_force2d", "st_multi",
    "st_normalize", "st_linemerge", "st_pointonsurface", "st_orientedenvelope",
    "st_minimumboundingcircle", "st_geometries", "st_interiorrings",
    "st_envelopeaspts", "st_collect", "st_makeline", "st_makepolygon",
    "st_polygonize", "geometry_union", "st_srid", "st_setsrid", "st_z",
    "st_issimple", "st_asewkt", "st_asewkb", "st_reduceprecision",
    "line_interpolate_points", "geometry_nearest_points",
    "st_voronoipolygons", "st_relate", "st_transform", "st_transformxy",
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
    "title_case",
    // scalar-name parity batch 2 (round 8)
    "strpos", "starts_with", "ends_with", "codepoint", "normalize",
    "regexp_split", "split_to_map", "sha256", "sha512",
    "human_readable_seconds", "json_extract", "json_extract_scalar",
    "json_size", "json_array_get", "is_json_scalar", "json_array_length",
    "array_first", "array_last", "array_first_match", "array_last_match",
    "all_match", "any_match", "none_match", "trim_array", "combinations",
    "ngrams", "contains_sequence", "last_day_of_month", "millisecond",
    "to_iso8601", "date_parse", "format_datetime", "parse_datetime",
    "parse_duration", "to_milliseconds", "parse_data_size",
    "with_timezone", "at_timezone", "timezone", "timezone_hour",
    "timezone_minute", "is_nan", "nan", "infinity", "fail", "truncate",
    "wilson_interval_lower", "wilson_interval_upper", "normal_cdf",
    "inverse_normal_cdf", "beta_cdf", "inverse_beta_cdf", "binomial_cdf",
    "to_base", "from_base", "to_big_endian_64", "from_big_endian_64", "rgb",
    "spooky_hash_v2_32", "spooky_hash_v2_64",
    // scalar-name parity batch 3 (round 8)
    "color", "bar", "render", "day_of_month", "from_unixtime_nanos",
    "from_iso8601_timestamp_nanos", "parse_presto_data_size",
    // scalar-name parity batch 4 (round 8)
    "date", "random", "url_extract_protocol", "url_extract_host",
    "url_extract_path", "url_extract_query", "url_extract_fragment",
    "url_extract_parameter", "empty_approx_set",
    "value_at_quantile", "values_at_quantiles", "quantile_at_value",
    "tdigest_agg", "merge_tdigest", "hash_counts", "variant_is_null",
    // theta sketch family (round 10)
    "theta_sketch_agg", "theta_sketch_union", "theta_sketch_intersection",
    "theta_sketch_cardinality", "theta_sketch_union_of",
    "theta_sketch_intersect_of", "theta_sketch_a_not_b")

  // Once-per-session guard (r19): the dialect front door re-registered all
  // ~200 temp functions on EVERY statement. Registrations are per-session
  // and idempotent, so after the first pass the work is pure overhead on
  // the per-statement path. WeakHashMap: a discarded scoped session's
  // entry is collectable (the Boolean value holds no session reference).
  // The session is marked AFTER registration succeeds, and the whole
  // first pass runs under the map's lock: a concurrent second statement
  // waits for a complete function set instead of planning against a
  // half-registered one, and a failed registration leaves the session
  // unmarked so the next statement retries.
  private val registeredSessions =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def registerAll(spark: SparkSession): Unit = registeredSessions.synchronized {
    if (registeredSessions.containsKey(spark)) return
    registerAllNow(spark)
    registeredSessions.put(spark, java.lang.Boolean.TRUE)
    ()
  }

  private def registerAllNow(spark: SparkSession): Unit = {
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
    // MongoDB ObjectId helpers (reference docs/connector/mongodb.md:334-345;
    // io.trino.plugin.mongodb.ObjectIdFunctions): the creation timestamp is
    // the id's first 4 bytes. Our mongo surface carries ObjectIds as hex
    // strings; the extracted timestamp is session-UTC TIMESTAMP (the
    // reference's tstz wrapper is the documented divergence). Pure
    // compositions of codegen'd built-ins — no UDF.
    r.createOrReplaceTempFunction("objectid_timestamp", es => {
      import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, SecondsToTimestamp, Substring}
      SecondsToTimestamp(Cast(
        Conv(Substring(es(0), Literal(1), Literal(8)), Literal(16), Literal(10)),
        org.apache.spark.sql.types.LongType))
    }, "built-in")
    r.createOrReplaceTempFunction("timestamp_objectid", es => {
      import org.apache.spark.sql.catalyst.expressions.{Concat, Hex, Literal, Lower, Pmod, StringLPad, UnixSeconds}
      // mask the seconds to 32 bits (pmod 2^32) BEFORE hexing: the ObjectId
      // epoch field is exactly 4 bytes, so pre-1970 and post-2106 inputs
      // wrap like the reference's unsigned 32-bit field instead of hexing
      // to 16 F-digits / 9+ digits and being silently truncated to a
      // malformed prefix (r18 fix; in-range values are unchanged)
      Lower(Concat(Seq(
        StringLPad(Hex(Pmod(UnixSeconds(es(0)), Literal(1L << 32))),
          Literal(8), Literal("0")),
        Literal("0000000000000000"))))
    }, "built-in")
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
    // theta sketch family (plugin/trino-datasketches/theta): scalar algebra
    // as Catalyst expressions, aggregates as udaf registrations below
    r.createOrReplaceTempFunction("theta_sketch_cardinality",
      es => graft.functions.ThetaCardinality(es(0)), "built-in")
    r.createOrReplaceTempFunction("theta_sketch_union_of",
      es => graft.functions.ThetaSetOp(es(0), es(1), "union"), "built-in")
    r.createOrReplaceTempFunction("theta_sketch_intersect_of",
      es => graft.functions.ThetaSetOp(es(0), es(1), "intersect"), "built-in")
    r.createOrReplaceTempFunction("theta_sketch_a_not_b",
      es => graft.functions.ThetaSetOp(es(0), es(1), "a_not_b"), "built-in")
    spark.udf.register("theta_sketch_agg",
      org.apache.spark.sql.functions.udaf(new ThetaSketch.AggFromHashes))
    spark.udf.register("theta_sketch_union",
      org.apache.spark.sql.functions.udaf(new ThetaSketch.UnionAgg))
    spark.udf.register("theta_sketch_intersection",
      org.apache.spark.sql.functions.udaf(new ThetaSketch.IntersectAgg))
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

    // ---- scalar-name parity batch 2 (round 8): the remaining reference
    // spellings. Compositions stay inline; real semantics live in
    // ext.ParityExpressions2. Column-level helpers are reused through the
    // ColumnBridge so SQL names and the Scala API share one implementation.
    import org.apache.spark.sql.graft.ColumnBridge.{column => asCol, expression => asExpr}
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType => StrT}

    // string
    r.createOrReplaceTempFunction("strpos", es =>
      if (es.length <= 2) Cast(StringLocate(es(1), es(0), Literal(1)), LongType)
      else graft.ext.StrPosInstance(es(0), es(1), Cast(es(2), LongType)), "built-in")
    r.createOrReplaceTempFunction("starts_with", es => StartsWith(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("ends_with", es => EndsWith(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("codepoint", es => Ascii(es(0)), "built-in")
    // Trino's form argument is a bare keyword (NFC/NFD/NFKC/NFKD); accept a
    // bare identifier or a string literal
    r.createOrReplaceTempFunction("normalize", es => {
      val form =
        if (es.length < 2) "NFC"
        else es(1) match {
          case Literal(s, StrT) => s.toString
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
          case other => lit(other)
        }
      graft.ext.NormalizeForm(es(0), form)
    }, "built-in")
    r.createOrReplaceTempFunction("regexp_split",
      es => StringSplit(es(0), es(1), Literal(-1)), "built-in")
    r.createOrReplaceTempFunction("split_to_map",
      es => StringToMap(es(0), es(1), es(2)), "built-in")
    // Trino sha256/sha512 are varbinary→varbinary; Spark's sha2 renders hex
    r.createOrReplaceTempFunction("sha256", es => Unhex(Sha2(es(0), Literal(256))), "built-in")
    r.createOrReplaceTempFunction("sha512", es => Unhex(Sha2(es(0), Literal(512))), "built-in")
    r.createOrReplaceTempFunction("human_readable_seconds",
      es => graft.ext.HumanReadableSecondsExpr(Cast(es(0), DoubleType)), "built-in")

    // json (legacy-path dialect; the SQL/JSON 2016 engine is json_path_*)
    r.createOrReplaceTempFunction("json_extract",
      es => graft.ext.LegacyJsonExtract(es(0), lit(es(1)), "json"), "built-in")
    r.createOrReplaceTempFunction("json_extract_scalar",
      es => graft.ext.LegacyJsonExtract(es(0), lit(es(1)), "scalar"), "built-in")
    r.createOrReplaceTempFunction("json_size",
      es => graft.ext.LegacyJsonExtract(es(0), lit(es(1)), "size"), "built-in")
    r.createOrReplaceTempFunction("json_array_get",
      es => graft.ext.JsonArrayGet(es(0), Cast(es(1), LongType)), "built-in")
    r.createOrReplaceTempFunction("is_json_scalar",
      es => graft.ext.IsJsonScalar(es(0)), "built-in")
    // json_array_length is a Spark built-in with matching semantics

    // arrays
    r.createOrReplaceTempFunction("array_first",
      es => ElementAt(es(0), Literal(1), None, failOnError = false), "built-in")
    r.createOrReplaceTempFunction("array_last",
      es => ElementAt(es(0), Literal(-1), None, failOnError = false), "built-in")
    r.createOrReplaceTempFunction("array_first_match",
      es => graft.ext.ArrayFirstMatch(es(0), es(1), fromEnd = false), "built-in")
    r.createOrReplaceTempFunction("array_last_match",
      es => graft.ext.ArrayFirstMatch(es(0), es(1), fromEnd = true), "built-in")
    r.createOrReplaceTempFunction("all_match", es => ArrayForAll(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("any_match", es => ArrayExists(es(0), es(1)), "built-in")
    // none_match = forall over the negated predicate (same 3VL as the
    // reference's !any_match); the result must itself be a HOF for the
    // analyzer to accept the lambda argument
    r.createOrReplaceTempFunction("none_match", es => es(1) match {
      case l: LambdaFunction => ArrayForAll(es(0), l.copy(function = Not(l.function)))
      case other => Not(ArrayExists(es(0), other))
    }, "built-in")
    r.createOrReplaceTempFunction("trim_array", es =>
      Slice(es(0), Literal(1), Subtract(Size(es(0)), Cast(es(1), IntegerType))), "built-in")
    r.createOrReplaceTempFunction("combinations",
      es => graft.ext.CombinationsExpr(es(0), Cast(es(1), IntegerType)), "built-in")
    r.createOrReplaceTempFunction("ngrams",
      es => graft.ext.NgramsExpr(es(0), Cast(es(1), LongType)), "built-in")
    r.createOrReplaceTempFunction("contains_sequence",
      es => graft.ext.ContainsSequenceExpr(es(0), es(1)), "built-in")

    // datetime
    r.createOrReplaceTempFunction("last_day_of_month",
      es => LastDay(Cast(es(0), DateType)), "built-in")
    // millisecond-of-second from epoch micros (floor-mod keeps pre-1970 right)
    r.createOrReplaceTempFunction("millisecond", es =>
      IntegralDivide(Pmod(UnixMicros(Cast(es(0), TimestampType)), Literal(1000000L)),
        Literal(1000L)), "built-in")
    r.createOrReplaceTempFunction("to_iso8601", es => graft.ext.ToIso8601(es(0)), "built-in")
    r.createOrReplaceTempFunction("date_parse", es =>
      new ParseToTimestamp(es(0),
        Literal(ScalarFunctions.translateMySqlPattern(lit(es(1))))), "built-in")
    r.createOrReplaceTempFunction("format_datetime", es =>
      DateFormatClass(Cast(es(0), TimestampType),
        Literal(ScalarFunctions.translateJodaPattern(lit(es(1))))), "built-in")
    r.createOrReplaceTempFunction("parse_datetime", es =>
      new ParseToTimestamp(es(0),
        Literal(ScalarFunctions.translateJodaPattern(lit(es(1))))), "built-in")
    r.createOrReplaceTempFunction("parse_duration",
      es => graft.ext.ParseDuration(es(0)), "built-in")
    r.createOrReplaceTempFunction("to_milliseconds",
      es => graft.ext.ToMilliseconds(es(0)), "built-in")
    r.createOrReplaceTempFunction("parse_data_size",
      es => graft.ext.ParseDataSize(es(0)), "built-in")

    // timestamp-with-time-zone emulation (struct<utc_micros, zone>); built
    // from raw catalyst nodes — expressions a SQL builder returns must be
    // analyzer-resolvable, so no Column round-trips here
    import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
    r.createOrReplaceTempFunction("with_timezone", es =>
      CreateNamedStruct(Seq(
        Literal("utc_micros"), UnixMicros(ToUTCTimestamp(Cast(es(0), TimestampType), es(1))),
        Literal("zone"), es(1))), "built-in")
    r.createOrReplaceTempFunction("at_timezone", es =>
      CreateNamedStruct(Seq(
        Literal("utc_micros"), UnresolvedExtractValue(es(0), Literal("utc_micros")),
        Literal("zone"), es(1))), "built-in")
    r.createOrReplaceTempFunction("timezone",
      es => UnresolvedExtractValue(es(0), Literal("zone")), "built-in")
    // zone offset in whole minutes at the carried instant; integer division
    // truncates toward zero, so -05:30 renders hour -5, minute -30 as the
    // reference does
    def tzOffsetMinutes(e: Expression): Expression = {
      val micros = UnresolvedExtractValue(e, Literal("utc_micros"))
      val zone = UnresolvedExtractValue(e, Literal("zone"))
      val localMicros = UnixMicros(FromUTCTimestamp(MicrosToTimestamp(micros), zone))
      Cast(Divide(Cast(Subtract(localMicros, micros), DoubleType), Literal(60000000.0)), LongType)
    }
    r.createOrReplaceTempFunction("timezone_hour", es =>
      Cast(Divide(Cast(tzOffsetMinutes(es(0)), DoubleType), Literal(60.0)), LongType), "built-in")
    r.createOrReplaceTempFunction("timezone_minute", es =>
      Remainder(tzOffsetMinutes(es(0)), Literal(60L)), "built-in")

    // math / stat
    r.createOrReplaceTempFunction("is_nan", es => IsNaN(Cast(es(0), DoubleType)), "built-in")
    r.createOrReplaceTempFunction("nan", _ => Literal(Double.NaN), "built-in")
    r.createOrReplaceTempFunction("infinity", _ => Literal(Double.PositiveInfinity), "built-in")
    r.createOrReplaceTempFunction("fail", es => RaiseError(es(0)), "built-in")
    // truncate toward zero; 2-arg form is digit-scaled (reference
    // MathFunctions.java truncate)
    r.createOrReplaceTempFunction("truncate", es => {
      val x = Cast(es(0), DoubleType)
      if (es.length == 1)
        Multiply(Signum(x), Cast(Floor(Abs(x)), DoubleType))
      else {
        val p = Pow(Literal(10.0), Cast(es(1), DoubleType))
        Divide(Multiply(Signum(x), Cast(Floor(Multiply(Abs(x), p)), DoubleType)), p)
      }
    }, "built-in")
    // Wilson score interval, the reference's exact operation order
    // (WilsonInterval.java: (p + z²/2n ± z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n))
    def wilson(bound: Double)(es: Seq[Expression]): Expression = {
      val s = Cast(es(0), DoubleType); val t = Cast(es(1), DoubleType)
      val z = Cast(es(2), DoubleType)
      val p = Divide(s, t)
      val z2 = Multiply(z, z)
      val num = Add(Add(p, Divide(z2, Multiply(t, Literal(2.0)))),
        Multiply(Multiply(Literal(bound), z),
          Sqrt(Add(Divide(Multiply(p, Subtract(Literal(1.0), p)), t),
            Divide(z2, Multiply(Literal(4.0), Multiply(t, t)))))))
      Divide(num, Add(Literal(1.0), Divide(z2, t)))
    }
    r.createOrReplaceTempFunction("wilson_interval_lower", wilson(-1.0), "built-in")
    r.createOrReplaceTempFunction("wilson_interval_upper", wilson(1.0), "built-in")
    // normal_cdf: the A&S 7.1.26 erf kernel in the same operation order as
    // operators.Stats.normalCdf (bit-identical doubles, oracle-replayable)
    r.createOrReplaceTempFunction("normal_cdf", es => {
      val mean = Cast(es(0), DoubleType); val sd = Cast(es(1), DoubleType)
      val v = Cast(es(2), DoubleType)
      val x = Divide(Subtract(v, mean), Multiply(sd, Sqrt(Literal(2.0))))
      val z = Abs(x)
      val t = Divide(Literal(1.0), Add(Literal(1.0), Multiply(Literal(0.3275911), z)))
      val poly = Multiply(t, Add(Literal(0.254829592), Multiply(t, Add(Literal(-0.284496736),
        Multiply(t, Add(Literal(1.421413741), Multiply(t, Add(Literal(-1.453152027),
          Multiply(t, Literal(1.061405429))))))))))
      val erfAbs = Subtract(Literal(1.0),
        Multiply(poly, Exp(Multiply(UnaryMinus(z), z))))
      val erf = If(GreaterThanOrEqual(x, Literal(0.0)), erfAbs, UnaryMinus(erfAbs))
      Divide(Add(Literal(1.0), erf), Literal(2.0))
    }, "built-in")
    r.createOrReplaceTempFunction("inverse_normal_cdf", es =>
      graft.ext.InverseNormalCdf(Cast(es(0), DoubleType), Cast(es(1), DoubleType),
        Cast(es(2), DoubleType)), "built-in")
    r.createOrReplaceTempFunction("beta_cdf", es =>
      graft.ext.BetaCdf(Cast(es(0), DoubleType), Cast(es(1), DoubleType),
        Cast(es(2), DoubleType)), "built-in")
    r.createOrReplaceTempFunction("inverse_beta_cdf", es =>
      graft.ext.InverseBetaCdf(Cast(es(0), DoubleType), Cast(es(1), DoubleType),
        Cast(es(2), DoubleType)), "built-in")
    r.createOrReplaceTempFunction("binomial_cdf", es =>
      graft.ext.BinomialCdf(Cast(es(0), IntegerType), Cast(es(1), DoubleType),
        Cast(es(2), IntegerType)), "built-in")

    // radix / binary
    // radix must be a literal (Spark's conv takes Int bases); sign handled
    // explicitly — Spark conv is unsigned-64 (reference to_base/from_base
    // are signed, MathFunctions.java)
    r.createOrReplaceTempFunction("to_base", es => {
      val radix = Cast(es(1), IntegerType)
      val x = Cast(es(0), LongType)
      If(LessThan(x, Literal(0L)),
        Concat(Seq(Literal("-"),
          Lower(Conv(Cast(UnaryMinus(x), StrT), Literal(10), radix)))),
        Lower(Conv(Cast(x, StrT), Literal(10), radix)))
    }, "built-in")
    r.createOrReplaceTempFunction("from_base", es => {
      val radix = Cast(es(1), IntegerType)
      val s = es(0)
      If(StartsWith(s, Literal("-")),
        UnaryMinus(Cast(Conv(Substring(s, Literal(2), Literal(Int.MaxValue)), radix,
          Literal(10)), LongType)),
        Cast(Conv(s, radix, Literal(10)), LongType))
    }, "built-in")
    r.createOrReplaceTempFunction("to_big_endian_64",
      es => graft.ext.ToBigEndian64(Cast(es(0), LongType)), "built-in")
    r.createOrReplaceTempFunction("from_big_endian_64",
      es => graft.ext.FromBigEndian64(es(0)), "built-in")
    // color family deterministic subset: packed rgb int (ColorFunctions.java)
    r.createOrReplaceTempFunction("rgb", es =>
      Cast(Add(Add(ShiftLeft(Cast(es(0), IntegerType), Literal(16)),
        ShiftLeft(Cast(es(1), IntegerType), Literal(8))), Cast(es(2), IntegerType)),
        IntegerType), "built-in")
    r.createOrReplaceTempFunction("spooky_hash_v2_32",
      es => graft.ext.SpookyHashV2(es(0), 32), "built-in")
    r.createOrReplaceTempFunction("spooky_hash_v2_64",
      es => graft.ext.SpookyHashV2(es(0), 64), "built-in")

    // ---- scalar-name parity batch 3 (round 8): the last reference
    // spellings with no prior mapping.
    // color family full surface (ColorFunctions.java :88/:126/:144/:161/:196)
    r.createOrReplaceTempFunction("color", es =>
      if (es.length == 1) graft.ext.ColorParse(es(0))
      else graft.ext.ColorInterp(es), "built-in")
    r.createOrReplaceTempFunction("bar",
      es => graft.ext.ColorBar(es), "built-in")
    r.createOrReplaceTempFunction("render",
      es => graft.ext.ColorRender(es), "built-in")
    // DateTimeFunctions.java day_of_month alias family
    r.createOrReplaceTempFunction("day_of_month",
      es => DayOfMonth(Cast(es(0), DateType)), "built-in")
    // from_unixtime_nanos: floor-division to micros (negative nanos floor
    // toward -∞, DateTimeFunctions.java fromUnixtimeNanos's roundDiv)
    r.createOrReplaceTempFunction("from_unixtime_nanos", es => {
      val n = Cast(es(0), LongType)
      MicrosToTimestamp(IntegralDivide(
        Subtract(n, Pmod(n, Literal(1000L))), Literal(1000L),
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
    }, "built-in")
    // micros precision (Spark timestamps): sub-micro digits truncate
    r.createOrReplaceTempFunction("from_iso8601_timestamp_nanos",
      es => Cast(es(0), TimestampType), "built-in")
    r.createOrReplaceTempFunction("parse_presto_data_size",
      es => graft.ext.ParseDataSize(es(0)), "built-in")

    // ---- scalar-name parity batch 4 (round 8): final sweep residuals.
    // date(x) (DateTimeFunctions.java date): cast to DATE
    r.createOrReplaceTempFunction("date",
      es => Cast(es(0), DateType), "built-in")
    // random()/random(n) (MathFunctions.java): seed fixed per call site at
    // analysis, exactly like Spark's own rand() registration
    r.createOrReplaceTempFunction("random", es =>
      if (es.isEmpty) new Rand(Literal(new java.util.Random().nextLong()))
      else Cast(Floor(Multiply(
        new Rand(Literal(new java.util.Random().nextLong())),
        Cast(es(0), DoubleType))), LongType), "built-in")
    // UrlFunctions.java url_extract_* → parse_url parts
    def urlPart(part: String) = (es: Seq[Expression]) =>
      ParseUrl(Seq(es(0), Literal(part)))
    r.createOrReplaceTempFunction("url_extract_protocol", urlPart("PROTOCOL"), "built-in")
    r.createOrReplaceTempFunction("url_extract_host", urlPart("HOST"), "built-in")
    r.createOrReplaceTempFunction("url_extract_path", urlPart("PATH"), "built-in")
    r.createOrReplaceTempFunction("url_extract_query", urlPart("QUERY"), "built-in")
    r.createOrReplaceTempFunction("url_extract_fragment", urlPart("REF"), "built-in")
    r.createOrReplaceTempFunction("url_extract_parameter",
      es => ParseUrl(Seq(es(0), Literal("QUERY"), es(1))), "built-in")
    // UrlFunctions.java url_extract_port: Spark's parse_url has no PORT
    // part — take it from the authority. RegExpExtract yields '' on no
    // match, and under ANSI mode (this session's default) CAST('' AS
    // BIGINT) THROWS — so the '' is NullIf'd away first, giving the
    // reference's null-when-absent. The authority regex skips an optional
    // userinfo (user:pass@ — its ':' is not a port) and accepts bracketed
    // IPv6 hosts ([::1]:8080). (ADVICE r14.)
    r.createOrReplaceTempFunction("url_extract_port", es =>
      Cast(new NullIf(RegExpExtract(es(0),
        Literal("^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(?:\\[[^\\]]*\\]|[^/:?#]+):([0-9]+)"),
        Literal(1)), Literal("")),
        LongType), "built-in")
    // (Trino 3-arg date_add/date_diff live in the SQL front door, not here:
    // Spark's PARSER owns those names via its timestampadd grammar rule, so
    // a registry entry is unreachable — SqlFrontend.renderExpr unquotes the
    // reference's string-literal unit into Spark's bare-keyword form.)
    // SetDigestFunctions empty_approx_set(): the serialized empty HLL state
    // (union identity for hll_union_agg; lgK 12 = Spark's aggregate default)
    r.createOrReplaceTempFunction("empty_approx_set", _ =>
      Literal(new org.apache.datasketches.hll.HllSketch(12).toUpdatableByteArray,
        org.apache.spark.sql.types.BinaryType), "built-in")
    // t-digest VALUE flow (TDigestFunctions.java): aggregates produce the
    // digest struct; these scalars extract from it
    r.createOrReplaceTempFunction("value_at_quantile", es =>
      graft.ext.TDigestValueAtQuantile(es(0), Cast(es(1), DoubleType)), "built-in")
    r.createOrReplaceTempFunction("values_at_quantiles", es =>
      graft.ext.TDigestValuesAtQuantiles(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("quantile_at_value", es =>
      graft.ext.TDigestQuantileAtValue(es(0), Cast(es(1), DoubleType)), "built-in")
    graft.functions.Sketches.registerAggregates(spark)
    // SetDigestFunctions hash_counts: the retained-hash multiset (our KMV
    // digest keeps distinct hashes → every count is 1)
    r.createOrReplaceTempFunction("hash_counts", es =>
      MapFromArrays(es(0), ArrayRepeat(Literal(1.toShort), Size(es(0)))), "built-in")
    // VARIANT family alias onto Spark's own is_variant_null
    r.createOrReplaceTempFunction("variant_is_null", es =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq("is_variant_null"), es, isDistinct = false), "built-in")

    // ---- geometry SQL-name registration (reference names from
    // plugin/trino-geospatial GeoFunctions.java, lowercased like Trino's
    // case-insensitive call sites). Pure catalyst constructions — the
    // Column bridge cannot round-trip inside registry builders. Names that
    // collide with the legacy raw-array registrations (st_area,
    // st_perimeter, st_length, st_intersects, st_contains) dispatch on
    // arity.
    {
      import org.apache.spark.sql.catalyst.expressions.{Cast => C, Concat => Cc, Literal => L, Not => N}
      import org.apache.spark.sql.types.{DoubleType => TD, IntegerType => TI, StringType => TS}
      import graft.ext._
      type E = org.apache.spark.sql.catalyst.expressions.Expression
      def reg(name: String)(f: Seq[E] => E): Unit =
        r.createOrReplaceTempFunction(name, f, "built-in")

      reg("st_area")(es =>
        if (es.length == 1) GeomArea(es(0)) else PolygonArea(es(0), es(1)))
      reg("st_perimeter")(es =>
        if (es.length == 1) GeomPerimeter(es(0)) else PolygonPerimeter(es(0), es(1)))
      reg("st_length")(es =>
        if (es.length == 1) GeomLength(es(0)) else LineStringLength(es(0), es(1)))
      reg("st_intersects")(es =>
        if (es.length == 2) N(GeomRelation(es(0), es(1), "disjoint"))
        else PolygonIntersects(es(0), es(1), es(2), es(3)))
      reg("st_contains")(es =>
        if (es.length == 3) GeomContainsPoint(es(0), es(1), es(2))
        else PolygonContains(es(0), es(1), es(2), es(3)))
      reg("st_geometryfromtext")(es => WktParse(es(0)))
      reg("st_astext")(es => WktFormat(es(0)))
      reg("st_asbinary")(es => GeomAsBinary(es(0)))
      reg("st_geomfrombinary")(es => GeomFromBinary(es(0)))
      reg("st_convexhull")(es => ConvexHull(es(0), es(1)))
      reg("st_distance")(es => GeomDistance(es(0), es(1)))
      reg("st_buffer")(es => GeomBuffer(es(0), C(es(1), TD)))
      reg("st_union")(es => GeomUnion(es(0), es(1)))
      reg("st_intersection")(es => GeomIntersection(es(0), es(1)))
      reg("st_difference")(es => GeomDifference(es(0), es(1)))
      reg("st_symdifference")(es => GeomSymDifference(es(0), es(1)))
      reg("st_equals")(es => GeomRelation(es(0), es(1), "equals"))
      reg("st_disjoint")(es => GeomRelation(es(0), es(1), "disjoint"))
      reg("st_touches")(es => GeomRelation(es(0), es(1), "touches"))
      reg("st_overlaps")(es => GeomRelation(es(0), es(1), "overlaps"))
      reg("st_crosses")(es => GeomRelation(es(0), es(1), "crosses"))
      reg("st_boundary")(es => GeomUnaryMisc(es(0), "boundary"))
      reg("st_points")(es => GeomUnaryMisc(es(0), "points"))
      reg("st_coorddim")(es => GeomUnaryMisc(es(0), "coord_dim"))
      reg("st_isvalid")(es => GeomUnaryMisc(es(0), "is_valid"))
      reg("geometry_invalid_reason")(es => GeomUnaryMisc(es(0), "invalid_reason"))
      reg("to_geojson_geometry")(es => GeomUnaryMisc(es(0), "to_geojson"))
      reg("from_geojson_geometry")(es => GeomFromGeoJson(es(0)))
      reg("st_x")(es => GeomAccessor(es(0), "x"))
      reg("st_y")(es => GeomAccessor(es(0), "y"))
      reg("st_xmin")(es => GeomEnvelopeBound(es(0), xAxis = true, isMin = true))
      reg("st_xmax")(es => GeomEnvelopeBound(es(0), xAxis = true, isMin = false))
      reg("st_ymin")(es => GeomEnvelopeBound(es(0), xAxis = false, isMin = true))
      reg("st_ymax")(es => GeomEnvelopeBound(es(0), xAxis = false, isMin = false))
      reg("st_dimension")(es => GeomAccessor(es(0), "dimension"))
      reg("st_isclosed")(es => GeomAccessor(es(0), "is_closed"))
      reg("st_isring")(es => GeomAccessor(es(0), "is_ring"))
      reg("st_isempty")(es => GeomAccessor(es(0), "is_empty"))
      reg("st_geometrytype")(es => GeomAccessor(es(0), "geometry_type"))
      reg("st_numgeometries")(es => GeomCount(es(0), "geometries"))
      reg("st_numinteriorring")(es => GeomCount(es(0), "interior_ring"))
      reg("st_numpoints")(es => GeomCount(es(0), "points"))
      reg("st_startpoint")(es => GeomPointN(es(0), L(1)))
      reg("st_endpoint")(es => GeomPointN(es(0), L(-1)))
      reg("st_pointn")(es => GeomPointN(es(0), C(es(1), TI)))
      reg("st_geometryn")(es => GeomPart(es(0), C(es(1), TI), "geometry_n"))
      reg("st_exteriorring")(es => GeomPart(es(0), L(1), "exterior_ring"))
      reg("st_interiorringn")(es => GeomPart(es(0), C(es(1), TI), "interior_ring_n"))
      reg("st_envelope")(es => GeomPart(es(0), L(1), "envelope"))
      reg("simplify_geometry")(es => GeomSimplify(es(0), C(es(1), TD)))
      reg("line_locate_point")(es => LineLocatePoint(es(0), es(1)))
      reg("line_interpolate_point")(es => LineInterpolatePoint(es(0), C(es(1), TD)))
      // ST_Centroid / ST_Point return POINT geometries, composed from the
      // exact ordinates through the WKT reader.
      def pointOf(x: E, y: E): E = WktParse(Cc(Seq(
        L("POINT ("), C(C(x, TD), TS), L(" "), C(C(y, TD), TS), L(")"))))
      reg("st_centroid")(es => pointOf(GeomCentroid(es(0), 0), GeomCentroid(es(0), 1)))
      reg("st_point")(es => pointOf(es(0), es(1)))

      // ---- breadth step 3 (ext.GeoOps3): constructors, converters,
      // combiners, canonical forms (reference citations in GeoOps3.scala)
      reg("st_linefromtext")(es => GeomGenParse(es(0), "st_line_from_text"))
      reg("st_geomfromewkt")(es => GeomGenParse(es(0), "st_geom_from_ewkt"))
      reg("st_geomfromkml")(es => GeomGenParse(es(0), "st_geom_from_kml"))
      reg("from_encoded_polyline")(es => GeomGenParse(es(0), "from_encoded_polyline"))
      reg("st_force2d")(es => GeomGen1(es(0), "force2d"))
      reg("st_multi")(es => GeomGen1(es(0), "multi"))
      reg("st_normalize")(es => GeomGen1(es(0), "normalize"))
      reg("st_linemerge")(es => GeomGen1(es(0), "line_merge"))
      reg("st_pointonsurface")(es => GeomGen1(es(0), "point_on_surface"))
      reg("st_orientedenvelope")(es => GeomGen1(es(0), "oriented_envelope"))
      reg("st_minimumboundingcircle")(es => GeomGen1(es(0), "minimum_bounding_circle"))
      reg("st_geometries")(es => GeomGen1Arr(es(0), "geometries"))
      reg("st_interiorrings")(es => GeomGen1Arr(es(0), "interior_rings"))
      reg("st_envelopeaspts")(es => GeomGen1Arr(es(0), "envelope_as_pts"))
      reg("st_collect")(es =>
        if (es.length == 2) GeomCollect2(es(0), es(1))
        else GeomGenArr1(es(0), "st_collect"))
      reg("st_makeline")(es =>
        if (es.length == 2) GeomGenArr1(
          org.apache.spark.sql.catalyst.expressions.CreateArray(es), "st_make_line")
        else GeomGenArr1(es(0), "st_make_line"))
      reg("st_makepolygon")(es =>
        if (es.length == 2) GeomMakePolygon(es(0), es(1))
        else GeomMakePolygon(es(0),
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            Array.empty[Any],
            org.apache.spark.sql.types.ArrayType(Wkt.geometryType, containsNull = false))))
      reg("st_polygonize")(es => GeomGenArr1(es(0), "st_polygonize"))
      reg("geometry_union")(es => GeomGenArr1(es(0), "geometry_union"))
      reg("st_srid")(es => GeomGenScalar(es(0), "srid"))
      reg("st_setsrid")(es => GeomSetSrid(es(0), C(es(1), TI)))
      reg("st_z")(es => GeomGenScalar(es(0), "z"))
      reg("st_issimple")(es => GeomGenScalar(es(0), "is_simple"))
      reg("st_asewkt")(es => GeomGenScalar(es(0), "as_ewkt"))
      // EWKB == WKB at SRID 0 (GeoFunctions.java:587 serializes without a
      // CRS flag for untagged geometry)
      reg("st_asewkb")(es => GeomAsBinary(es(0)))
      reg("to_encoded_polyline")(es => GeomGenScalar(es(0), "to_encoded_polyline"))
      reg("st_reduceprecision")(es => GeomReducePrecision(es(0), C(es(1), TD)))
      reg("line_interpolate_points")(es => LineInterpolatePoints(es(0), C(es(1), TD)))
      reg("geometry_nearest_points")(es => GeomNearestPoints(es(0), es(1)))
      reg("st_voronoipolygons")(es => GeomVoronoi(es(0)))
      reg("st_relate")(es => GeomRelate(es(0), es(1), es(2)))
      // ST_Transform (GeoFunctions.java:510; lib/trino-geospatial's EPSG
      // registry role): the 3-arg form st_transform(geom, from_srid,
      // to_srid) reprojects through the embedded EPSG subset (4326/3857/
      // UTM — graft.ext.Epsg); the source CRS is explicit because this
      // model carries SRID 0. The reference's 2-arg form ERRORS on SRID-0
      // input ("Cannot transform geometry with SRID 0", :530) — its
      // lax-NULL twin stays for that arity.
      reg("st_transform") {
        case es if es.length == 3 => GeomTransform(es(0), C(es(1), TI), C(es(2), TI))
        case _ =>
          org.apache.spark.sql.catalyst.expressions.Literal.create(null, Wkt.geometryType)
      }
      reg("st_transformxy")(_ =>
        org.apache.spark.sql.catalyst.expressions.Literal.create(null, Wkt.geometryType))
    }
  }
}
