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
    "split_to_multimap", "multimap_from_entries", "array_histogram")

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
  }
}
