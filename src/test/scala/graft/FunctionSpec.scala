package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Expression-level specs with literal rows (≈ reference
  * core/trino-main/src/test/java/io/trino/sql/query/ QueryAssertions tests). */
class FunctionSpec extends SparkSpec {
  import spark.implicits._

  test("cosine similarity: known values, orthogonal, antiparallel") {
    val df = Seq(
      ("id", Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1
      ("orth", Array(1.0f, 0.0f), Array(0.0f, 1.0f)), // orthogonal → 0
      ("anti", Array(1.0f, 0.0f), Array(-1.0f, 0.0f)) // antiparallel → -1
    ).toDF("name", "a", "b")
      .select($"name", VectorFunctions.cosine($"a", $"b").as("sim"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(df("id") - 1.0) < 1e-12)
    assert(math.abs(df("orth")) < 1e-12)
    assert(math.abs(df("anti") + 1.0) < 1e-12)
  }

  test("cosine similarity: zero vector and null → null") {
    val rows = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      (null, Array(1.0f, 1.0f))
    ).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("sim"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("cosine similarity SQL registration") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("shingles3 handles short docs via guard branch") {
    val out = Seq("one two", "a b c d").toDF("text")
      .select(TextFunctions.shingles3(TextFunctions.tokens($"text")).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("one two"))
    assert(out(1) == Seq("a b c", "b c d"))
  }

  test("minhash estimates track exact jaccard on crafted pairs") {
    // two docs sharing exactly half their shingles → jaccard 1/3
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (21 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.minhashSignature(
        TextFunctions.shingles3(TextFunctions.tokens($"text")), 256).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 256
    // exact shingle jaccard: shared 3-grams are windows fully inside 21..60∩1..40
    val shA = (1 to 38).map(i => s"tok$i tok${i + 1} tok${i + 2}").toSet
    val shB = (21 to 58).map(i => s"tok$i tok${i + 1} tok${i + 2}").toSet
    val exact = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here entirely now"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.simhashBands(TextFunctions.tokens($"text")).as("b"))
    val bands = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(3L))
  }

  test("polynomial fingerprint matches independent computation") {
    val fp = Seq("abc").toDF("text")
      .select(TextFunctions.polyFingerprint($"text").as("fp")).collect()(0).getLong(0)
    val expected = "abc".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    assert(fp == expected)
  }

  test("word_stem follows Porter suffix stripping") {
    val pairs = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "motoring" -> "motor",
      "happy" -> "happi", "relational" -> "relat", "conditional" -> "condit",
      "sky" -> "sky")
    val out = pairs.map(_._1).toDF("w")
      .select($"w", TextFunctions.wordStem($"w").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pairs.foreach { case (w, expected) =>
      assert(out(w) == expected, s"stem($w)=${out(w)}, expected $expected")
    }
  }

  test("word_stem SQL registration") {
    TextFunctions.register(spark)
    val r = spark.sql("SELECT word_stem('generalizations')").collect()(0).getString(0)
    assert(r == "gener", r)
  }

  test("wkt parse/format roundtrip, subsets, and polygon predicates") {
    import graft.ext.Wkt
    assert(Wkt.parse("POINT (1.5 2.5)").kind == "POINT")
    assert(Wkt.parse("LINESTRING (0 0, 1.5 2, 3 3)").xs.toSeq == Seq(0.0, 1.5, 3.0))
    val p = Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(p.kind == "POLYGON" && p.xs.length == 5)
    assert(Wkt.format(p.kind, p.xs, p.ys, p.rings) ==
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))")
    // unsupported / malformed → null (TRY-compatible)
    assert(Wkt.parse("MULTIPOLYGON (((0 0)))") == null)
    assert(Wkt.parse("POLYGON ((0 0, nope 1))") == null)
    assert(Wkt.parse("POINT (1 2 3)") == null)
    // segment crossing: proper crossing true, parallel/disjoint false
    assert(Wkt.segmentsCross(0, 0, 4, 4, 0, 4, 4, 0))
    assert(!Wkt.segmentsCross(0, 0, 1, 1, 2, 2, 3, 3))
  }

  test("typeof reports reference type names and constant-folds") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      "SELECT typeof(CAST(1 AS BIGINT)), typeof('x'), typeof(array(CAST(1 AS DOUBLE))), typeof(CAST(1 AS DECIMAL(10,2)))")
      .collect()(0)
    assert(r.getString(0) == "bigint")
    assert(r.getString(1) == "varchar")
    assert(r.getString(2) == "array(double)")
    assert(r.getString(3) == "decimal(10,2)")
  }

  test("lsh buckets are deterministic and bounded") {
    val df = Seq((1L, Array.tabulate(8)(i => (i + 1).toFloat))).toDF("id", "v")
      .select(VectorFunctions.lshBuckets($"v", tables = 4, bits = 8).as("b"))
    val b1 = df.collect()(0).getSeq[Long](0)
    val b2 = df.collect()(0).getSeq[Long](0)
    assert(b1 == b2)
    assert(b1.length == 4)
    assert(b1.forall(x => x >= 0 && x < 256))
  }

  test("ieee754/big-endian codecs: known bit patterns and roundtrips") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT hex(to_ieee754_64(CAST(1.0 AS DOUBLE))),
                hex(to_ieee754_32(CAST(1.0 AS DOUBLE))),
                hex(to_big_endian_32(1)), hex(to_big_endian_32(-1)),
                from_ieee754_64(to_ieee754_64(CAST(-2.5 AS DOUBLE))),
                from_ieee754_32(to_ieee754_32(CAST(0.5 AS DOUBLE))),
                from_big_endian_32(to_big_endian_32(-123456))""").collect()(0)
    assert(r.getString(0) == "3FF0000000000000")
    assert(r.getString(1) == "3F800000")
    assert(r.getString(2) == "00000001")
    assert(r.getString(3) == "FFFFFFFF")
    assert(r.getDouble(4) == -2.5)
    assert(r.getFloat(5) == 0.5f) // REAL, matching the reference signature
    assert(r.getInt(6) == -123456)
  }

  test("split_to_multimap / multimap_from_entries / array_histogram") {
    graft.functions.Registry.registerAll(spark)
    val mm = spark.sql("SELECT split_to_multimap('a=1;b=2;a=3', ';', '=') AS m")
      .collect()(0).getMap[String, scala.collection.Seq[String]](0)
    assert(mm("a").toSeq == Seq("1", "3") && mm("b").toSeq == Seq("2"))
    val mfe = spark.sql(
      "SELECT multimap_from_entries(array(struct('k1', 1), struct('k2', 2), struct('k1', 3)))")
      .collect()(0).getMap[String, scala.collection.Seq[Int]](0)
    assert(mfe("k1").toSeq == Seq(1, 3) && mfe("k2").toSeq == Seq(2))
    val h = spark.sql("SELECT array_histogram(array('x', 'y', 'x', NULL))")
      .collect()(0).getMap[String, Long](0)
    assert(h == Map("x" -> 2L, "y" -> 1L))
    // null entry / null key are errors, matching the reference
    intercept[Exception] {
      spark.sql("SELECT multimap_from_entries(array(struct('k', 1), NULL))").collect()
    }
    // reference scan semantics: empty input → empty map; trailing entry
    // delimiter skipped; duplicate kv delimiter and equal delimiters error
    assert(spark.sql("SELECT split_to_multimap('', ';', '=')")
      .collect()(0).getMap[String, Any](0).isEmpty)
    assert(spark.sql("SELECT split_to_multimap('a=1;', ';', '=')")
      .collect()(0).getMap[String, scala.collection.Seq[String]](0)("a").toSeq == Seq("1"))
    intercept[Exception] {
      spark.sql("SELECT split_to_multimap('a=1=2', ';', '=')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT split_to_multimap('a=1', '=', '=')").collect()
    }
  }

  test("WKT ringed model: holes, MULTI*, roundtrips, measures") {
    import graft.ext.Wkt
    // polygon with hole: area subtracts, contains respects the hole
    val p = Wkt.parse("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(p.kind == "POLYGON" && p.rings.toSeq == Seq(5, -5))
    assert(Wkt.format(p.kind, p.xs, p.ys, p.rings) ==
      "POLYGON ((0.0 0.0, 8.0 0.0, 8.0 8.0, 0.0 8.0, 0.0 0.0), (2.0 2.0, 4.0 2.0, 4.0 4.0, 2.0 4.0, 2.0 2.0))")
    // multipolygon with a hole in the first part
    val mp = Wkt.parse("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4)), ((10 0, 12 0, 12 2, 10 2)))")
    assert(mp.kind == "MULTIPOLYGON" && mp.rings.toSeq == Seq(4, 4))
    // multipoint accepts both syntaxes
    assert(Wkt.parse("MULTIPOINT (1 2, 3 4)").rings.toSeq == Seq(1, 1))
    assert(Wkt.parse("MULTIPOINT ((1 2), (3 4))").rings.toSeq == Seq(1, 1))
    assert(Wkt.parse("MULTILINESTRING ((0 0, 1 0), (0 1, 1 1, 2 1))").rings.toSeq == Seq(2, 3))
    // malformed stays null
    assert(Wkt.parse("MULTIPOLYGON (((0 0)))") == null)
    assert(Wkt.parse("POLYGON (0 0, 1 0, 1 1)") == null)
    assert(Wkt.parse("TRIANGLE ((0 0, 1 0, 1 1))") == null)
  }

  test("SQL/JSON filter predicates: exists, starts with, like_regex, Kleene logic") {
    import graft.ext.JsonPath
    def v(json: String, path: String): String = JsonPath.value(json, JsonPath.parse(path))
    val doc = """{"a": [{"x": 1, "t": "alpha"}, {"x": 5}, {"x": 9, "t": "beta"}]}"""
    // exists() keeps only items carrying the member
    assert(v(doc, """lax $.a[?(exists(@.t) && @.x > 1)].t""") == "beta")
    // negated exists
    assert(v(doc, """lax $.a[?(!(exists(@.t)))].x""") == "5")
    // parenthesized sub-predicates with || precedence
    assert(v(doc, """lax $.a[?((@.x == 1 || @.x == 9) && @.t == "beta")].x""") == "9")
    // starts with / like_regex
    assert(v(doc, """lax $.a[?(@.t starts with "al")].x""") == "1")
    assert(v(doc, """lax $.a[?(@.t like_regex "^be.a$")].x""") == "9")
    // boolean and null literals
    val doc2 = """{"a": [{"x": 1, "on": true}, {"x": 2, "on": false}, {"x": 3, "on": null}]}"""
    assert(v(doc2, "lax $.a[?(@.on == true)].x") == "1")
    assert(v(doc2, "lax $.a[?(@.on == null)].x") == "3")
    // Kleene: unknown (missing member) is not false — its negation is ALSO
    // unknown, so !(@.missing > 1) keeps nothing, and unknown || true = true
    assert(v(doc, """lax $.a[?(!(@.missing > 1) && @.x == 5)].x""") == null)
    assert(v(doc, """lax $.a[?((@.missing > 1 || @.x == 5))].x""") == "5")
  }

  test("IPADDRESS codec: RFC 5952 canonicalization and contains vectors") {
    import graft.ext.IpCodec
    def canon(s: String): String = IpCodec.format(IpCodec.parse(s))
    // RFC 5952 §4: lowercase, longest run compressed, first on ties,
    // single zero groups kept
    assert(canon("::1") == "::1")
    assert(canon("0:0:0:0:0:0:0:0") == "::")
    assert(canon("2001:0DB8:0:0:0:0:0:0") == "2001:db8::")
    assert(canon("1:0:0:1:0:0:0:1") == "1:0:0:1::1")
    assert(canon("2001:db8:0:1:1:1:1:1") == "2001:db8:0:1:1:1:1:1")
    // v4-mapped renders dotted (reference IpAddressType via Inet4Address)
    assert(canon("::ffff:192.0.2.1") == "192.0.2.1")
    assert(canon("192.0.2.1") == "192.0.2.1")
    // embedded dotted tail in a general v6
    assert(canon("64:ff9b::192.0.2.33") == "64:ff9b::c000:221")
    // malformed
    assert(IpCodec.parse("1::2::3") == null)
    assert(IpCodec.parse("12345::") == null)
    assert(IpCodec.parse("1:2:3:4:5:6:7") == null)
    assert(IpCodec.parse("10.0.0.256") == null)
    assert(IpCodec.parse("10.0.0") == null)
    // RFC 4291 §2.2: a dotted quad is only legal as the TERMINAL 32 bits —
    // the reference's InetAddresses-based cast rejects these as malformed
    assert(IpCodec.parse("::1.2.3.4:ffff") == null)
    assert(IpCodec.parse("1.2.3.4::") == null)
    assert(IpCodec.parse("1:1.2.3.4:1:1:1:1:1") == null)
    assert(IpCodec.parse("::ffff:1.2.3.4") != null) // terminal stays legal
    // the reference doc's contains() examples (docs/functions/ipaddress.md)
    def c(net: String, ip: String): Boolean =
      IpCodec.contains(net, IpCodec.parse(ip)).booleanValue
    assert(c("10.0.0.0/8", "10.255.255.255"))
    assert(!c("10.0.0.0/8", "11.255.255.255"))
    assert(c("2001:0db8:0:0:0:ff00:0042:8329/128", "2001:0db8:0:0:0:ff00:0042:8329"))
    assert(!c("2001:0db8:0:0:0:ff00:0042:8329/128", "2001:0db8:0:0:0:ff00:0042:8328"))
    // non-octet-aligned prefix
    assert(c("2001:db8::/31", "2001:db9::1"))
    assert(!c("2001:db8::/32", "2001:db9::1"))
    // a v4-mapped network spelled in v6 notation is a v4 FAMILY network
    // (Guava InetAddresses normalizes ::ffff:a.b.c.d to Inet4Address), so
    // its prefix is a v4 prefix: /8 over ::ffff:10.0.0.0 means 10/8
    assert(c("::ffff:10.0.0.0/8", "10.255.255.255"))
    assert(!c("::ffff:10.0.0.0/8", "11.0.0.1"))
    assert(IpCodec.contains("::ffff:10.0.0.0/96", IpCodec.parse("10.0.0.1")) == null) // >32 invalid for v4
  }

  test("scalar-parity batch: murmur3 vectors, t distribution, ISO week-year, json") {
    graft.functions.Registry.registerAll(spark)
    // murmur3 x64/128: the reference's own known-answer vectors
    // (TestVarbinaryFunctions.java:766 — empty input and 'hashme')
    def mm(s: String): String =
      graft.ext.ParityMath.murmur3x64128(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02X").mkString
    assert(mm("") == "00000000000000000000000000000000")
    assert(mm("hashme") == "93192FE805BE23041C8318F67EC4F2BC")
    // a >16-byte input exercises the block loop + tail path
    assert(mm("The quick brown fox jumps over the lazy dog").length == 32)
    // t distribution: closed forms (df=1 is Cauchy)
    assert(math.abs(graft.ext.ParityMath.tCdf(0.7, 1.0)
      - (0.5 + math.atan(0.7) / math.Pi)) < 1e-12)
    assert(math.abs(graft.ext.ParityMath.tPdf(0.7, 1.0)
      - 1.0 / (math.Pi * (1 + 0.49))) < 1e-12)
    assert(math.abs(graft.ext.ParityMath.tCdf(-1.3, 2.0)
      - (0.5 - 1.3 / (2 * math.sqrt(2 + 1.69)))) < 1e-12)
    // pdf integrates to cdf spot check: symmetric
    assert(math.abs(graft.ext.ParityMath.tCdf(2.0, 5.0)
      + graft.ext.ParityMath.tCdf(-2.0, 5.0) - 1.0) < 1e-12)
    // ISO year-of-week straddles: 2021-01-01 is ISO week 53 of 2020
    val r = spark.sql(
      """SELECT year_of_week(DATE '2021-01-01') AS a,
         year_of_week(DATE '2019-12-30') AS b,
         day_of_week(DATE '2024-01-07') AS sunday7,
         json_format(json_parse(' [1, {"a" : 2}] ')) AS jf,
         from_iso8601_date('2001-08-22') = DATE '2001-08-22' AS iso_ok""").head()
    assert(r.getInt(0) == 2020, "2021-01-01 ISO year")
    assert(r.getInt(1) == 2020, "2019-12-30 ISO year")
    assert(r.getInt(2) == 7, "ISO Sunday = 7")
    assert(r.getString(3) == """[1,{"a":2}]""")
    assert(r.getBoolean(4))
    // vector distances (3-4-5 triangle) and session identity
    val v = spark.sql(
      """SELECT euclidean_distance(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
           CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS ed,
         dot_product(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
           CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS dp,
         current_timezone() AS tz, current_catalog() AS cat,
         cardinality(current_groups()) AS ng""").head()
    assert(v.getDouble(0) == 5.0)
    assert(v.getDouble(1) == 32.0)
    assert(v.getString(2).nonEmpty && v.getString(3) == "graft" && v.getInt(4) == 0)
  }

  test("scalar-name parity batch 2: edge semantics") {
    graft.functions.Registry.registerAll(spark)
    // strpos: Nth occurrence, negative instance, empty substring, 0 errors
    val sp = spark.sql(
      """SELECT strpos('banana', 'an', 1) AS a, strpos('banana', 'an', 2) AS b,
           strpos('banana', 'an', -2) AS c, strpos('banana', '') AS d,
           strpos('banana', 'xy', 3) AS e""").head()
    assert(sp.getLong(0) == 2 && sp.getLong(1) == 4)
    assert(sp.getLong(2) == 2, "second-from-end 'an'")
    assert(sp.getLong(3) == 1 && sp.getLong(4) == 0)
    intercept[Exception] { spark.sql("SELECT strpos('x', 'x', 0)").head() }
    // normalize forms beyond NFC (the oracle covers NFC only)
    val nf = spark.sql(
      """SELECT normalize('\u00e9', 'NFD') AS d, normalize('\ufb01', 'NFKC') AS kc,
           length(normalize('\u00e9', 'NFD')) AS dl""").head()
    assert(nf.getString(1) == "fi", "NFKC expands the fi ligature")
    assert(nf.getInt(2) == 2, "NFD decomposes e-acute into two code points")
    // combinations bounds (reference: n <= 5, non-negative)
    assert(spark.sql("SELECT cardinality(combinations(sequence(1, 10), 0))")
      .head().getInt(0) == 1, "C(10,0) = [[]]")
    assert(spark.sql("SELECT cardinality(combinations(sequence(1, 3), 5))")
      .head().getInt(0) == 0, "n > len -> empty")
    intercept[Exception] { spark.sql("SELECT combinations(sequence(1, 3), 6)").head() }
    // ngrams clamps n to array length; singleton stays whole
    assert(spark.sql("SELECT ngrams(array('a'), 3)").head()
      .getSeq[Seq[String]](0) == Seq(Seq("a")))
    // trim_array over-trim errors (reference INVALID_FUNCTION_ARGUMENT)
    intercept[Exception] { spark.sql("SELECT trim_array(array(1, 2), 3)").head() }
    // json legacy paths: quoted fields, misses -> NULL, malformed -> NULL
    val js = spark.sql(
      """SELECT json_extract('{"a b":{"c":7}}', '$["a b"].c') AS q,
           json_extract('{"a":1}', '$.missing') AS m,
           json_extract('{oops', '$.a') AS bad,
           json_extract_scalar('{"a":[1]}', '$.a') AS nonscalar,
           json_array_get('[1,2,3]', 5) AS oob""").head()
    assert(js.getString(0) == "7" && js.isNullAt(1) && js.isNullAt(2))
    assert(js.isNullAt(3) && js.isNullAt(4))
    // parse_data_size: unit ladder + invalid unit errors
    val ds = spark.sql(
      """SELECT CAST(parse_data_size('1kB') AS LONG) AS k,
           CAST(parse_data_size('2.2GB') AS LONG) AS g""").head()
    assert(ds.getLong(0) == 1024L)
    assert(ds.getLong(1) == (BigDecimal("2.2") * (1L << 30)).toBigInt.toLong)
    intercept[Exception] { spark.sql("SELECT parse_data_size('5XB')").head() }
    // parse_duration units incl. sub-milli rounding; errors on unknown unit
    assert(spark.sql("SELECT to_milliseconds(parse_duration('1500 us'))")
      .head().getLong(0) == 1L)
    intercept[Exception] { spark.sql("SELECT parse_duration('3 fortnights')").head() }
    // human_readable_seconds singular/plural and rounding
    val hr = spark.sql(
      """SELECT human_readable_seconds(CAST(604800 + 86400 + 1 AS DOUBLE)) AS a,
           human_readable_seconds(59.6) AS b""").head()
    assert(hr.getString(0) == "1 week, 1 day, 1 second")
    assert(hr.getString(1) == "1 minute", "59.6 rounds to 60s = 1 minute")
    // from_base digit validation domain (valid inputs only by contract);
    // negative radix roundtrip
    assert(spark.sql("SELECT from_base('-ff', 16)").head().getLong(0) == -255L)
    // to_iso8601 date form; timestamp form keeps all six micro digits
    val iso = spark.sql(
      """SELECT to_iso8601(DATE '2001-08-22') AS d,
           to_iso8601(TIMESTAMP '2001-08-22 03:04:05.000001') AS t""").head()
    assert(iso.getString(0) == "2001-08-22")
    assert(iso.getString(1) == "2001-08-22T03:04:05.000001")
    // fail() raises; wrapped in try_ it yields NULL (TRY composition)
    intercept[Exception] { spark.sql("SELECT fail('boom')").head() }
    // inverse_beta_cdf domain errors + general-parameter roundtrip
    intercept[Exception] { spark.sql("SELECT inverse_beta_cdf(1.0, 1.0, 2.0)").head() }
    val rt = spark.sql(
      "SELECT beta_cdf(2.5, 3.5, inverse_beta_cdf(2.5, 3.5, 0.42))").head().getDouble(0)
    assert(math.abs(rt - 0.42) < 1e-9, s"beta roundtrip got $rt")
    // timezone family: half-hour zone and at_timezone instant preservation
    val tz = spark.sql(
      """SELECT timezone_hour(with_timezone(TIMESTAMP '2024-01-01 00:00:00', 'America/St_Johns')) AS h,
           timezone_minute(with_timezone(TIMESTAMP '2024-01-01 00:00:00', 'America/St_Johns')) AS m""").head()
    assert(tz.getLong(0) == -3 && tz.getLong(1) == -30, "NST is -03:30")
  }

  test("spooky_hash_v2: reference vectors and long-path regression") {
    graft.functions.Registry.registerAll(spark)
    // the reference's own vectors (TestVarbinaryFunctions.java:782)
    val r = spark.sql(
      """SELECT hex(spooky_hash_v2_32(CAST('' AS BINARY))) AS e32,
           hex(spooky_hash_v2_32(CAST('hello' AS BINARY))) AS h32,
           hex(spooky_hash_v2_64(CAST('' AS BINARY))) AS e64,
           hex(spooky_hash_v2_64(CAST('hello' AS BINARY))) AS h64""").head()
    assert(r.getString(0) == "6BF50919")
    assert(r.getString(1) == "D382E6CA")
    assert(r.getString(2) == "232706FC6BF50919")
    assert(r.getString(3) == "3768826AD382E6CA")
    // paths by length class: 0-15 (tiny), 16-31 (one mix), 32-191 (blocks),
    // >= 192 (long 12-lane path). Long-path value is self-pinned — no
    // published vector exists for it; the kernel follows spooky.cpp verbatim.
    val big = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    assert(f"${graft.ext.SpookyHash.hash64(big)}%016X" == "0E2163193BC1F214")
    val mid = Array.tabulate[Byte](100)(i => i.toByte)
    assert(graft.ext.SpookyHash.hash64(mid) != graft.ext.SpookyHash.hash64(mid.dropRight(1)))
    // 191/192/193 straddle the short/long switch without collision
    val a191 = Array.fill[Byte](191)(7); val a192 = Array.fill[Byte](192)(7)
    assert(graft.ext.SpookyHash.hash64(a191) != graft.ext.SpookyHash.hash64(a192))
  }

  test("scalar-name parity batch 3: color family, nanos datetimes, data size") {
    graft.functions.Registry.registerAll(spark)
    // color encoding vectors (reference TestColorFunctions.java:37-79)
    val c = spark.sql(
      """SELECT color('black') AS black, color('red') AS red, color('white') AS white,
           color('#f00') AS ff00, color('#cde') AS cde,
           color(0.5D, color('#f00'), color('#00f')) AS mid""").head()
    assert(c.getLong(0) == -1 && c.getLong(1) == -2 && c.getLong(2) == -8)
    assert(c.getLong(3) == 0xFF0000L && c.getLong(4) == 0xCCDDEEL)
    assert(c.getLong(5) >= 0, "interpolated colors are rgb values")
    intercept[Exception] { spark.sql("SELECT color('no_such_color')").collect() }
    // bar: the reference's own expected string (TestColorFunctions.java:85)
    val b = spark.sql(
      "SELECT bar(0.6D, 5, color('#f0f'), color('#00f')) AS b").head().getString(0)
    assert(b == "\u001b[38;5;201m\u2588\u001b[38;5;165m\u2588\u001b[38;5;129m\u2588\u001b[0m  ")
    assert(spark.sql("SELECT bar(0.5D, 10) AS b").head().getString(0).contains("█"))
    val rTrue = spark.sql("SELECT render(true) AS r").head().getString(0)
    assert(rTrue.contains("✓") && rTrue.contains("[38;5;"))
    // day_of_month ≡ day; nanos datetimes land at micros precision
    val d = spark.sql(
      """SELECT day_of_month(DATE'2024-02-29') AS dom,
           CAST(from_unixtime_nanos(1704067200123456789) AS STRING) AS ts,
           CAST(from_iso8601_timestamp_nanos('2024-01-01T00:00:00.123456789') AS STRING) AS iso,
           CAST(parse_presto_data_size('2.3MB') AS DECIMAL(38,0)) AS sz""").head()
    assert(d.getInt(0) == 29)
    assert(d.getString(1) == "2024-01-01 00:00:00.123456")
    assert(d.getString(2) == "2024-01-01 00:00:00.123456")
    assert(d.getDecimal(3).longValue == (2.3 * 1024 * 1024).toLong)
  }

  test("scalar-name parity batch 4: date, random, url parts, 3-arg date math, empty hll") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT date('2024-03-05') AS d,
           random() AS rnd, random(10) AS rnd10,
           url_extract_host('https://a.example.com:8443/p/q?x=1&y=2#frag') AS host,
           url_extract_protocol('https://a.example.com/p') AS proto,
           url_extract_path('https://a.example.com/p/q?x=1') AS path,
           url_extract_query('https://a.example.com/p?x=1&y=2') AS q,
           url_extract_fragment('https://a.example.com/p#frag') AS frag,
           url_extract_parameter('https://a.example.com/p?x=1&y=2', 'y') AS param,
           date_add(DAY, 3, TIMESTAMP'2024-01-30 12:00:00') AS plus3,
           date_add(DATE'2024-01-01', 5) AS spark_form,
           date_diff(HOUR, TIMESTAMP'2024-01-01 00:00:00',
                     TIMESTAMP'2024-01-02 06:00:00') AS dh""").head()
    assert(r.getDate(0).toString == "2024-03-05")
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0)
    assert(r.getLong(2) >= 0L && r.getLong(2) < 10L)
    assert(r.getString(3) == "a.example.com")
    assert(r.getString(4) == "https" && r.getString(5) == "/p/q")
    assert(r.getString(6) == "x=1&y=2" && r.getString(7) == "frag")
    assert(r.getString(8) == "2")
    assert(r.getTimestamp(9).toString.startsWith("2024-02-02 12:00:00"))
    assert(r.getDate(10).toString == "2024-01-06")
    assert(r.getAs[Number](11).longValue == 30L)
    // Trino's QUOTED unit spelling reaches Spark through the front door's
    // unit-unquoting render (Spark's parser owns date_add/date_diff)
    val fd = graft.sqlx.TrinoDialect.sql(spark, sfDir,
      """SELECT date_add('day', 3, TIMESTAMP '2024-01-30 12:00:00') AS plus3,
           date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                     TIMESTAMP '2024-01-02 06:00:00') AS dh""").head()
    assert(fd.getTimestamp(0).toString.startsWith("2024-02-02 12:00:00"))
    assert(fd.getLong(1) == 30L)
    // empty_approx_set is a union identity for the HLL state family
    import spark.implicits._
    val est = Seq(1L, 2L, 3L).toDF("x")
      .selectExpr("hll_sketch_agg(x) AS sk")
      .selectExpr("hll_sketch_estimate(hll_union(sk, empty_approx_set())) AS n")
      .head().getLong(0)
    assert(est == 3L)
    // hash_counts: retained-hash multiset of the KMV digest (counts = 1);
    // variant_is_null: reference spelling onto Spark's is_variant_null
    val hv = spark.sql(
      """SELECT hash_counts(array(7L, 9L)) AS hc,
           variant_is_null(parse_json('null')) AS vn,
           variant_is_null(parse_json('1')) AS vnn""").head()
    assert(hv.getMap[Long, Short](0) == Map(7L -> 1.toShort, 9L -> 1.toShort))
    assert(hv.getBoolean(1) && !hv.getBoolean(2))
  }
}
