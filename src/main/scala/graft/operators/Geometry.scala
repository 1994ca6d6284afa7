package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry breadth step 2 (SURVEY.md §2.8; reference plugin/trino-geospatial/
  * GeoFunctions.java ST_Distance:1697, ST_Buffer:736, ST_Union:1122, and
  * aggregation/GeometryUnionAgg.java + ConvexHullAggregation.java).
  *
  * Fixture discipline: all coordinates are integer-valued doubles, nearest
  * features are corner-to-corner or axis-perpendicular, and all boundary
  * crossings are proper — so every distance, area, and vertex count has an
  * exact closed form the oracle states independently. The point-buffer area
  * is the one genuinely floating-point output; its oracle replays the
  * kernel's shoelace term-for-term over the analytically-known octagon
  * vertices (products and left-associated additions in the same order →
  * bit-equal in any IEEE-754 engine).
  */
object Geometry {
  import graft.functions.GeoFunctions._
  import graft.functions.GeoAggregates

  /** ST_Distance over containment / perpendicular / corner / overlap cases. */
  def q_fn_geo_distance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1500)
      .withColumn("x", (($"c_custkey" * 7 % 50) * 16).cast("long"))
      .withColumn("y", (($"c_custkey" * 13 % 40) * 16).cast("long"))
      .withColumn("a", $"c_custkey" % 5)
      .withColumn("u", $"c_custkey" % 3 + 1)
      .withColumn("v", $"c_custkey" % 4 + 1)
      .withColumn("w", $"c_custkey" % 4)
      .withColumn("sq", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"x", $"y", $"x" + 2, $"y", $"x" + 2, $"y" + 2, $"x", $"y" + 2, $"x", $"y")))
      .withColumn("pt", stGeometryFromText(format_string(
        "POINT (%d %d)", $"x" + 2 + $"a", $"y" + 1)))
      .withColumn("sq_corner", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"x" + 2 + $"u", $"y" + 2 + $"v", $"x" + 4 + $"u", $"y" + 2 + $"v",
        $"x" + 4 + $"u", $"y" + 4 + $"v", $"x" + 2 + $"u", $"y" + 4 + $"v",
        $"x" + 2 + $"u", $"y" + 2 + $"v")))
      .withColumn("sq_overlap", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"x" + 1, $"y" + 1, $"x" + 3, $"y" + 1, $"x" + 3, $"y" + 3,
        $"x" + 1, $"y" + 3, $"x" + 1, $"y" + 1)))
      .withColumn("line", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d)",
        $"x" - 2 - $"w", $"y" + 1, $"x" - 2 - $"w", $"y" + 3)))
    t.select($"c_custkey",
        stDistance($"sq", $"pt").as("d_point"),
        stDistance($"sq", $"sq_corner").as("d_corner"),
        stDistance($"sq", $"sq_overlap").as("d_overlap"),
        stDistance($"sq", $"line").as("d_line"),
        stDistance($"pt", $"sq").as("d_sym"))
      .orderBy($"c_custkey")
  }
  val qFnGeoDistanceSql: String =
    """SELECT c_custkey,
         CAST(c_custkey % 5 AS DOUBLE) AS d_point,
         sqrt(CAST((c_custkey % 3 + 1) * (c_custkey % 3 + 1)
                 + (c_custkey % 4 + 1) * (c_custkey % 4 + 1) AS DOUBLE)) AS d_corner,
         0.0 AS d_overlap,
         CAST(2 + c_custkey % 4 AS DOUBLE) AS d_line,
         CAST(c_custkey % 5 AS DOUBLE) AS d_sym
       FROM customer WHERE c_custkey <= 1500 ORDER BY c_custkey"""

  /** ST_Buffer: octagonal point buffer with a term-exact shoelace replay,
    * square dilation invariants, identity at d=0, NULL for d<0. */
  def q_fn_geo_buffer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("d", ($"c_custkey" % 4 + 1) / 2.0)
      .withColumn("px", ($"c_custkey" * 7 % 100).cast("long"))
      .withColumn("py", ($"c_custkey" * 13 % 100).cast("long"))
      .withColumn("e", $"c_custkey" % 3 + 2)
      .withColumn("pt", stGeometryFromText(format_string("POINT (%d %d)", $"px", $"py")))
      .withColumn("sq", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"px", $"py", $"px" + $"e", $"py", $"px" + $"e", $"py" + $"e",
        $"px", $"py" + $"e", $"px", $"py")))
      .withColumn("pb", stBuffer($"pt", $"d"))
      .withColumn("sb", stBuffer($"sq", $"d".cast("double")))
    val exactOct = abs(stGeomArea($"pb") -
      (lit(2.0) * sqrt(lit(2.0)) * $"d" * $"d")) < 1e-9
    val sbAreaOk = abs(stGeomArea($"sb") -
      ($"e" * $"e" + lit(4.0) * $"e" * $"d" + lit(2.0) * sqrt(lit(2.0)) * $"d" * $"d")) < 1e-9
    t.select($"c_custkey",
        stNumPoints($"pb").as("pb_n"),
        stXMin($"pb").as("pb_xmin"),
        stXMax($"pb").as("pb_xmax"),
        stYMin($"pb").as("pb_ymin"),
        stYMax($"pb").as("pb_ymax"),
        stGeomArea($"pb").as("pb_area"),
        exactOct.as("pb_area_octagon_ok"),
        stNumPoints($"sb").as("sb_n"),
        stXMin($"sb").as("sb_xmin"),
        stXMax($"sb").as("sb_xmax"),
        sbAreaOk.as("sb_area_ok"),
        stGeomContains($"sb", $"px".cast("double"), $"py".cast("double")).as("sb_contains_corner"),
        (stAsText(stBuffer($"sq", lit(0.0))) === stAsText($"sq")).as("identity_ok"),
        stBuffer($"sq", lit(-1.0)).isNull.as("negative_null"))
      .orderBy($"c_custkey")
  }
  /** ST_Buffer on CONCAVE inputs (the exact octagonal-Minkowski offset,
    * GeoOps.buffer): L-shape dilation with a reflex miter, holed-shell
    * dilation with hole erosion, hole swallowing, and the loud NULL when a
    * cavity mouth narrower than 2d closes (topology change). The oracle
    * replays the closed-form areas: A + P·d + n_convex·(√2/2)d² − n_reflex·d²
    * for right-angle rings (strip area + octagon corner joins − reflex
    * overlap), scaled to e9-rounded micro-units so both engines hash
    * integers. */
  def q_fn_geo_buffer_concave(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("e", ($"c_custkey" % 3 + 1).cast("long"))
      .withColumn("d", ($"c_custkey" % 3 + 1) / 4.0)
      .withColumn("lshape", stGeometryFromText(format_string(
        "POLYGON ((0 0, %d 0, %d %d, %d %d, %d %d, 0 %d, 0 0))",
        $"e" * 2, $"e" * 2, $"e", $"e", $"e", $"e", $"e" * 2, $"e" * 2)))
      .withColumn("holed", stGeometryFromText(format_string(
        "POLYGON ((0 0, %d 0, %d %d, 0 %d, 0 0), (%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"e" * 6, $"e" * 6, $"e" * 6, $"e" * 6,
        $"e" * 2, $"e" * 2, $"e" * 4, $"e" * 2, $"e" * 4, $"e" * 4,
        $"e" * 2, $"e" * 4, $"e" * 2, $"e" * 2)))
      .withColumn("tiny_hole", stGeometryFromText(concat(
        format_string("POLYGON ((0 0, %d 0, %d %d, 0 %d, 0 0), (1 1, ", $"e" * 4, $"e" * 4, $"e" * 4, $"e" * 4),
        (lit(1.0) + $"d" / 2).cast("string"), lit(" 1, "),
        (lit(1.0) + $"d" / 2).cast("string"), lit(" "), (lit(1.0) + $"d" / 2).cast("string"),
        lit(", 1 "), (lit(1.0) + $"d" / 2).cast("string"), lit(", 1 1))"))))
      .withColumn("ushape", stGeometryFromText(concat(
        lit("POLYGON ((0 0, 4 0, 4 4, "), (lit(1.0) + $"d").cast("string"),
        lit(" 4, "), (lit(1.0) + $"d").cast("string"),
        lit(" 1, 1 1, 1 4, 0 4, 0 0))"))))
      .withColumn("lb", stBuffer($"lshape", $"d"))
      .withColumn("hb", stBuffer($"holed", $"d"))
      .withColumn("tb", stBuffer($"tiny_hole", $"d"))
    t.select($"c_custkey",
        round(stGeomArea($"lb") * 1e6).cast("long").as("l_area_e6"),
        stNumPoints($"lb").as("l_n"),
        (!stGeomContains($"lb", $"e" + $"d" + $"e" / lit(4.0),
          $"e" + $"d" + $"e" / lit(4.0))).as("notch_outside"),
        round(stGeomArea($"hb") * 1e6).cast("long").as("holed_area_e6"),
        stNumInteriorRing($"hb").as("holed_rings"),
        round(stGeomArea($"tb") * 1e6).cast("long").as("swallowed_area_e6"),
        stNumInteriorRing($"tb").as("swallowed_rings"),
        stBuffer($"ushape", $"d").isNull.as("cavity_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoBufferConcaveSql: String =
    """SELECT c_custkey,
         CAST(round((3*e*e + 8*e*d + 5*(sqrt(2.0)/2)*d*d - d*d) * 1e6) AS BIGINT) AS l_area_e6,
         17 AS l_n,
         TRUE AS notch_outside,
         CAST(round((36*e*e + 24*e*d + 4*(sqrt(2.0)/2)*d*d - (2*e-2*d)*(2*e-2*d)) * 1e6) AS BIGINT) AS holed_area_e6,
         1 AS holed_rings,
         CAST(round((16*e*e + 16*e*d + 4*(sqrt(2.0)/2)*d*d) * 1e6) AS BIGINT) AS swallowed_area_e6,
         0 AS swallowed_rings,
         TRUE AS cavity_null
       FROM (SELECT c_custkey,
               CAST(c_custkey % 3 + 1 AS DOUBLE) AS e,
               (c_custkey % 3 + 1) / 4.0 AS d
             FROM customer WHERE c_custkey <= 1000)
       ORDER BY c_custkey"""

  val qFnGeoBufferSql: String =
    """WITH t AS (
         SELECT c_custkey,
           (c_custkey % 4 + 1) / 2.0 AS d,
           CAST(c_custkey * 7 % 100 AS DOUBLE) AS px,
           CAST(c_custkey * 13 % 100 AS DOUBLE) AS py,
           CAST(c_custkey % 3 + 2 AS DOUBLE) AS e
         FROM customer WHERE c_custkey <= 1000),
       o AS (SELECT *, d * sqrt(0.5) AS s FROM t),
       -- the kernel's octagon vertices, CCW from the lexicographic min:
       -- (px-d,py) (px-s,py-s) (px,py-d) (px+s,py-s) (px+d,py) (px+s,py+s)
       -- (px,py+d) (px-s,py+s); shoelace replayed term-for-term (the
       -- closing-duplicate edge contributes exactly 0), left-associated
       -- like the kernel's accumulator
       w AS (SELECT *,
           (px-d)*(py-s) - (px-s)*py     AS t1,
           (px-s)*(py-d) - px*(py-s)     AS t2,
           px*(py-s) - (px+s)*(py-d)     AS t3,
           (px+s)*py - (px+d)*(py-s)     AS t4,
           (px+d)*(py+s) - (px+s)*py     AS t5,
           (px+s)*(py+d) - px*(py+s)     AS t6,
           px*(py+s) - (px-s)*(py+d)     AS t7,
           (px-s)*py - (px-d)*(py+s)     AS t8
         FROM o),
       v AS (SELECT *, t1 + t2 + t3 + t4 + t5 + t6 + t7 + t8 AS shoelace FROM w)
       SELECT c_custkey,
         9 AS pb_n,
         px - d AS pb_xmin, px + d AS pb_xmax,
         py - d AS pb_ymin, py + d AS pb_ymax,
         abs(shoelace / 2.0) AS pb_area,
         TRUE AS pb_area_octagon_ok,
         13 AS sb_n,
         px - d AS sb_xmin, px + e + d AS sb_xmax,
         TRUE AS sb_area_ok,
         TRUE AS sb_contains_corner,
         TRUE AS identity_ok,
         TRUE AS negative_null
       FROM v ORDER BY c_custkey"""

  /** ST_Union: proper-crossing union, disjoint MULTIPOLYGON collection,
    * containment collapse, multipoint dedup — all analytic. */
  def q_fn_geo_union(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 800)
      .withColumn("x0", (($"c_custkey" * 7 % 100) * 20).cast("long"))
      .withColumn("a", $"c_custkey" % 3 + 3)
      .withColumn("ga", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d %d, %d %d, %d 0))",
        $"x0", $"x0" + $"a", $"x0" + $"a", $"a", $"x0", $"a", $"x0")))
      .withColumn("gb", stGeometryFromText(format_string(
        "POLYGON ((%d 1, %d 1, %d %d, %d %d, %d 1))",
        $"x0" + $"a" - 2, $"x0" + $"a" + 2, $"x0" + $"a" + 2, $"a" - 1,
        $"x0" + $"a" - 2, $"a" - 1, $"x0" + $"a" - 2)))
      .withColumn("gd", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 2, %d 2, %d 0))",
        $"x0" + $"a" + 10, $"x0" + $"a" + 12, $"x0" + $"a" + 12,
        $"x0" + $"a" + 10, $"x0" + $"a" + 10)))
      .withColumn("gi", stGeometryFromText(format_string(
        "POLYGON ((%d 1, %d 1, %d 2, %d 2, %d 1))",
        $"x0" + 1, $"x0" + 2, $"x0" + 2, $"x0" + 1, $"x0" + 1)))
      .withColumn("mpa", stGeometryFromText(format_string(
        "MULTIPOINT (%d 0, %d 1)", $"x0", $"x0" + 1)))
      .withColumn("mpb", stGeometryFromText(format_string(
        "MULTIPOINT (%d 0, %d 2)", $"x0", $"x0" + 2)))
      .withColumn("gp", stGeometryFromText(format_string("POINT (%d 0)", $"x0")))
      .withColumn("u", stUnion($"ga", $"gb"))
      .withColumn("ud", stUnion($"ga", $"gd"))
      .withColumn("lu", stUnion(
        stGeometryFromText(format_string("LINESTRING (%d 0, %d 2)", $"x0", $"x0" + 2)),
        stGeometryFromText(format_string("LINESTRING (%d 2, %d 0)", $"x0", $"x0" + 2))))
    t.select($"c_custkey",
        stGeomArea($"u").as("u_area"),
        stNumGeometries($"u").as("u_nparts"),
        stNumPoints($"u").as("u_npoints"),
        stXMax($"u").as("u_xmax"),
        stYMax($"u").as("u_ymax"),
        stNumGeometries($"ud").as("ud_nparts"),
        stGeomArea($"ud").as("ud_area"),
        stGeomArea(stUnion($"ga", $"gi")).as("uc_area"),
        stNumPoints(stUnion($"mpa", $"mpb")).as("mp_n"),
        stUnion($"ga", $"gp").isNull.as("mixed_null"),
        stGeomArea(stIntersection($"ga", $"gb")).as("i_area"),
        ((stGeomArea($"ga") + stGeomArea($"gb")) ===
          (stGeomArea($"u") + stGeomArea(stIntersection($"ga", $"gb"))))
          .as("inclusion_exclusion_ok"),
        stGeomArea(stIntersection($"ga", $"gi")).as("ic_area"),
        stIntersection($"ga", $"gd").isNull.as("i_disjoint_null"),
        // noded line union: X crossing splits into 4 pieces, length kept
        stNumGeometries($"lu").as("lu_nparts"),
        round(stGeomLength($"lu"), 9).as("lu_len"))
      .orderBy($"c_custkey")
  }

  /** Aggregates: geometry_union_agg dissolves a staircase of overlapping
    * cells per nation into one polygon; convex_hull_agg hulls all cell
    * corners. Cell i: x ∈ [2i, 2i+3] (+nation offset), y ∈ [0,4] for even i,
    * [1,3] for odd — consecutive cells cross properly, others are disjoint. */
  def q_geo_union_agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = table(s, dir, "nation")
      .withColumn("x0", ($"n_nationkey" * 50).cast("long"))
      .withColumn("k", $"n_nationkey" % 4 + 3)
      .withColumn("i", explode(sequence(lit(0), $"k" - 1)))
      .withColumn("cx", $"x0" + $"i" * 2)
      .withColumn("y0", when($"i" % 2 === 0, 0L).otherwise(1L))
      .withColumn("y1", when($"i" % 2 === 0, 4L).otherwise(3L))
      .withColumn("geom", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"cx", $"y0", $"cx" + 3, $"y0", $"cx" + 3, $"y1", $"cx", $"y1", $"cx", $"y0")))
    val agged = cells.groupBy($"n_nationkey", $"x0", $"k")
      .agg(GeoAggregates.geometryUnionAgg($"geom").as("u_wkt"),
        GeoAggregates.convexHullAgg($"geom").as("h_wkt"))
      .withColumn("u", stGeometryFromText($"u_wkt"))
      .withColumn("h", stGeometryFromText($"h_wkt"))
    agged.select($"n_nationkey",
        stGeomArea($"u").as("u_area"),
        stNumGeometries($"u").as("u_nparts"),
        stXMin($"u").as("u_xmin"),
        stXMax($"u").as("u_xmax"),
        stYMin($"u").as("u_ymin"),
        stYMax($"u").as("u_ymax"),
        stGeomArea($"h").as("h_area"),
        stNumPoints($"h").as("h_n"))
      .orderBy($"n_nationkey")
  }
  /** geometry_collect_agg (reference docs/functions/geospatial.md:670 —
    * "a multi-geometry or geometry collection containing all input
    * geometries"): homogeneous point groups collapse to MULTIPOINT; one
    * group mixes in LINESTRINGs to force the GEOMETRYCOLLECTION branch.
    * Output is the collection KIND plus numeric facts (part count, bbox) so
    * the oracle replays without WKT float-format coupling. */
  def q_geo_collect_agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val geoms = table(s, dir, "nation")
      .withColumn("grp", $"n_nationkey" % 5)
      .withColumn("wkt",
        when($"grp" === 4 && $"n_nationkey" % 2 === 1,
          format_string("LINESTRING (%d 0, %d 3)", $"n_nationkey", $"n_nationkey" + 2))
          .otherwise(format_string("POINT (%d %d)", $"n_nationkey", $"n_regionkey")))
      .withColumn("geom", stGeometryFromText($"wkt"))
    geoms.groupBy($"grp")
      .agg(GeoAggregates.geometryCollectAgg($"geom").as("coll_wkt"))
      .withColumn("coll", stGeometryFromText($"coll_wkt"))
      .select($"grp",
        substring_index($"coll_wkt", " (", 1).as("kind"),
        stNumGeometries($"coll").as("n_parts"),
        stXMin($"coll").as("xmin"),
        stXMax($"coll").as("xmax"),
        stYMin($"coll").as("ymin"),
        stYMax($"coll").as("ymax"))
      .orderBy($"grp")
  }
  val qGeoCollectAggSql: String =
    """WITH g AS (
         SELECT n_nationkey AS k, n_regionkey AS r, n_nationkey % 5 AS grp,
           (n_nationkey % 5 = 4 AND n_nationkey % 2 = 1) AS is_line
         FROM nation)
       SELECT grp,
         CASE WHEN grp = 4 THEN 'GEOMETRYCOLLECTION' ELSE 'MULTIPOINT' END AS kind,
         CAST(count(*) AS INT) AS n_parts,
         CAST(min(k) AS DOUBLE) AS xmin,
         CAST(max(CASE WHEN is_line THEN k + 2 ELSE k END) AS DOUBLE) AS xmax,
         CAST(min(CASE WHEN is_line THEN 0 ELSE r END) AS DOUBLE) AS ymin,
         CAST(max(CASE WHEN is_line THEN 3 ELSE r END) AS DOUBLE) AS ymax
       FROM g GROUP BY grp ORDER BY grp"""

  val qGeoUnionAggSql: String =
    """WITH t AS (
         SELECT n_nationkey,
           CAST(n_nationkey * 50 AS DOUBLE) AS x0,
           n_nationkey % 4 + 3 AS k
         FROM nation)
       SELECT n_nationkey,
         -- even cells 3x4=12, odd cells 3x2=6, consecutive overlap 1x2=2
         12.0 * ceil(k / 2.0) + 6.0 * floor(k / 2.0) - 2.0 * (k - 1) AS u_area,
         1 AS u_nparts,
         x0 AS u_xmin,
         x0 + 2 * (k - 1) + 3 AS u_xmax,
         0.0 AS u_ymin,
         4.0 AS u_ymax,
         -- hull of all corners: rectangle [x0, x0+2k+1] x [0,4] when the
         -- last cell is even (k odd); two clipped corners (area −1 each)
         -- when the last cell is odd (k even)
         CASE WHEN k % 2 = 1 THEN (2.0 * k + 1.0) * 4.0
              ELSE (2.0 * k + 1.0) * 4.0 - 2.0 END AS h_area,
         CASE WHEN k % 2 = 1 THEN 5 ELSE 7 END AS h_n
       FROM t ORDER BY n_nationkey"""

  val qFnGeoUnionSql: String =
    """SELECT c_custkey,
         CAST(a * a + 2 * (a - 2) AS DOUBLE) AS u_area,
         1 AS u_nparts,
         9 AS u_npoints,
         CAST(x0 + a + 2 AS DOUBLE) AS u_xmax,
         CAST(a AS DOUBLE) AS u_ymax,
         2 AS ud_nparts,
         CAST(a * a + 4 AS DOUBLE) AS ud_area,
         CAST(a * a AS DOUBLE) AS uc_area,
         3 AS mp_n,
         TRUE AS mixed_null,
         CAST(2 * (a - 2) AS DOUBLE) AS i_area,
         TRUE AS inclusion_exclusion_ok,
         1.0 AS ic_area,
         TRUE AS i_disjoint_null,
         4 AS lu_nparts,
         round(4 * sqrt(2.0), 9) AS lu_len
       FROM (SELECT c_custkey,
               (c_custkey * 7 % 100) * 20 AS x0,
               c_custkey % 3 + 3 AS a
             FROM customer WHERE c_custkey <= 800)
       ORDER BY c_custkey"""

  /** ST_Difference / ST_SymDifference (GeoFunctions.java:1685/:1754):
    * notch subtraction, complementary overhang, the U-prong multi-region
    * split, hole punching under containment, disjoint identity, and the
    * empty → NULL case — every measure a closed form over (x0, a). */
  def q_fn_geo_difference(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 800)
      .withColumn("x0", (($"c_custkey" * 7 % 100) * 20).cast("long"))
      .withColumn("a", $"c_custkey" % 3 + 3)
      .withColumn("ga", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d %d, %d %d, %d 0))",
        $"x0", $"x0" + $"a", $"x0" + $"a", $"a", $"x0", $"a", $"x0")))
      .withColumn("gb", stGeometryFromText(format_string(
        "POLYGON ((%d 1, %d 1, %d %d, %d %d, %d 1))",
        $"x0" + $"a" - 2, $"x0" + $"a" + 2, $"x0" + $"a" + 2, $"a" - 1,
        $"x0" + $"a" - 2, $"a" - 1, $"x0" + $"a" - 2)))
      .withColumn("inner", stGeometryFromText(format_string(
        "POLYGON ((%d 1, %d 1, %d 2, %d 2, %d 1))",
        $"x0" + 1, $"x0" + 2, $"x0" + 2, $"x0" + 1, $"x0" + 1)))
      .withColumn("far", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 2, %d 2, %d 0))",
        $"x0" + 50, $"x0" + 52, $"x0" + 52, $"x0" + 50, $"x0" + 50)))
      .withColumn("strip", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 1, %d 1, %d 0))",
        $"x0", $"x0" + 8, $"x0" + 8, $"x0", $"x0")))
      .withColumn("uprong", stGeometryFromText(format_string(
        "POLYGON ((%d 2, %d -2, %d -2, %d 2, %d 2, %d -1, %d -1, %d 2, %d 2))",
        $"x0" + 1, $"x0" + 1, $"x0" + 7, $"x0" + 7, $"x0" + 5,
        $"x0" + 5, $"x0" + 3, $"x0" + 3, $"x0" + 1)))
      .withColumn("d", stDifference($"ga", $"gb"))
      .withColumn("hole", stDifference($"ga", $"inner"))
      .withColumn("md", stDifference($"strip", $"uprong"))
      .withColumn("sd", stSymDifference($"ga", $"gb"))
    t.select($"c_custkey",
        stGeomArea($"d").as("d_area"),
        stNumGeometries($"d").as("d_nparts"),
        stGeomArea(stDifference($"gb", $"ga")).as("dba_area"),
        ((stGeomArea($"d") + stGeomArea(stIntersection($"ga", $"gb"))) ===
          stGeomArea($"ga")).as("d_incl_excl_ok"),
        stGeomArea($"hole").as("hole_area"),
        stNumInteriorRing($"hole").as("hole_nrings"),
        stGeomContains($"hole", ($"x0" + 0.5).cast("double"), lit(0.5)).as("hole_out_ok"),
        (!stGeomContains($"hole", ($"x0" + 1.5).cast("double"), lit(1.5))).as("hole_in_ok"),
        stNumGeometries($"md").as("md_nparts"),
        stGeomArea($"md").as("md_area"),
        stGeomArea(stDifference($"ga", $"far")).as("disj_area"),
        stDifference($"inner", $"ga").isNull.as("empty_null"),
        stGeomArea($"sd").as("sd_area"),
        stNumGeometries($"sd").as("sd_nparts"),
        stGeomArea(stSymDifference($"inner", $"ga")).as("sdh_area"),
        stNumGeometries(stSymDifference($"ga", $"far")).as("sdd_nparts"))
      .orderBy($"c_custkey")
  }
  val qFnGeoDifferenceSql: String =
    """SELECT c_custkey,
         CAST(a * a - 2 * (a - 2) AS DOUBLE) AS d_area,
         1 AS d_nparts,
         CAST(2 * (a - 2) AS DOUBLE) AS dba_area,
         TRUE AS d_incl_excl_ok,
         CAST(a * a - 1 AS DOUBLE) AS hole_area,
         1 AS hole_nrings,
         TRUE AS hole_out_ok,
         TRUE AS hole_in_ok,
         3 AS md_nparts,
         4.0 AS md_area,
         CAST(a * a AS DOUBLE) AS disj_area,
         TRUE AS empty_null,
         CAST(a * a AS DOUBLE) AS sd_area,
         2 AS sd_nparts,
         CAST(a * a - 1 AS DOUBLE) AS sdh_area,
         2 AS sdd_nparts
       FROM (SELECT c_custkey,
               (c_custkey * 7 % 100) * 20 AS x0,
               c_custkey % 3 + 3 AS a
             FROM customer WHERE c_custkey <= 800)
       ORDER BY c_custkey"""

  /** ST_AsBinary / ST_GeomFromBinary (GeoFunctions.java:726/:480): WKB
    * lengths are CLOSED FORMS of the geometry's shape (point 21 B,
    * linestring 9+16n, polygon 9+4r+16n), the NDR header bytes are
    * constants, and the double payload of POINT(x y) replays through the
    * existing to_ieee754_64 codec (byte-reversed to little-endian) — so
    * DuckDB pins the exact bytes, not just a roundtrip. */
  def q_fn_geo_wkb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 800)
      .withColumn("px", (($"c_custkey" * 7 % 100) + 0.25).cast("double"))
      .withColumn("py", (($"c_custkey" * 13 % 100) + 0.5).cast("double"))
      .withColumn("k", $"c_custkey" % 5 + 2)
      .withColumn("pt", stGeometryFromText(format_string("POINT (%s %s)", $"px", $"py")))
      .withColumn("ln", stGeometryFromText(concat(lit("LINESTRING ("),
        concat_ws(", ", transform(sequence(lit(0), $"k" - 1),
          i => concat($"px" + i, lit(" "), $"py" - i))), lit(")"))))
      .withColumn("pg", stGeometryFromText(format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s))",
        $"px", $"py", $"px" + 2, $"py", $"px" + 2, $"py" + 2, $"px", $"py")))
      .withColumn("pt_wkb", stAsBinary($"pt"))
      .withColumn("ln_wkb", stAsBinary($"ln"))
      .withColumn("pg_wkb", stAsBinary($"pg"))
    t.select($"c_custkey",
        length($"pt_wkb").cast("long").as("pt_len"),
        length($"ln_wkb").cast("long").as("ln_len"),
        length($"pg_wkb").cast("long").as("pg_len"),
        lower(hex($"pt_wkb")).as("pt_hex"),
        substring(lower(hex($"ln_wkb")), 1, 18).as("ln_hdr"),
        (stAsText(stGeomFromBinary($"pt_wkb")) === stAsText($"pt")).as("pt_rt"),
        (stAsText(stGeomFromBinary($"ln_wkb")) === stAsText($"ln")).as("ln_rt"),
        (stAsText(stGeomFromBinary($"pg_wkb")) === stAsText($"pg")).as("pg_rt"),
        stGeomFromBinary(lit(Array[Byte](9, 9))).isNull.as("malformed_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoWkbSql: String =
    """WITH t AS (
         SELECT c_custkey,
           (c_custkey * 7 % 100) + 0.25 AS px,
           (c_custkey * 13 % 100) + 0.5 AS py,
           c_custkey % 5 + 2 AS k
         FROM customer WHERE c_custkey <= 800),
       -- IEEE-754 bits of a positive dyadic double in exact BIGINT
       -- arithmetic: bits = (e+1023)<<52 | (v/2^e * 2^52 - 2^52)
       b AS (SELECT *,
           lower(printf('%016x',
             ((CAST(floor(log2(px)) AS BIGINT) + 1023) << 52)
             | (CAST(px / power(2, CAST(floor(log2(px)) AS BIGINT))
                 * 4503599627370496 AS BIGINT) - 4503599627370496))) AS hx,
           lower(printf('%016x',
             ((CAST(floor(log2(py)) AS BIGINT) + 1023) << 52)
             | (CAST(py / power(2, CAST(floor(log2(py)) AS BIGINT))
                 * 4503599627370496 AS BIGINT) - 4503599627370496))) AS hy
         FROM t),
       -- little-endian = byte-reversed big-endian
       r AS (SELECT *,
           substr(hx,15,2)||substr(hx,13,2)||substr(hx,11,2)||substr(hx,9,2)
             ||substr(hx,7,2)||substr(hx,5,2)||substr(hx,3,2)||substr(hx,1,2) AS lx,
           substr(hy,15,2)||substr(hy,13,2)||substr(hy,11,2)||substr(hy,9,2)
             ||substr(hy,7,2)||substr(hy,5,2)||substr(hy,3,2)||substr(hy,1,2) AS ly
         FROM b)
       SELECT c_custkey,
         CAST(21 AS BIGINT) AS pt_len,
         CAST(9 + 16 * k AS BIGINT) AS ln_len,
         CAST(77 AS BIGINT) AS pg_len,
         '0101000000' || lx || ly AS pt_hex,
         '0102000000' || substr(printf('%08x', k), 7, 2) || '000000' AS ln_hdr,
         TRUE AS pt_rt, TRUE AS ln_rt, TRUE AS pg_rt,
         TRUE AS malformed_null
       FROM r ORDER BY c_custkey"""

  /** Relation predicates + validity + boundary/points + GeoJSON roundtrip
    * (GeoFunctions.java ST_Equals/ST_Disjoint/ST_Touches/ST_Overlaps/
    * ST_Crosses/ST_IsValid/geometry_invalid_reason/ST_Boundary/ST_Points/
    * ST_CoordDim + the GeoJson codec): each boolean derives from the
    * analytic layout — square A at x0, overlapping square B, edge-adjacent
    * square T, disjoint square D, a crossing line and a contained line, and
    * a bowtie ring for invalidity. */
  def q_fn_geo_relations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 800)
      .withColumn("x0", (($"c_custkey" * 7 % 100) * 30).cast("long"))
      .withColumn("ga", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 4, %d 4, %d 0))",
        $"x0", $"x0" + 4, $"x0" + 4, $"x0", $"x0")))
      .withColumn("gb", stGeometryFromText(format_string(
        "POLYGON ((%d 2, %d 2, %d 6, %d 6, %d 2))",
        $"x0" + 2, $"x0" + 6, $"x0" + 6, $"x0" + 2, $"x0" + 2)))
      .withColumn("gt", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 4, %d 4, %d 0))",
        $"x0" + 4, $"x0" + 8, $"x0" + 8, $"x0" + 4, $"x0" + 4)))
      .withColumn("gd", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 0, %d 2, %d 2, %d 0))",
        $"x0" + 20, $"x0" + 22, $"x0" + 22, $"x0" + 20, $"x0" + 20)))
      .withColumn("ga2", stGeometryFromText(format_string(
        "POLYGON ((%d 4, %d 0, %d 0, %d 4, %d 4))", // same square, rotated start
        $"x0", $"x0", $"x0" + 4, $"x0" + 4, $"x0")))
      .withColumn("lcross", stGeometryFromText(format_string(
        "LINESTRING (%d 1, %d 1)", $"x0" - 2, $"x0" + 6)))
      .withColumn("lin", stGeometryFromText(format_string(
        "LINESTRING (%d 1, %d 3)", $"x0" + 1, $"x0" + 3)))
      .withColumn("bowtie", stGeometryFromText(format_string(
        "POLYGON ((%d 0, %d 4, %d 0, %d 4, %d 0))",
        $"x0" + 40, $"x0" + 44, $"x0" + 44, $"x0" + 40, $"x0" + 40)))
    t.select($"c_custkey",
        stEquals($"ga", $"ga2").as("eq_rotated"),
        stEquals($"ga", $"gb").as("eq_diff"),
        stDisjoint($"ga", $"gd").as("disj_far"),
        stDisjoint($"ga", $"gt").as("disj_touching"),
        stTouches($"ga", $"gt").as("touches_edge"),
        stTouches($"ga", $"gb").as("touches_overlap"),
        stOverlaps($"ga", $"gb").as("overlaps_ab"),
        stOverlaps($"ga", $"gd").as("overlaps_far"),
        stCrosses($"lcross", $"ga").as("crosses_line"),
        stCrosses($"lin", $"ga").as("crosses_contained"),
        stIsValid($"ga").as("valid_square"),
        stIsValid($"bowtie").as("valid_bowtie"),
        geometryInvalidReason($"bowtie").as("bowtie_reason"),
        geometryInvalidReason($"ga").isNull.as("square_no_reason"),
        stNumGeometries(stBoundary($"ga")).as("bnd_nparts"),
        round(stGeomLength(stBoundary($"ga")), 9).as("bnd_len"),
        stNumPoints(stPoints($"ga")).as("pts_n"),
        stCoordDim($"ga").as("coord_dim"),
        toGeojsonGeometry(stGeometryFromText(format_string(
          "POINT (%d 2)", $"x0"))).as("gj_point"),
        (stAsText(fromGeojsonGeometry(toGeojsonGeometry($"ga"))) ===
          stAsText($"ga")).as("gj_roundtrip"),
        fromGeojsonGeometry(lit("{nope")).isNull.as("gj_bad_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoRelationsSql: String =
    """SELECT c_custkey,
         TRUE AS eq_rotated,
         FALSE AS eq_diff,
         TRUE AS disj_far,
         FALSE AS disj_touching,
         TRUE AS touches_edge,
         FALSE AS touches_overlap,
         TRUE AS overlaps_ab,
         FALSE AS overlaps_far,
         TRUE AS crosses_line,
         FALSE AS crosses_contained,
         TRUE AS valid_square,
         FALSE AS valid_bowtie,
         'ring 0 self-intersects' AS bowtie_reason,
         TRUE AS square_no_reason,
         1 AS bnd_nparts,
         16.0 AS bnd_len,
         CAST(5 AS BIGINT) AS pts_n,
         2 AS coord_dim,
         '{"type":"Point","coordinates":[' || CAST((c_custkey * 7 % 100) * 30 AS BIGINT) || ',2]}' AS gj_point,
         TRUE AS gj_roundtrip,
         TRUE AS gj_bad_null
       FROM customer WHERE c_custkey <= 800 ORDER BY c_custkey"""

  /** Accessor family (GeoFunctions.java ST_X:1511/ST_Y/ST_Dimension:814/
    * ST_IsClosed:823/ST_IsRing:1378/ST_GeometryType:1989/ST_PointN:1315/
    * ST_StartPoint/ST_EndPoint): per customer a point, an open path, a
    * simple closed ring, and a closed-but-self-crossing bowtie — so both
    * is_ring branches and the kind-mismatch NULLs all occur. */
  def q_fn_geo_accessors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("x", (($"c_custkey" * 7 % 90) * 8).cast("long"))
      .withColumn("y", (($"c_custkey" * 13 % 70) * 8).cast("long"))
      .withColumn("pt", stGeometryFromText(format_string("POINT (%d %d)", $"x", $"y")))
      .withColumn("path", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 1, $"y" + 2, $"x" + 3, $"y")))
      .withColumn("ring", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 2, $"y", $"x" + 2, $"y" + 2, $"x", $"y" + 2, $"x", $"y")))
      .withColumn("bowtie", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 2, $"y" + 2, $"x" + 2, $"y", $"x", $"y" + 2, $"x", $"y")))
    t.select($"c_custkey",
        stX($"pt").as("px"),
        stY($"pt").as("py"),
        stX($"path").isNull.as("x_on_line_null"),
        stGeometryType($"pt").as("t_point"),
        stGeometryType($"ring").as("t_line"),
        stDimension($"pt").as("dim_point"),
        stDimension($"path").as("dim_line"),
        stIsClosed($"path").as("path_closed"),
        stIsClosed($"ring").as("ring_closed"),
        stIsRing($"ring").as("ring_is_ring"),
        stIsRing($"bowtie").as("bowtie_is_ring"),
        stIsEmpty($"pt").as("pt_empty"),
        stX(stPointN($"path", lit(2))).as("p2_x"),
        stY(stStartPoint($"path")).as("start_y"),
        stX(stEndPoint($"path")).as("end_x"),
        stPointN($"path", lit(9)).isNull.as("oob_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoAccessorsSql: String =
    """SELECT c_custkey,
         CAST((c_custkey * 7 % 90) * 8 AS DOUBLE) AS px,
         CAST((c_custkey * 13 % 70) * 8 AS DOUBLE) AS py,
         TRUE AS x_on_line_null,
         'ST_Point' AS t_point,
         'ST_LineString' AS t_line,
         0 AS dim_point,
         1 AS dim_line,
         FALSE AS path_closed,
         TRUE AS ring_closed,
         TRUE AS ring_is_ring,
         FALSE AS bowtie_is_ring,
         FALSE AS pt_empty,
         CAST((c_custkey * 7 % 90) * 8 + 1 AS DOUBLE) AS p2_x,
         CAST((c_custkey * 13 % 70) * 8 AS DOUBLE) AS start_y,
         CAST((c_custkey * 7 % 90) * 8 + 3 AS DOUBLE) AS end_x,
         TRUE AS oob_null
       FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey"""

  /** SphericalGeography measures (GeoFunctions.java spherical ST_Distance
    * :2227 meters, ST_Length:901, ST_Area:2257 spherical excess; R =
    * 6371.01 km). Distance/length replay the exact atan2 great-circle
    * formula in the oracle (round-9 absorbs libm ulps); the excess loop has
    * no SQL closed form, so area is pinned by a small-patch planar-ratio
    * bound and strict monotonicity (octant known-answer lives in
    * GeoOpsSpec). */
  def q_fn_geo_spherical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("lat", (($"c_custkey" * 7 % 120) - 60 + lit(0.25)).cast("double"))
      .withColumn("lon", (($"c_custkey" * 13 % 300) - 150 + lit(0.25)).cast("double"))
      .withColumn("dlat", ($"c_custkey" % 5 + 1).cast("double") / 10.0)
      .withColumn("dlon", ($"c_custkey" % 7 + 1).cast("double") / 10.0)
      .withColumn("p1", stGeometryFromText(format_string("POINT (%s %s)", $"lon", $"lat")))
      .withColumn("p2", stGeometryFromText(format_string(
        "POINT (%s %s)", $"lon" + $"dlon", $"lat" + $"dlat")))
      .withColumn("line", stGeometryFromText(format_string(
        "LINESTRING (%s %s, %s %s, %s %s)",
        $"lon", $"lat", $"lon" + $"dlon", $"lat" + $"dlat",
        $"lon" + $"dlon" * 2, $"lat")))
      .withColumn("patch", stGeometryFromText(format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        $"lon", $"lat", $"lon" + lit(0.1), $"lat", $"lon" + lit(0.1), $"lat" + lit(0.1),
        $"lon", $"lat" + lit(0.1), $"lon", $"lat")))
      .withColumn("patch2", stGeometryFromText(format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        $"lon", $"lat", $"lon" + lit(0.2), $"lat", $"lon" + lit(0.2), $"lat" + lit(0.2),
        $"lon", $"lat" + lit(0.2), $"lon", $"lat")))
    // planar small-patch approximation in m²: (Δφ·R)·(Δλ·R·cos φ_mid)
    val r = graft.ext.SphericalGeo.EarthRadiusM
    val planar = (radians(lit(0.1)) * r) *
      (radians(lit(0.1)) * r * cos(radians($"lat" + 0.05)))
    t.select($"c_custkey",
        round(stSphericalDistance($"p1", $"p2"), 5).as("d_m"),
        round(stSphericalLength($"line"), 5).as("len_m"),
        (abs(stSphericalArea($"patch") - planar) / planar < 0.001).as("patch_area_ok"),
        (stSphericalArea($"patch2") > stSphericalArea($"patch") * 3.9).as("area_monotone_ok"),
        stSphericalArea($"p1").isNull.as("area_on_point_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoSphericalSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey * 7 % 120) - 60 + 0.25 AS DOUBLE) AS lat,
           CAST((c_custkey * 13 % 300) - 150 + 0.25 AS DOUBLE) AS lon,
           CAST(c_custkey % 5 + 1 AS DOUBLE) / 10.0 AS dlat,
           CAST(c_custkey % 7 + 1 AS DOUBLE) / 10.0 AS dlon
         FROM customer WHERE c_custkey <= 1000),
       d AS (
         SELECT c_custkey, lat, lon, dlat, dlon,
           radians(lat) AS phi1, radians(lat + dlat) AS phi2,
           radians(lon) - radians(lon + dlon) AS dl12,
           radians(lat + dlat) AS lphi1, radians(lat) AS lphi2,
           radians(lon + dlon) - radians(lon + dlon * 2) AS dl23
         FROM t),
       g AS (
         SELECT *,
           atan2(sqrt(pow(cos(phi2) * sin(dl12), 2)
                    + pow(cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dl12), 2)),
                 sin(phi1) * sin(phi2) + cos(phi1) * cos(phi2) * cos(dl12))
             * 6371.01 * 1000 AS leg1,
           atan2(sqrt(pow(cos(lphi2) * sin(dl23), 2)
                    + pow(cos(lphi1) * sin(lphi2) - sin(lphi1) * cos(lphi2) * cos(dl23), 2)),
                 sin(lphi1) * sin(lphi2) + cos(lphi1) * cos(lphi2) * cos(dl23))
             * 6371.01 * 1000 AS leg2
         FROM d)
       SELECT c_custkey,
         round(leg1, 5) AS d_m,
         round(leg1 + leg2, 5) AS len_m,
         TRUE AS patch_area_ok,
         TRUE AS area_monotone_ok,
         TRUE AS area_on_point_null
       FROM g ORDER BY c_custkey"""

  /** line_locate_point / line_interpolate_point (GeoFunctions.java:2135,
    * lineInterpolatePoint) + great_circle_distance (:2100, KM) over an
    * L-shaped path of total length 8 — locate fractions and interpolated
    * coordinates are exact dyadic; the great-circle column replays the
    * formula at round-5. */
  def q_fn_geo_line(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("x", (($"c_custkey" * 7 % 80) * 10).cast("long"))
      .withColumn("y", (($"c_custkey" * 13 % 60) * 10).cast("long"))
      .withColumn("f", ($"c_custkey" % 9).cast("double") / 8.0)
      .withColumn("line", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 4, $"y", $"x" + 4, $"y" + 4)))
      .withColumn("probe", stGeometryFromText(format_string(
        "POINT (%d %d)", $"x" + 1 + $"c_custkey" % 3, $"y" + 1)))
      .withColumn("interp", lineInterpolatePoint($"line", $"f"))
    t.select($"c_custkey",
        lineLocatePoint($"line", $"probe").as("locate_frac"),
        stX($"interp").as("interp_x"),
        stY($"interp").as("interp_y"),
        lineInterpolatePoint($"line", lit(2.0)).isNull.as("oob_null"),
        lineLocatePoint($"probe", $"probe").isNull.as("kind_null"),
        round(greatCircleDistanceKm(
          lit(10.25), $"c_custkey" % 90, lit(40.5), $"c_custkey" % 120), 5).as("gc_km"))
      .orderBy($"c_custkey")
  }
  val qFnGeoLineSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey * 7 % 80) * 10 AS DOUBLE) AS x,
           CAST((c_custkey * 13 % 60) * 10 AS DOUBLE) AS y,
           CAST(c_custkey % 9 AS DOUBLE) / 8.0 AS f,
           CAST(1 + c_custkey % 3 AS DOUBLE) AS px_off,
           CAST(c_custkey % 90 AS DOUBLE) AS lon1,
           CAST(c_custkey % 120 AS DOUBLE) AS lon2
         FROM customer WHERE c_custkey <= 1000),
       g AS (
         SELECT *,
           radians(10.25) AS phi1, radians(40.5) AS phi2,
           radians(lon1) - radians(lon2) AS dl
         FROM t)
       SELECT c_custkey,
         -- probe (x+1+off, y+1) projects onto the first segment at x-offset
         -- 1+off of total length 8 (the vertical segment is farther away for
         -- off in 1..3: d2 >= (4-(1+off))^2+... > 1)
         px_off / 8.0 AS locate_frac,
         CASE WHEN f * 8.0 <= 4.0 THEN x + f * 8.0 ELSE x + 4.0 END AS interp_x,
         CASE WHEN f * 8.0 <= 4.0 THEN y ELSE y + (f * 8.0 - 4.0) END AS interp_y,
         TRUE AS oob_null,
         TRUE AS kind_null,
         round(atan2(sqrt(pow(cos(phi2) * sin(dl), 2)
                        + pow(cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dl), 2)),
                     sin(phi1) * sin(phi2) + cos(phi1) * cos(phi2) * cos(dl))
               * 6371.01, 5) AS gc_km
       FROM g ORDER BY c_custkey"""

  /** Part/ring decomposition (GeoFunctions.java ST_GeometryN /
    * ST_ExteriorRing / ST_InteriorRingN / ST_Envelope) over a holed polygon,
    * a two-part multipolygon, and a diagonal line's envelope — every output
    * an exact integer measure of the decomposed parts. */
  def q_fn_geo_parts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1000)
      .withColumn("x", (($"c_custkey" * 7 % 70) * 20).cast("long"))
      .withColumn("y", (($"c_custkey" * 13 % 50) * 20).cast("long"))
      .withColumn("holed", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d), (%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"x", $"y", $"x" + 8, $"y", $"x" + 8, $"y" + 8, $"x", $"y" + 8, $"x", $"y",
        $"x" + 2, $"y" + 2, $"x" + 2, $"y" + 4, $"x" + 4, $"y" + 4, $"x" + 4, $"y" + 2,
        $"x" + 2, $"y" + 2)))
      .withColumn("mp", stGeometryFromText(format_string(
        "MULTIPOLYGON (((%d %d, %d %d, %d %d, %d %d, %d %d)), ((%d %d, %d %d, %d %d, %d %d, %d %d)))",
        $"x", $"y", $"x" + 2, $"y", $"x" + 2, $"y" + 2, $"x", $"y" + 2, $"x", $"y",
        $"x" + 10, $"y", $"x" + 13, $"y", $"x" + 13, $"y" + 3, $"x" + 10, $"y" + 3,
        $"x" + 10, $"y")))
      .withColumn("diag", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d)", $"x", $"y" + 1, $"x" + 5, $"y" + 4)))
      // zig: two on-chord vertices around one 3-high bump — their distances
      // to the POST-SPLIT chords are 1.8 and 9/sqrt(34), so tolerance 2
      // drops both, 1 keeps both, 10 leaves only the endpoints
      .withColumn("zig", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 3, $"y", $"x" + 4, $"y" + 3, $"x" + 6, $"y", $"x" + 9, $"y")))
      .withColumn("flat", stGeometryFromText(format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d)",
        $"x", $"y", $"x" + 3, $"y", $"x" + 7, $"y", $"x" + 9, $"y")))
      // square ring with one collinear bottom midpoint (chord distance
      // sqrt(2) after the diagonal split): tolerance 1.5 removes exactly it
      .withColumn("ringsq", stGeometryFromText(format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d, %d %d))",
        $"x", $"y", $"x" + 2, $"y", $"x" + 4, $"y", $"x" + 4, $"y" + 4,
        $"x", $"y" + 4, $"x", $"y")))
    t.select($"c_custkey",
        stNumPoints(stExteriorRing($"holed")).as("ext_n"),
        stGeomLength(stExteriorRing($"holed")).as("ext_len"),
        stGeomLength(stInteriorRingN($"holed", lit(1))).as("hole_len"),
        stInteriorRingN($"holed", lit(2)).isNull.as("hole2_null"),
        stGeomArea(stGeometryN($"mp", lit(2))).as("g2_area"),
        stGeometryN($"mp", lit(3)).isNull.as("g3_null"),
        (stGeomArea(stGeometryN($"holed", lit(1))) === stGeomArea($"holed"))
          .as("self_at_1_ok"),
        stGeomArea(stEnvelope($"diag")).as("env_area"),
        stXMin(stEnvelope($"diag")).as("env_xmin"),
        stYMax(stEnvelope($"diag")).as("env_ymax"),
        stNumPoints(stSimplifyGeometry($"zig", lit(2.0))).as("s2_n"),
        stX(stPointN(stSimplifyGeometry($"zig", lit(2.0)), lit(2))).as("s2_mid_x"),
        stY(stPointN(stSimplifyGeometry($"zig", lit(2.0)), lit(2))).as("s2_mid_y"),
        stNumPoints(stSimplifyGeometry($"zig", lit(1.0))).as("s1_n"),
        stNumPoints(stSimplifyGeometry($"zig", lit(10.0))).as("s10_n"),
        stNumPoints(stSimplifyGeometry($"flat", lit(0.0))).as("flat_n"),
        stNumPoints(stSimplifyGeometry($"ringsq", lit(1.5))).as("ring_n"),
        stGeomArea(stSimplifyGeometry($"ringsq", lit(1.5))).as("ring_area"),
        stSimplifyGeometry($"zig", lit(-1.0)).isNull.as("simplify_neg_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoPartsSql: String =
    """SELECT c_custkey,
         5 AS ext_n,
         32.0 AS ext_len,
         8.0 AS hole_len,
         TRUE AS hole2_null,
         9.0 AS g2_area,
         TRUE AS g3_null,
         TRUE AS self_at_1_ok,
         15.0 AS env_area,
         CAST((c_custkey * 7 % 70) * 20 AS DOUBLE) AS env_xmin,
         CAST((c_custkey * 13 % 50) * 20 + 4 AS DOUBLE) AS env_ymax,
         3 AS s2_n,
         CAST((c_custkey * 7 % 70) * 20 + 4 AS DOUBLE) AS s2_mid_x,
         CAST((c_custkey * 13 % 50) * 20 + 3 AS DOUBLE) AS s2_mid_y,
         5 AS s1_n,
         2 AS s10_n,
         2 AS flat_n,
         5 AS ring_n,
         16.0 AS ring_area,
         TRUE AS simplify_neg_null
       FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_fn_geo_spherical" -> q_fn_geo_spherical _,
    "q_fn_geo_line" -> q_fn_geo_line _,
    "q_fn_geo_parts" -> q_fn_geo_parts _,
    "q_fn_geo_distance" -> q_fn_geo_distance _,
    "q_fn_geo_buffer" -> q_fn_geo_buffer _,
    "q_fn_geo_buffer_concave" -> q_fn_geo_buffer_concave _,
    "q_fn_geo_union" -> q_fn_geo_union _,
    "q_fn_geo_difference" -> q_fn_geo_difference _,
    "q_fn_geo_wkb" -> q_fn_geo_wkb _,
    "q_fn_geo_relations" -> q_fn_geo_relations _,
    "q_fn_geo_accessors" -> q_fn_geo_accessors _,
    "q_geo_union_agg" -> q_geo_union_agg _,
    "q_geo_collect_agg" -> q_geo_collect_agg _)

  val oracles: Map[String, String] = Map(
    "q_fn_geo_spherical" -> qFnGeoSphericalSql,
    "q_fn_geo_line" -> qFnGeoLineSql,
    "q_fn_geo_parts" -> qFnGeoPartsSql,
    "q_fn_geo_distance" -> qFnGeoDistanceSql,
    "q_fn_geo_buffer" -> qFnGeoBufferSql,
    "q_fn_geo_buffer_concave" -> qFnGeoBufferConcaveSql,
    "q_fn_geo_union" -> qFnGeoUnionSql,
    "q_fn_geo_difference" -> qFnGeoDifferenceSql,
    "q_fn_geo_wkb" -> qFnGeoWkbSql,
    "q_fn_geo_relations" -> qFnGeoRelationsSql,
    "q_fn_geo_accessors" -> qFnGeoAccessorsSql,
    "q_geo_union_agg" -> qGeoUnionAggSql,
    "q_geo_collect_agg" -> qGeoCollectAggSql)
}
