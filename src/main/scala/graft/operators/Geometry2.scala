package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry breadth step 3 oracle queries (SURVEY.md §2.8; reference
  * plugin/trino-geospatial GeoFunctions.java — constructors ST_MakeLine:316 /
  * ST_MakePolygon:351 / ST_Collect:307, canonical forms ST_Normalize:1425 /
  * ST_ReducePrecision:1436, ST_IsSimple:851, ST_PointOnSurface:1569,
  * ST_OrientedEnvelope:1612, ST_MinimumBoundingCircle:1622,
  * ST_Polygonize:1632, geometry_nearest_points:1708, ST_LineMerge:1766,
  * EncodedPolylineFunctions.java, and the SRID/EWKT family).
  *
  * Fixture discipline (as Geometry.scala): integer-valued coordinates,
  * corner-to-corner nearest features, proper crossings only — every emitted
  * number is an exact dyadic closed form the oracle states independently, and
  * every approximate output (the 32-gon bounding circle) is emitted as a
  * toleranced BOOLEAN, never a raw float. All calls go through the REGISTERED
  * SQL names (selectExpr), exercising the same path a SQL front-door user
  * hits. */
object Geometry2 {

  /** Constructors, combiners, converters, SRID family. */
  def q_fn_geo_construct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1200)
      .withColumn("a", ($"c_custkey" % 5).cast("long"))
      .withColumn("b", ($"c_custkey" % 7).cast("long"))
      .withColumn("e", ($"c_custkey" % 3 + 1).cast("long"))
      // closed square shell (side e+2) and a unit hole at (a+1, b+1)
      .withColumn("shell_wkt", format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)",
        $"a", $"b", $"a" + $"e" + 2, $"b", $"a" + $"e" + 2, $"b" + $"e" + 2,
        $"a", $"b" + $"e" + 2, $"a", $"b"))
      .withColumn("hole_wkt", format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)",
        $"a" + 1, $"b" + 1, $"a" + 2, $"b" + 1, $"a" + 2, $"b" + 2,
        $"a" + 1, $"b" + 2, $"a" + 1, $"b" + 1))
    t.selectExpr("c_custkey",
        "st_length(st_makeline(st_point(a, b), st_point(a + e, b + 2 * e))) AS ml_len",
        "st_numpoints(st_makeline(array(st_point(a, b), st_point(a + e, b + 2 * e), st_point(a + 2, b)))) AS ml3_n",
        "st_geometrytype(st_collect(st_point(a, b), st_point(a + e, b))) AS collect_type",
        "st_numgeometries(st_collect(st_point(a, b), st_point(a + e, b))) AS collect_n",
        "st_geometrytype(st_collect(st_point(a, b), st_makeline(st_point(a, b), st_point(a + e, b)))) = 'ST_GeomCollection' AS collect_mixed_gc",
        "st_area(st_makepolygon(st_linefromtext(shell_wkt))) AS poly_area",
        "st_area(st_makepolygon(st_linefromtext(shell_wkt), array(st_linefromtext(hole_wkt)))) AS holed_area",
        "st_geometrytype(st_multi(st_makepolygon(st_linefromtext(shell_wkt)))) AS multi_type",
        "st_numgeometries(st_multi(st_makepolygon(st_linefromtext(shell_wkt)))) AS multi_n",
        "size(st_geometries(st_collect(st_point(a, b), st_point(a + e, b)))) AS geoms_n",
        "st_astext(element_at(st_geometries(st_collect(st_point(a, b), st_point(a + e, b))), 1)) AS first_geom_wkt",
        "size(st_interiorrings(st_makepolygon(st_linefromtext(shell_wkt), array(st_linefromtext(hole_wkt))))) AS interior_n",
        "st_numpoints(element_at(st_interiorrings(st_makepolygon(st_linefromtext(shell_wkt), array(st_linefromtext(hole_wkt)))), 1)) AS interior_pts",
        "st_astext(element_at(st_envelopeaspts(st_makepolygon(st_linefromtext(shell_wkt))), 2)) AS env_max_wkt",
        "st_linefromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))') IS NULL AS linefromtext_bad_null",
        "st_srid(st_point(a, b)) AS srid",
        "st_astext(st_setsrid(st_point(a, b), 0)) = st_astext(st_point(a, b)) AS setsrid_identity",
        "st_setsrid(st_point(a, b), 4326) IS NULL AS setsrid_other_null",
        "st_asewkt(st_makepolygon(st_linefromtext(shell_wkt))) = st_astext(st_makepolygon(st_linefromtext(shell_wkt))) AS ewkt_eq",
        "st_astext(st_geomfromewkt(concat('SRID=4326;POINT (', a, ' ', b, ')'))) AS ewkt_parse_wkt",
        "st_z(st_point(a, b)) IS NULL AS z_null",
        "st_asewkb(st_point(a, b)) = st_asbinary(st_point(a, b)) AS ewkb_eq",
        "st_astext(st_force2d(st_point(a, b))) = st_astext(st_point(a, b)) AS force2d_identity",
        "st_astext(st_geomfromkml(concat('<Point><coordinates>', a, ',', b, '</coordinates></Point>'))) AS kml_pt_wkt",
        "st_length(st_geomfromkml(concat('<LineString><coordinates>', a, ',', b, ' ', a + e, ',', b, '</coordinates></LineString>'))) AS kml_line_len")
      .orderBy($"c_custkey")
  }
  val qFnGeoConstructSql: String =
    """SELECT c_custkey,
         sqrt(CAST(5 * e * e AS DOUBLE)) AS ml_len,
         3 AS ml3_n,
         'ST_MultiPoint' AS collect_type,
         2 AS collect_n,
         TRUE AS collect_mixed_gc,
         CAST((e + 2) * (e + 2) AS DOUBLE) AS poly_area,
         CAST((e + 2) * (e + 2) - 1 AS DOUBLE) AS holed_area,
         'ST_MultiPolygon' AS multi_type,
         1 AS multi_n,
         2 AS geoms_n,
         'POINT (' || CAST(CAST(a AS DOUBLE) AS VARCHAR) || ' '
                   || CAST(CAST(b AS DOUBLE) AS VARCHAR) || ')' AS first_geom_wkt,
         1 AS interior_n,
         5 AS interior_pts,
         'POINT (' || CAST(CAST(a + e + 2 AS DOUBLE) AS VARCHAR) || ' '
                   || CAST(CAST(b + e + 2 AS DOUBLE) AS VARCHAR) || ')' AS env_max_wkt,
         TRUE AS linefromtext_bad_null,
         0 AS srid,
         TRUE AS setsrid_identity,
         TRUE AS setsrid_other_null,
         TRUE AS ewkt_eq,
         'POINT (' || CAST(CAST(a AS DOUBLE) AS VARCHAR) || ' '
                   || CAST(CAST(b AS DOUBLE) AS VARCHAR) || ')' AS ewkt_parse_wkt,
         TRUE AS z_null,
         TRUE AS ewkb_eq,
         TRUE AS force2d_identity,
         'POINT (' || CAST(CAST(a AS DOUBLE) AS VARCHAR) || ' '
                   || CAST(CAST(b AS DOUBLE) AS VARCHAR) || ')' AS kml_pt_wkt,
         CAST(e AS DOUBLE) AS kml_line_len
       FROM (SELECT c_custkey, c_custkey % 5 AS a, c_custkey % 7 AS b,
                    c_custkey % 3 + 1 AS e
             FROM customer WHERE c_custkey <= 1200)
       ORDER BY c_custkey"""

  /** Canonical forms, simplicity, interior points, merges, polyline codec. */
  def q_fn_geo_canonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1200)
      .withColumn("a", ($"c_custkey" % 5).cast("long"))
      .withColumn("b", ($"c_custkey" % 7).cast("long"))
      .withColumn("e", ($"c_custkey" % 3 + 1).cast("long"))
      // CCW square ring starting at a NON-minimal vertex: normalize must
      // rotate to (a b) and flip to clockwise (the JTS normal form)
      .withColumn("denorm_wkt", format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        $"a" + $"e", $"b", $"a" + $"e", $"b" + $"e", $"a", $"b" + $"e",
        $"a", $"b", $"a" + $"e", $"b"))
      // bowtie: segment pair crossing at the middle
      .withColumn("bowtie_wkt", format_string(
        "LINESTRING (%d %d, %d %d, %d %d, %d %d)",
        $"a", $"b", $"a" + 2, $"b" + 2, $"a" + 2, $"b", $"a", $"b" + 2))
      // holed polygon whose hole straddles the horizontal bisector
      .withColumn("pos2_wkt", format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d), " +
          "(%s %s, %s %s, %s %s, %s %s, %s %s))",
        $"a", $"b", $"a" + 4, $"b", $"a" + 4, $"b" + 2, $"a", $"b" + 2, $"a", $"b",
        ($"a" + 1).cast("string"), ($"b" + lit(0.5)).cast("string"),
        ($"a" + 3).cast("string"), ($"b" + lit(0.5)).cast("string"),
        ($"a" + 3).cast("string"), ($"b" + lit(1.5)).cast("string"),
        ($"a" + 1).cast("string"), ($"b" + lit(1.5)).cast("string"),
        ($"a" + 1).cast("string"), ($"b" + lit(0.5)).cast("string")))
    t.selectExpr("c_custkey",
        "st_astext(st_normalize(st_geometryfromtext(denorm_wkt))) AS norm_poly_wkt",
        "st_astext(st_normalize(st_makeline(st_point(a + e, b + e), st_point(a, b)))) AS norm_line_wkt",
        "st_astext(st_normalize(st_collect(st_point(a + e, b), st_point(a, b)))) AS norm_mp_wkt",
        "st_astext(st_reduceprecision(st_point(a + 0.26D, b + 0.74D), 0.5D)) AS rp_wkt",
        "st_reduceprecision(st_geometryfromtext(concat('POLYGON ((', a, ' ', b, ', ', a, '.2 ', b, ', ', a, '.2 ', b, '.2, ', a, ' ', b, '.2, ', a, ' ', b, '))')), 1.0D) IS NULL AS rp_collapse_null",
        "st_issimple(st_makeline(st_point(a, b), st_point(a + e, b + e))) AS simple_line",
        "st_issimple(st_geometryfromtext(bowtie_wkt)) AS simple_bowtie",
        "st_issimple(st_collect(st_point(a, b), st_point(a, b))) AS simple_mp_dup",
        "st_x(st_pointonsurface(st_geometryfromtext(denorm_wkt))) AS pos_x",
        "st_y(st_pointonsurface(st_geometryfromtext(denorm_wkt))) AS pos_y",
        "st_x(st_pointonsurface(st_geometryfromtext(pos2_wkt))) AS pos2_x",
        "st_y(st_pointonsurface(st_geometryfromtext(pos2_wkt))) AS pos2_y",
        "st_geometrytype(st_linemerge(st_collect(st_makeline(st_point(a, b), st_point(a + e, b)), st_makeline(st_point(a + e, b), st_point(a + e, b + e))))) AS lm_type",
        "st_numpoints(st_linemerge(st_collect(st_makeline(st_point(a, b), st_point(a + e, b)), st_makeline(st_point(a + e, b), st_point(a + e, b + e))))) AS lm_n",
        "st_length(st_linemerge(st_collect(st_makeline(st_point(a, b), st_point(a + e, b)), st_makeline(st_point(a + e, b), st_point(a + e, b + e))))) AS lm_len",
        "st_geometrytype(st_linemerge(st_collect(st_makeline(st_point(a, b), st_point(a + e, b)), st_makeline(st_point(a, b + 9), st_point(a + e, b + 9))))) AS lm_disjoint_type",
        "size(line_interpolate_points(st_makeline(st_point(a, b), st_point(a + 2 * e, b)), 0.25D)) AS lip_n",
        "st_x(element_at(line_interpolate_points(st_makeline(st_point(a, b), st_point(a + 2 * e, b)), 0.25D), 2)) AS lip2_x",
        "st_astext(from_encoded_polyline(to_encoded_polyline(st_makeline(st_point(a, b), st_point(a + e, b + 2 * e))))) = st_astext(st_makeline(st_point(a, b), st_point(a + e, b + 2 * e))) AS polyline_roundtrip",
        "st_numpoints(from_encoded_polyline('_p~iF~ps|U_ulLnnqC_mqNvxq`@')) AS polyline_n",
        "abs(st_y(st_startpoint(from_encoded_polyline('_p~iF~ps|U_ulLnnqC_mqNvxq`@'))) - 38.5D) < 1e-12 AS polyline_lat_ok")
      .orderBy($"c_custkey")
  }
  val qFnGeoCanonicalSql: String =
    """WITH base AS (
         SELECT c_custkey, c_custkey % 5 AS a, c_custkey % 7 AS b,
                c_custkey % 3 + 1 AS e
         FROM customer WHERE c_custkey <= 1200),
       strs AS (
         SELECT *,
           CAST(CAST(a AS DOUBLE) AS VARCHAR) AS sa,
           CAST(CAST(b AS DOUBLE) AS VARCHAR) AS sb,
           CAST(CAST(a + e AS DOUBLE) AS VARCHAR) AS sae,
           CAST(CAST(b + e AS DOUBLE) AS VARCHAR) AS sbe,
           CAST(CAST(a AS DOUBLE) + 0.5 AS VARCHAR) AS sah,
           CAST(CAST(b AS DOUBLE) + 0.5 AS VARCHAR) AS sbh
         FROM base)
       SELECT c_custkey,
         'POLYGON ((' || sa || ' ' || sb || ', ' || sa || ' ' || sbe || ', '
                      || sae || ' ' || sbe || ', ' || sae || ' ' || sb || ', '
                      || sa || ' ' || sb || '))' AS norm_poly_wkt,
         'LINESTRING (' || sa || ' ' || sb || ', '
                        || sae || ' ' || sbe || ')' AS norm_line_wkt,
         'MULTIPOINT (' || sa || ' ' || sb || ', '
                        || sae || ' ' || sb || ')' AS norm_mp_wkt,
         'POINT (' || sah || ' ' || sbh || ')' AS rp_wkt,
         TRUE AS rp_collapse_null,
         TRUE AS simple_line,
         FALSE AS simple_bowtie,
         FALSE AS simple_mp_dup,
         CAST(2 * a + e AS DOUBLE) / 2.0 AS pos_x,
         CAST(b AS DOUBLE) + CAST(e AS DOUBLE) / 2.0 AS pos_y,
         CAST(a AS DOUBLE) + 0.5 AS pos2_x,
         CAST(b AS DOUBLE) + 1.0 AS pos2_y,
         'ST_LineString' AS lm_type,
         3 AS lm_n,
         CAST(2 * e AS DOUBLE) AS lm_len,
         'ST_MultiLineString' AS lm_disjoint_type,
         4 AS lip_n,
         CAST(a + e AS DOUBLE) AS lip2_x,
         TRUE AS polyline_roundtrip,
         3 AS polyline_n,
         TRUE AS polyline_lat_ok
       FROM strs ORDER BY c_custkey"""

  /** Hulls, bounding circle, nearest points, polygonize. */
  def q_fn_geo_hulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1200)
      .withColumn("a", ($"c_custkey" % 5).cast("long"))
      .withColumn("b", ($"c_custkey" % 7).cast("long"))
      .withColumn("e", ($"c_custkey" % 3 + 1).cast("long"))
      .withColumn("u", ($"c_custkey" % 4 + 1).cast("long"))
      .withColumn("v", ($"c_custkey" % 2 + 1).cast("long"))
      // rectangle point cloud (jittered order, one interior point)
      .withColumn("rect_pts",
        expr("st_collect(array(st_point(a + 2 * e, b + e), st_point(a, b), " +
          "st_point(a + e, b + 1), st_point(a + 2 * e, b), st_point(a, b + e)))"))
      // diamond point set: min-area rectangle is the 45°-rotated square
      .withColumn("diamond_pts",
        expr("st_collect(array(st_point(a + e, b), st_point(a + 2 * e, b + e), " +
          "st_point(a + e, b + 2 * e), st_point(a, b + e)))"))
      // diametral set: farthest pair (a b)—(a+2e b), third point inside
      .withColumn("mbc_pts",
        expr("st_collect(array(st_point(a, b), st_point(a + 2 * e, b), st_point(a + e, b + 1)))"))
      .withColumn("sq1", expr("st_makepolygon(st_linefromtext(concat(" +
        "'LINESTRING (', a, ' ', b, ', ', a + e, ' ', b, ', ', a + e, ' ', b + e, " +
        "', ', a, ' ', b + e, ', ', a, ' ', b, ')')))"))
      .withColumn("sq2", expr("st_makepolygon(st_linefromtext(concat(" +
        "'LINESTRING (', a + e + u, ' ', b + e + v, ', ', a + 2 * e + u, ' ', b + e + v, " +
        "', ', a + 2 * e + u, ' ', b + 2 * e + v, ', ', a + e + u, ' ', b + 2 * e + v, " +
        "', ', a + e + u, ' ', b + e + v, ')')))"))
      // overlapping unit-offset squares for the crossing case
      .withColumn("ov1", expr("st_makepolygon(st_linefromtext(concat(" +
        "'LINESTRING (', a, ' ', b, ', ', a + 2, ' ', b, ', ', a + 2, ' ', b + 2, " +
        "', ', a, ' ', b + 2, ', ', a, ' ', b, ')')))"))
      .withColumn("ov2", expr("st_makepolygon(st_linefromtext(concat(" +
        "'LINESTRING (', a + 1, ' ', b + 1, ', ', a + 3, ' ', b + 1, ', ', a + 3, ' ', b + 3, " +
        "', ', a + 1, ' ', b + 3, ', ', a + 1, ' ', b + 1, ')')))"))
      .withColumn("shell_line", expr("st_linefromtext(concat(" +
        "'LINESTRING (', a, ' ', b, ', ', a + e + 2, ' ', b, ', ', a + e + 2, ' ', b + e + 2, " +
        "', ', a, ' ', b + e + 2, ', ', a, ' ', b, ')'))"))
      .withColumn("hole_line", expr("st_linefromtext(concat(" +
        "'LINESTRING (', a + 1, ' ', b + 1, ', ', a + 2, ' ', b + 1, ', ', a + 2, ' ', b + 2, " +
        "', ', a + 1, ' ', b + 2, ', ', a + 1, ' ', b + 1, ')'))"))
    t.selectExpr("c_custkey",
        "st_area(st_orientedenvelope(rect_pts)) AS oe_rect_area",
        "st_numpoints(st_orientedenvelope(rect_pts)) AS oe_rect_n",
        "st_xmin(st_orientedenvelope(rect_pts)) AS oe_rect_xmin",
        "st_xmax(st_orientedenvelope(rect_pts)) AS oe_rect_xmax",
        "st_area(st_orientedenvelope(diamond_pts)) AS oe_diamond_area",
        "st_numpoints(st_minimumboundingcircle(mbc_pts)) AS mbc_n",
        "abs(st_xmax(st_minimumboundingcircle(mbc_pts)) - (a + 2 * e)) < 1e-9 AS mbc_xmax_ok",
        "abs(st_xmin(st_minimumboundingcircle(mbc_pts)) - a) < 1e-9 AS mbc_xmin_ok",
        "abs(st_ymax(st_minimumboundingcircle(mbc_pts)) - (b + e)) < 1e-9 AS mbc_ymax_ok",
        "abs(st_ymin(st_minimumboundingcircle(mbc_pts)) - (b - e)) < 1e-9 AS mbc_ymin_ok",
        "st_astext(st_minimumboundingcircle(st_point(a, b))) AS mbc_pt_wkt",
        "st_x(geometry_nearest_points(sq1, sq2).p1) AS np1_x",
        "st_y(geometry_nearest_points(sq1, sq2).p1) AS np1_y",
        "st_x(geometry_nearest_points(sq1, sq2).p2) AS np2_x",
        "st_y(geometry_nearest_points(sq1, sq2).p2) AS np2_y",
        "st_x(geometry_nearest_points(ov1, ov2).p1) AS npx_x",
        "st_y(geometry_nearest_points(ov1, ov2).p1) AS npx_y",
        "st_x(geometry_nearest_points(ov1, ov2).p1) = st_x(geometry_nearest_points(ov1, ov2).p2) AS npx_same",
        "st_area(st_polygonize(array(shell_line, hole_line))) AS pg_area",
        "st_geometrytype(st_polygonize(array(shell_line, hole_line))) AS pg_type")
      .orderBy($"c_custkey")
  }
  val qFnGeoHullsSql: String =
    """SELECT c_custkey,
         CAST(2 * e * e AS DOUBLE) AS oe_rect_area,
         5 AS oe_rect_n,
         CAST(a AS DOUBLE) AS oe_rect_xmin,
         CAST(a + 2 * e AS DOUBLE) AS oe_rect_xmax,
         CAST(2 * e * e AS DOUBLE) AS oe_diamond_area,
         33 AS mbc_n,
         TRUE AS mbc_xmax_ok,
         TRUE AS mbc_xmin_ok,
         TRUE AS mbc_ymax_ok,
         TRUE AS mbc_ymin_ok,
         'POINT (' || CAST(CAST(a AS DOUBLE) AS VARCHAR) || ' '
                   || CAST(CAST(b AS DOUBLE) AS VARCHAR) || ')' AS mbc_pt_wkt,
         CAST(a + e AS DOUBLE) AS np1_x,
         CAST(b + e AS DOUBLE) AS np1_y,
         CAST(a + e + u AS DOUBLE) AS np2_x,
         CAST(b + e + v AS DOUBLE) AS np2_y,
         CAST(a + 2 AS DOUBLE) AS npx_x,
         CAST(b + 1 AS DOUBLE) AS npx_y,
         TRUE AS npx_same,
         CAST((e + 2) * (e + 2) - 1 AS DOUBLE) AS pg_area,
         'ST_Polygon' AS pg_type
       FROM (SELECT c_custkey, c_custkey % 5 AS a, c_custkey % 7 AS b,
                    c_custkey % 3 + 1 AS e, c_custkey % 4 + 1 AS u,
                    c_custkey % 2 + 1 AS v
             FROM customer WHERE c_custkey <= 1200)
       ORDER BY c_custkey"""

  /** ST_Relate DE-9IM patterns over every supported operand class, plus
    * ST_VoronoiPolygons with closed-form cell areas (4-grid → unit cells,
    * 4-grid + center → 0.5 corner triangles and a 2.0 diamond). */
  def q_fn_geo_relate_voronoi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1200)
      .withColumn("a", ($"c_custkey" % 5).cast("long"))
      .withColumn("b", ($"c_custkey" % 7).cast("long"))
    def sq(x0: String, y0: String, x1: String, y1: String): String =
      s"st_geometryfromtext(concat('POLYGON ((', $x0, ' ', $y0, ', ', $x1, ' ', $y0, " +
        s"', ', $x1, ' ', $y1, ', ', $x0, ' ', $y1, ', ', $x0, ' ', $y0, '))'))"
    val sq1 = sq("a", "b", "a + 2", "b + 2")
    val sqFar = sq("a + 5", "b + 5", "a + 6", "b + 6")
    val sqOv = sq("a + 1", "b + 1", "a + 3", "b + 3")
    val sqIn = sq("concat(a, '.5')", "concat(b, '.5')", "a + 1 || '.5'", "b + 1 || '.5'")
    val sqTouch = sq("a + 2", "b + 2", "a + 3", "b + 3")
    val grid4 = "st_collect(array(st_point(a, b), st_point(a + 2, b), " +
      "st_point(a, b + 2), st_point(a + 2, b + 2)))"
    val grid5 = "st_collect(array(st_point(a, b), st_point(a + 2, b), " +
      "st_point(a, b + 2), st_point(a + 2, b + 2), st_point(a + 1, b + 1)))"
    t.selectExpr(Seq("c_custkey",
        s"st_relate($sq1, $sqFar, 'FF2FF1212') AS rel_disjoint",
        s"st_relate($sq1, $sqOv, '212101212') AS rel_overlap",
        s"st_relate($sq1, $sqOv, 'T********') AS rel_intersects_pat",
        s"st_relate($sqIn, $sq1, '2FF1FF212') AS rel_within",
        s"st_relate($sq1, $sqIn, 'T*****FF*') AS rel_contains_pat",
        s"st_relate($sq1, $sq1, '2FFF1FFF2') AS rel_equals",
        s"st_relate($sq1, $sqTouch, 'FF2F01212') AS rel_touches",
        s"st_relate(st_point(a + 1, b + 1), $sq1, '0FFFFF212') AS rel_pt_in",
        s"st_relate(st_point(a + 9, b), $sq1, 'FF0FFF212') AS rel_pt_out",
        "st_relate(st_point(a, b), st_point(a, b), '0FFFFFFF2') AS rel_pt_eq",
        "st_relate(st_point(a, b), st_point(a + 1, b), 'FF0FFF0F2') AS rel_pt_ne",
        s"st_numgeometries(st_voronoipolygons($grid4)) AS v4_n",
        s"st_area(st_geometryn(st_voronoipolygons($grid4), 1)) AS v4_cell1",
        s"st_area(st_geometryn(st_voronoipolygons($grid4), 4)) AS v4_cell4",
        s"st_area(st_voronoipolygons($grid4)) AS v4_total",
        s"st_numgeometries(st_voronoipolygons($grid5)) AS v5_n",
        s"st_area(st_geometryn(st_voronoipolygons($grid5), 1)) AS v5_corner",
        s"st_area(st_geometryn(st_voronoipolygons($grid5), 5)) AS v5_center",
        s"st_area(st_voronoipolygons($grid5)) AS v5_total"): _*)
      .orderBy($"c_custkey")
  }
  val qFnGeoRelateVoronoiSql: String =
    """SELECT c_custkey,
         TRUE AS rel_disjoint,
         TRUE AS rel_overlap,
         TRUE AS rel_intersects_pat,
         TRUE AS rel_within,
         TRUE AS rel_contains_pat,
         TRUE AS rel_equals,
         TRUE AS rel_touches,
         TRUE AS rel_pt_in,
         TRUE AS rel_pt_out,
         TRUE AS rel_pt_eq,
         TRUE AS rel_pt_ne,
         4 AS v4_n,
         1.0 AS v4_cell1,
         1.0 AS v4_cell4,
         4.0 AS v4_total,
         5 AS v5_n,
         0.5 AS v5_corner,
         2.0 AS v5_center,
         4.0 AS v5_total
       FROM customer WHERE c_custkey <= 1200 ORDER BY c_custkey"""

  /** GEOMETRYCOLLECTION: mixed-type ST_Collect, WKT + WKB roundtrips,
    * member extraction, dimension = max member, area = polygon members. */
  def q_fn_geo_collection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 1200)
      .withColumn("a", ($"c_custkey" % 5).cast("long"))
      .withColumn("b", ($"c_custkey" % 7).cast("long"))
      .withColumn("e", ($"c_custkey" % 3 + 1).cast("long"))
    val gc = "st_collect(st_point(a, b), st_makeline(st_point(a, b), st_point(a + e, b)))"
    val gc2 = "st_collect(array(st_point(a + 9, b), st_makepolygon(st_linefromtext(" +
      "concat('LINESTRING (', a, ' ', b, ', ', a + e, ' ', b, ', ', a + e, ' ', b + e, " +
      "', ', a, ' ', b + e, ', ', a, ' ', b, ')')))))"
    t.selectExpr("c_custkey",
        s"st_geometrytype($gc) AS gc_type",
        s"st_numgeometries($gc) AS gc_n",
        s"st_astext($gc) AS gc_wkt",
        s"st_astext(st_geometryfromtext(st_astext($gc))) = st_astext($gc) AS gc_wkt_roundtrip",
        s"st_astext(st_geomfrombinary(st_asbinary($gc))) = st_astext($gc) AS gc_wkb_roundtrip",
        s"st_astext(st_geometryn($gc, 2)) AS gc_member2_wkt",
        s"size(st_geometries($gc)) AS gc_parts",
        s"st_dimension($gc2) AS gc2_dim",
        s"st_area($gc2) AS gc2_area",
        s"st_xmax($gc2) AS gc2_xmax",
        // NESTED collection with a MULTI member: parse → accessors → both
        // codec roundtrips (the WKT below matches this engine's own
        // formatting so roundtrip equality is exact string equality)
        s"concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', " +
          "CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), " +
          "'))') AS ngc_in",
        s"st_numgeometries(st_geometryfromtext(concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))'))) AS ngc_n",
        s"st_astext(st_geometryn(st_geometryfromtext(concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))')), 1)) AS ngc_first",
        s"st_astext(st_geometryfromtext(concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))'))) = concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))') AS ngc_wkt_roundtrip",
        s"st_astext(st_geomfrombinary(st_asbinary(st_geometryfromtext(concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))'))))) = concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))') AS ngc_wkb_roundtrip",
        s"st_dimension(st_geometryfromtext(concat('GEOMETRYCOLLECTION (', st_astext($gc), ', MULTIPOINT (', CAST(CAST(b AS DOUBLE) AS STRING), ' ', CAST(CAST(a AS DOUBLE) AS STRING), '))'))) AS ngc_dim")
      .orderBy($"c_custkey")
  }
  val qFnGeoCollectionSql: String =
    """WITH b0 AS (
         SELECT c_custkey, c_custkey % 5 AS a, c_custkey % 7 AS b,
                c_custkey % 3 + 1 AS e
         FROM customer WHERE c_custkey <= 1200),
       strs AS (
         SELECT *,
           CAST(CAST(a AS DOUBLE) AS VARCHAR) AS sa,
           CAST(CAST(b AS DOUBLE) AS VARCHAR) AS sb,
           CAST(CAST(a + e AS DOUBLE) AS VARCHAR) AS sae
         FROM b0)
       SELECT c_custkey,
         'ST_GeomCollection' AS gc_type,
         2 AS gc_n,
         'GEOMETRYCOLLECTION (POINT (' || sa || ' ' || sb || '), LINESTRING ('
           || sa || ' ' || sb || ', ' || sae || ' ' || sb || '))' AS gc_wkt,
         TRUE AS gc_wkt_roundtrip,
         TRUE AS gc_wkb_roundtrip,
         'LINESTRING (' || sa || ' ' || sb || ', ' || sae || ' ' || sb || ')'
           AS gc_member2_wkt,
         2 AS gc_parts,
         2 AS gc2_dim,
         CAST(e * e AS DOUBLE) AS gc2_area,
         CAST(a + 9 AS DOUBLE) AS gc2_xmax,
         'GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (' || sa || ' ' || sb
           || '), LINESTRING (' || sa || ' ' || sb || ', ' || sae || ' ' || sb
           || ')), MULTIPOINT (' || sb || ' ' || sa || '))' AS ngc_in,
         2 AS ngc_n,
         'GEOMETRYCOLLECTION (POINT (' || sa || ' ' || sb || '), LINESTRING ('
           || sa || ' ' || sb || ', ' || sae || ' ' || sb || '))' AS ngc_first,
         TRUE AS ngc_wkt_roundtrip,
         TRUE AS ngc_wkb_roundtrip,
         1 AS ngc_dim
       FROM strs ORDER BY c_custkey"""

  /** ST_Transform through the embedded EPSG subset (graft.ext.Epsg —
    * lib/trino-geospatial's EPSG registry role). Web-Mercator forward is
    * replayed closed-form in the oracle (published formulas are plain
    * SQL); the UTM Krüger series is oracle-checked by invariants: exact
    * round-trip within series truncation, easting in the zone's band,
    * and the loud-NULL contract for an unlisted SRID. */
  def q_fn_geo_transform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val t = table(s, dir, "customer").filter($"c_custkey" <= 800)
      .withColumn("lat", (($"c_custkey" * 7 % 160) - 80 + lit(0.25)).cast("double"))
      .withColumn("lon", (($"c_custkey" * 13 % 300) - 150 + lit(0.25)).cast("double"))
      .withColumn("p", expr("st_point(lon, lat)"))
      .withColumn("m", expr("st_transform(p, 4326, 3857)"))
      .withColumn("back", expr("st_transform(m, 3857, 4326)"))
      .withColumn("zone", (floor(($"lon" + 180) / 6) + 1).cast("int"))
      .withColumn("srid",
        when($"lat" >= 0, $"zone" + 32600).otherwise($"zone" + 32700))
      .withColumn("u", expr("st_transform(p, 4326, srid)"))
      .withColumn("uback", expr("st_transform(u, srid, 4326)"))
    t.select($"c_custkey",
        round(expr("st_x(m)"), 4).as("merc_x"),
        round(expr("st_y(m)"), 4).as("merc_y"),
        (abs(expr("st_x(back)") - $"lon") < 1e-9 &&
          abs(expr("st_y(back)") - $"lat") < 1e-9).as("merc_roundtrip_ok"),
        (abs(expr("st_x(uback)") - $"lon") < 1e-7 &&
          abs(expr("st_y(uback)") - $"lat") < 1e-7).as("utm_roundtrip_ok"),
        (expr("st_x(u)") > 100000.0 && expr("st_x(u)") < 900000.0)
          .as("utm_easting_in_band"),
        expr("st_transform(p, 4326, 999)").isNull.as("unlisted_srid_null"))
      .orderBy($"c_custkey")
  }
  val qFnGeoTransformSql: String =
    """WITH t AS (
         SELECT c_custkey,
           CAST((c_custkey * 7 % 160) - 80 + 0.25 AS DOUBLE) AS lat,
           CAST((c_custkey * 13 % 300) - 150 + 0.25 AS DOUBLE) AS lon
         FROM customer WHERE c_custkey <= 800)
       SELECT c_custkey,
         round(6378137.0 * radians(lon), 4) AS merc_x,
         round(6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)), 4) AS merc_y,
         TRUE AS merc_roundtrip_ok,
         TRUE AS utm_roundtrip_ok,
         TRUE AS utm_easting_in_band,
         TRUE AS unlisted_srid_null
       FROM t ORDER BY c_custkey"""

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q_fn_geo_construct" -> q_fn_geo_construct _,
    "q_fn_geo_canonical" -> q_fn_geo_canonical _,
    "q_fn_geo_hulls" -> q_fn_geo_hulls _,
    "q_fn_geo_relate_voronoi" -> q_fn_geo_relate_voronoi _,
    "q_fn_geo_collection" -> q_fn_geo_collection _,
    "q_fn_geo_transform" -> q_fn_geo_transform _)
  val oracles: Map[String, String] = Map(
    "q_fn_geo_construct" -> qFnGeoConstructSql,
    "q_fn_geo_canonical" -> qFnGeoCanonicalSql,
    "q_fn_geo_hulls" -> qFnGeoHullsSql,
    "q_fn_geo_relate_voronoi" -> qFnGeoRelateVoronoiSql,
    "q_fn_geo_collection" -> qFnGeoCollectionSql,
    "q_fn_geo_transform" -> qFnGeoTransformSql)
}
