package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial-lite bundle (SURVEY.md §2.8 optional row; reference:
  * plugin/trino-geospatial/src/main/java/io/trino/plugin/geospatial/
  * GeoFunctions.java:123 — the ST_* library over geometries).
  *
  * This is the scalar subset a points-only workload needs — point-in-bbox
  * containment, haversine great-circle distance (the reference exposes it as
  * ST_Distance on SphericalGeography), bounding-box construction — expressed
  * in pure column arithmetic so it is codegen'd and portable. Full geometry
  * types (polygons, R-tree spatial joins, reference SpatialJoinOperator) stay
  * out of scope per the survey's "optional, late" marking.
  */
object GeoFunctions {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two (lat, lon) points (degrees). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** ST_Contains for an axis-aligned bounding box over a point. */
  def bboxContains(minLat: Column, minLon: Column, maxLat: Column, maxLon: Column,
      lat: Column, lon: Column): Column =
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** ST_Area of a polygon given as (xs, ys) DOUBLE coordinate arrays. */
  def stArea(xs: Column, ys: Column): Column =
    column(graft.ext.PolygonArea(expression(xs), expression(ys)))

  /** ST_Perimeter of a polygon. */
  def stPerimeter(xs: Column, ys: Column): Column =
    column(graft.ext.PolygonPerimeter(expression(xs), expression(ys)))

  /** ST_Contains(polygon, point) via even-odd ray casting. */
  def stContains(px: Column, py: Column, xs: Column, ys: Column): Column =
    column(graft.ext.PolygonContains(
      expression(px), expression(py), expression(xs), expression(ys)))

  /** ST_GeometryFromText: WKT → struct<kind, xs, ys> (NULL on unsupported). */
  def stGeometryFromText(wkt: Column): Column =
    column(graft.ext.WktParse(expression(wkt)))

  /** ST_AsText: geometry struct → canonical WKT. */
  def stAsText(geom: Column): Column =
    column(graft.ext.WktFormat(expression(geom)))

  /** ST_Length of a LINESTRING (open path, no closing edge). */
  def stLength(xs: Column, ys: Column): Column =
    column(graft.ext.LineStringLength(expression(xs), expression(ys)))

  /** ST_ConvexHull over (xs, ys) point arrays → hull struct<xs, ys>, CCW
    * from the lexicographically-smallest vertex, collinear points dropped. */
  def stConvexHull(xs: Column, ys: Column): Column =
    column(graft.ext.ConvexHull(expression(xs), expression(ys)))

  /** ST_Intersects over two (xs, ys) polygons. */
  def stIntersects(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    column(graft.ext.PolygonIntersects(
      expression(xa), expression(ya), expression(xb), expression(yb)))

  /** ST_Within: polygon a strictly inside polygon b. */
  def stWithin(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    column(graft.ext.PolygonWithin(
      expression(xa), expression(ya), expression(xb), expression(yb)))

  // ---- ring-aware measures over the geometry struct (holes + MULTI*) ----

  /** ST_Area over the ringed geometry: Σ shells − Σ holes. */
  def stGeomArea(g: Column): Column = column(graft.ext.GeomArea(expression(g)))

  /** ST_Perimeter counting every ring boundary (holes included). */
  def stGeomPerimeter(g: Column): Column = column(graft.ext.GeomPerimeter(expression(g)))

  /** ST_Length over LINESTRING / MULTILINESTRING parts. */
  def stGeomLength(g: Column): Column = column(graft.ext.GeomLength(expression(g)))

  /** ST_Contains(geometry, point): in a shell and not in one of its holes. */
  def stGeomContains(g: Column, px: Column, py: Column): Column =
    column(graft.ext.GeomContainsPoint(expression(g), expression(px), expression(py)))

  /** ST_Centroid ordinates (signed-area-weighted over rings). */
  def stCentroidX(g: Column): Column = column(graft.ext.GeomCentroid(expression(g), 0))
  def stCentroidY(g: Column): Column = column(graft.ext.GeomCentroid(expression(g), 1))

  /** Envelope corners: ST_XMin / ST_XMax / ST_YMin / ST_YMax. */
  def stXMin(g: Column): Column = column(graft.ext.GeomEnvelopeBound(expression(g), xAxis = true, isMin = true))
  def stXMax(g: Column): Column = column(graft.ext.GeomEnvelopeBound(expression(g), xAxis = true, isMin = false))
  def stYMin(g: Column): Column = column(graft.ext.GeomEnvelopeBound(expression(g), xAxis = false, isMin = true))
  def stYMax(g: Column): Column = column(graft.ext.GeomEnvelopeBound(expression(g), xAxis = false, isMin = false))

  /** ST_NumGeometries / ST_NumInteriorRing / ST_NumPoints. */
  def stNumGeometries(g: Column): Column = column(graft.ext.GeomCount(expression(g), "geometries"))
  def stNumInteriorRing(g: Column): Column = column(graft.ext.GeomCount(expression(g), "interior_ring"))
  def stNumPoints(g: Column): Column = column(graft.ext.GeomCount(expression(g), "points"))

  // ---- geometry breadth step 2 (GeoOps: distance / buffer / union) ----

  /** ST_Distance(geom, geom): min planar distance, 0 on intersection. */
  def stDistance(a: Column, b: Column): Column =
    column(graft.ext.GeomDistance(expression(a), expression(b)))

  /** ST_Buffer(geom, d): octagonal-join Minkowski dilation (NULL for d<0). */
  def stBuffer(g: Column, d: Column): Column =
    column(graft.ext.GeomBuffer(expression(g), expression(d)))

  /** ST_Union(geom, geom): boolean union (see GeoOps for supported surface). */
  def stUnion(a: Column, b: Column): Column =
    column(graft.ext.GeomUnion(expression(a), expression(b)))

  /** ST_Intersection(geom, geom): boolean intersection (hole-free
    * single-shell polygons; k>1 regions → MULTIPOLYGON; disjoint → NULL —
    * no empty geometry). */
  def stIntersection(a: Column, b: Column): Column =
    column(graft.ext.GeomIntersection(expression(a), expression(b)))

  /** ST_Difference(a, b): A∖B via the Weiler–Atherton difference walk
    * (B-inside-A → A with hole; empty result → NULL). */
  def stDifference(a: Column, b: Column): Column =
    column(graft.ext.GeomDifference(expression(a), expression(b)))

  /** ST_SymDifference(a, b): (A∖B) ∪ (B∖A) as disjoint parts. */
  def stSymDifference(a: Column, b: Column): Column =
    column(graft.ext.GeomSymDifference(expression(a), expression(b)))

  /** ST_AsBinary: OGC WKB, little-endian (NDR). */
  def stAsBinary(g: Column): Column =
    column(graft.ext.GeomAsBinary(expression(g)))

  /** ST_GeomFromBinary: WKB/EWKB reader (either byte order, SRID skipped,
    * Z/M → NULL). */
  def stGeomFromBinary(b: Column): Column =
    column(graft.ext.GeomFromBinary(expression(b)))

  /** Relation predicates (GeoFunctions.java ST_Equals/ST_Disjoint/
    * ST_Touches/ST_Overlaps/ST_Crosses; see ext.GeoRelations for the
    * supported surface — NULL beyond it). */
  def stEquals(a: Column, b: Column): Column =
    column(graft.ext.GeomRelation(expression(a), expression(b), "equals"))
  def stDisjoint(a: Column, b: Column): Column =
    column(graft.ext.GeomRelation(expression(a), expression(b), "disjoint"))
  def stTouches(a: Column, b: Column): Column =
    column(graft.ext.GeomRelation(expression(a), expression(b), "touches"))
  def stOverlaps(a: Column, b: Column): Column =
    column(graft.ext.GeomRelation(expression(a), expression(b), "overlaps"))
  def stCrosses(a: Column, b: Column): Column =
    column(graft.ext.GeomRelation(expression(a), expression(b), "crosses"))

  /** ST_Boundary / ST_Points / ST_CoordDim / ST_IsValid /
    * geometry_invalid_reason / GeoJSON codec. */
  def stBoundary(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "boundary"))
  def stPoints(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "points"))
  def stCoordDim(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "coord_dim"))
  def stIsValid(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "is_valid"))
  def geometryInvalidReason(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "invalid_reason"))
  def toGeojsonGeometry(g: Column): Column =
    column(graft.ext.GeomUnaryMisc(expression(g), "to_geojson"))
  def fromGeojsonGeometry(j: Column): Column =
    column(graft.ext.GeomFromGeoJson(expression(j)))

  /** Accessors: ST_X/ST_Y/ST_Dimension/ST_IsClosed/ST_IsRing/ST_IsEmpty/
    * ST_GeometryType (lax-NULL on kind mismatch where the reference throws). */
  def stX(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "x"))
  def stY(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "y"))
  def stDimension(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "dimension"))
  def stIsClosed(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "is_closed"))
  def stIsRing(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "is_ring"))
  def stIsEmpty(g: Column): Column = column(graft.ext.GeomAccessor(expression(g), "is_empty"))
  def stGeometryType(g: Column): Column =
    column(graft.ext.GeomAccessor(expression(g), "geometry_type"))

  /** ST_PointN (1-based; negative counts from the end) / ST_StartPoint /
    * ST_EndPoint over LINESTRING. */
  def stPointN(g: Column, n: Column): Column =
    column(graft.ext.GeomPointN(expression(g), expression(n)))
  def stStartPoint(g: Column): Column = stPointN(g, lit(1))
  def stEndPoint(g: Column): Column = stPointN(g, lit(-1))

  // ---- SphericalGeography (to_spherical_geography + metric measures) ----

  /** ST_Distance(sphericalGeography, sphericalGeography) → meters. */
  def stSphericalDistance(a: Column, b: Column): Column =
    column(graft.ext.SphericalDistance(expression(a), expression(b)))

  /** ST_Area on SphericalGeography → m² (spherical excess). */
  def stSphericalArea(g: Column): Column =
    column(graft.ext.SphericalMeasure(expression(g), "area"))

  /** ST_Length on SphericalGeography → meters (great-circle legs). */
  def stSphericalLength(g: Column): Column =
    column(graft.ext.SphericalMeasure(expression(g), "length"))

  /** simplify_geometry(geom, tolerance): Douglas–Peucker. */
  def stSimplifyGeometry(g: Column, tolerance: Column): Column =
    column(graft.ext.GeomSimplify(expression(g), expression(tolerance.cast("double"))))

  /** ST_GeometryN / ST_ExteriorRing / ST_InteriorRingN / ST_Envelope. */
  def stGeometryN(g: Column, n: Column): Column =
    column(graft.ext.GeomPart(expression(g), expression(n.cast("int")), "geometry_n"))
  def stExteriorRing(g: Column): Column =
    column(graft.ext.GeomPart(expression(g), expression(lit(1)), "exterior_ring"))
  def stInteriorRingN(g: Column, n: Column): Column =
    column(graft.ext.GeomPart(expression(g), expression(n.cast("int")), "interior_ring_n"))
  def stEnvelope(g: Column): Column =
    column(graft.ext.GeomPart(expression(g), expression(lit(1)), "envelope"))

  /** line_locate_point / line_interpolate_point (GeoFunctions.java:2135+). */
  def lineLocatePoint(line: Column, point: Column): Column =
    column(graft.ext.LineLocatePoint(expression(line), expression(point)))
  def lineInterpolatePoint(line: Column, fraction: Column): Column =
    column(graft.ext.LineInterpolatePoint(expression(line), expression(fraction)))

  /** st_within_distance_km predicate — the spatial-join rewrite contract
    * (graft.plans.StWithinDistanceKm / SpatialJoinRewrite). */
  def stWithinDistanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
      km: Column): Column =
    column(graft.plans.StWithinDistanceKm(
      expression(lat1.cast("double")), expression(lon1.cast("double")),
      expression(lat2.cast("double")), expression(lon2.cast("double")),
      expression(km.cast("double"))))

  /** great_circle_distance(lat1, lon1, lat2, lon2) → KM
    * (GeoFunctions.java:2100) — pure column arithmetic (codegen'd), the
    * exact formula the oracle replays. */
  def greatCircleDistanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val phi1 = radians(lat1); val phi2 = radians(lat2)
    val dLon = radians(lon1) - radians(lon2)
    val t1 = cos(phi2) * sin(dLon)
    val t2 = cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dLon)
    val t3 = sin(phi1) * sin(phi2) + cos(phi1) * cos(phi2) * cos(dLon)
    atan2(sqrt(t1 * t1 + t2 * t2), t3) * graft.ext.SphericalGeo.EarthRadiusKm
  }
}
