package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** SphericalGeography measures (reference GeoFunctions.java —
  * to_spherical_geography:650, spherical ST_Distance:2227 (meters, POINT
  * only), spherical ST_Length:901, spherical ST_Area:2257 via running
  * spherical excess with bearing-based pole detection; EARTH_RADIUS_KM =
  * 6371.01 at :127). Coordinates are (lon, lat) degrees in the same struct
  * model; the published underlying maths (movable-type great-circle and
  * spherical-excess formulas, cited by the reference itself) are
  * implemented directly on the flat ring arrays.
  *
  * Oracle strategy (operators.Geometry): distance/length replay the exact
  * atan2 formula in SQL under round-9; area is pinned by small-patch
  * planar-ratio and monotonicity invariants (the excess loop has no
  * closed-form SQL replay), with octant known-answer tests in GeoOpsSpec. */
object SphericalGeo {
  val EarthRadiusKm = 6371.01
  val EarthRadiusM: Double = EarthRadiusKm * 1000.0

  /** Great-circle distance in KM (GeoFunctions.java:2110 form). */
  def greatCircleKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val rLat1 = math.toRadians(lat1)
    val rLat2 = math.toRadians(lat2)
    val sin1 = math.sin(rLat1); val cos1 = math.cos(rLat1)
    val sin2 = math.sin(rLat2); val cos2 = math.cos(rLat2)
    val dLon = math.toRadians(lon1) - math.toRadians(lon2)
    val cosDLon = math.cos(dLon)
    val t1 = cos2 * math.sin(dLon)
    val t2 = cos1 * sin2 - sin1 * cos2 * cosDLon
    val t3 = sin1 * sin2 + cos1 * cos2 * cosDLon
    math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * EarthRadiusKm
  }

  /** Spherical excess of one ring given as (lon, lat) degree arrays (open or
    * closed), with the reference's course-delta pole correction. */
  def sphericalExcess(lons: Array[Double], lats: Array[Double]): Double = {
    var end = lons.length
    if (end > 1 && lons(end - 1) == lons(0) && lats(end - 1) == lats(0)) end -= 1
    require(end >= 3, "spherical area needs >= 3 distinct ring vertices")
    var excess = 0.0
    var courseDelta = 0.0
    var firstInitialBearing = 0.0
    var previousFinalBearing = 0.0
    var firstPoint = true
    var prevPhi = math.toRadians(lats(end - 1))
    var prevCos = math.cos(prevPhi)
    var prevSin = math.sin(prevPhi)
    var prevTan = math.tan(prevPhi / 2)
    var prevLon = math.toRadians(lons(end - 1))
    val TwoPi = 2 * math.Pi
    for (i <- 0 until end) {
      val phi = math.toRadians(lats(i))
      val tan = math.tan(phi / 2)
      val lon = math.toRadians(lons(i))
      require(lon != prevLon || phi != prevPhi,
        "spherical area: identical consecutive vertices")
      val dLon = lon - prevLon
      excess += 2 * math.atan2(math.tan(dLon / 2) * (prevTan + tan), 1 + prevTan * tan)
      val cos = math.cos(phi)
      val sin = math.sin(phi)
      val sinDLon = math.sin(dLon)
      val cosDLon = math.cos(dLon)
      val initialBearing = (math.atan2(sinDLon * cos, prevCos * sin - prevSin * cos * cosDLon) + TwoPi) % TwoPi
      val finalBearing = (math.atan2(-sinDLon * prevCos, prevSin * cos - prevCos * sin * cosDLon) + math.Pi) % TwoPi
      if (firstPoint) { firstInitialBearing = initialBearing; firstPoint = false }
      else courseDelta += (initialBearing - previousFinalBearing + 3 * math.Pi) % TwoPi - math.Pi
      courseDelta += (finalBearing - initialBearing + 3 * math.Pi) % TwoPi - math.Pi
      previousFinalBearing = finalBearing
      prevCos = cos; prevSin = sin; prevPhi = phi; prevTan = tan; prevLon = lon
    }
    courseDelta += (firstInitialBearing - previousFinalBearing + 3 * math.Pi) % TwoPi - math.Pi
    // course delta ~0 (instead of ±2π) means a pole is enclosed
    if (math.abs(courseDelta) < math.Pi / 4) excess = math.abs(excess) - TwoPi
    excess
  }

  /** Spherical polygon area in m²: |Σ shells − Σ holes| · R². */
  def area(g: Wkt.Geom): java.lang.Double = {
    if (g.kind != "POLYGON" && g.kind != "MULTIPOLYGON") return null
    var total = 0.0
    var off = 0
    for (len0 <- g.rings) {
      val len = math.abs(len0)
      val lons = java.util.Arrays.copyOfRange(g.xs, off, off + len)
      val lats = java.util.Arrays.copyOfRange(g.ys, off, off + len)
      val e = math.abs(sphericalExcess(lons, lats))
      total += (if (len0 > 0) e else -e)
      off += len
    }
    math.abs(total * EarthRadiusM * EarthRadiusM)
  }

  /** Spherical linestring length in meters (GeoFunctions.java:901). */
  def length(g: Wkt.Geom): java.lang.Double = {
    if (g.kind != "LINESTRING" && g.kind != "MULTILINESTRING") return null
    var sum = 0.0
    var off = 0
    for (len <- g.rings) {
      for (i <- 1 until len)
        sum += greatCircleKm(g.ys(off + i - 1), g.xs(off + i - 1), g.ys(off + i), g.xs(off + i))
      off += len
    }
    sum * 1000.0
  }

  /** Spherical point distance in meters (GeoFunctions.java:2227). */
  def distance(a: Wkt.Geom, b: Wkt.Geom): java.lang.Double =
    if (a.kind != "POINT" || b.kind != "POINT") null
    else greatCircleKm(a.ys(0), a.xs(0), b.ys(0), b.xs(0)) * 1000.0
}

/** ST_Distance over SphericalGeography points → meters. */
case class SphericalDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("spherical st_distance expects two geometry structs")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_spherical_distance"
  override def nullSafeEval(a: Any, b: Any): Any =
    SphericalGeo.distance(GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Area / ST_Length over SphericalGeography. */
case class SphericalMeasure(child: Expression, what: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"spherical st_$what expects a geometry struct")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_spherical_$what"
  override def nullSafeEval(input: Any): Any = {
    val g = GeoOps.fromRow(input.asInstanceOf[InternalRow])
    what match {
      case "area" => SphericalGeo.area(g)
      case "length" => SphericalGeo.length(g)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
