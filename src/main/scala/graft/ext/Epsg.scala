package graft.ext

import java.lang.Math._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Embedded EPSG reprojection subset (reference: lib/trino-geospatial —
  * ST_Transform delegates to an EPSG parameter registry; this carries the
  * published WGS84/UTM parameters for the codes real pipelines hit):
  *
  *  - EPSG:4326  — WGS84 geographic lon/lat (degrees)
  *  - EPSG:3857  — Web-Mercator (spherical, R = a), closed forms
  *  - EPSG:32601-32660 / 32701-32760 — UTM north/south, WGS84 transverse
  *    Mercator via the standard Krüger flattening series (3rd order — the
  *    published series; sub-mm within a zone's ±3° of its central
  *    meridian)
  *
  * All constants and series coefficients are the published WGS84/UTM
  * values (a = 6378137, 1/f = 298.257223563, k0 = 0.9996, FE = 500 km,
  * FN south = 10 000 km). Any pair outside the subset yields None and the
  * SQL surface answers NULL loudly (the engine's lax twin of the
  * reference's "unsupported SRID" error). */
object Epsg {

  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996

  // Krüger series in the third flattening n
  private val N3 = F / (2 - F)
  private val AA = A / (1 + N3) * (1 + N3 * N3 / 4 + pow(N3, 4) / 64)
  private val Alpha = Array(
    N3 / 2 - 2 * N3 * N3 / 3 + 5 * pow(N3, 3) / 16,
    13 * N3 * N3 / 48 - 3 * pow(N3, 3) / 5,
    61 * pow(N3, 3) / 240)
  private val Beta = Array(
    N3 / 2 - 2 * N3 * N3 / 3 + 37 * pow(N3, 3) / 96,
    N3 * N3 / 48 + pow(N3, 3) / 15,
    17 * pow(N3, 3) / 480)
  private val Delta = Array(
    2 * N3 - 2 * N3 * N3 / 3 - 2 * pow(N3, 3),
    7 * N3 * N3 / 3 - 8 * pow(N3, 3) / 5,
    56 * pow(N3, 3) / 15)

  /** Coordinate mapper from `from` to `to`, or None outside the subset. */
  def transformer(from: Int, to: Int): Option[(Double, Double) => (Double, Double)] = {
    if (from == to) return Some((x, y) => (x, y))
    (toWgs84(from), fromWgs84(to)) match {
      case (Some(inv), Some(fwd)) => Some { (x, y) =>
        val (lon, lat) = inv(x, y); fwd(lon, lat)
      }
      case _ => None
    }
  }

  private def utmZone(srid: Int): Option[(Int, Boolean)] =
    if (srid >= 32601 && srid <= 32660) Some((srid - 32600, false))
    else if (srid >= 32701 && srid <= 32760) Some((srid - 32700, true))
    else None

  private def toWgs84(srid: Int): Option[(Double, Double) => (Double, Double)] =
    srid match {
      case 4326 => Some((x, y) => (x, y))
      case 3857 => Some(webMercatorInverse)
      case z => utmZone(z).map { case (zone, south) =>
        (x: Double, y: Double) => utmInverse(zone, south, x, y)
      }
    }

  private def fromWgs84(srid: Int): Option[(Double, Double) => (Double, Double)] =
    srid match {
      case 4326 => Some((x, y) => (x, y))
      case 3857 => Some(webMercatorForward)
      case z => utmZone(z).map { case (zone, south) =>
        (lon: Double, lat: Double) => utmForward(zone, south, lon, lat)
      }
    }

  // ---- EPSG:3857 (spherical web mercator; the published closed forms)
  def webMercatorForward(lon: Double, lat: Double): (Double, Double) =
    (A * toRadians(lon), A * log(tan(PI / 4 + toRadians(lat) / 2)))

  def webMercatorInverse(x: Double, y: Double): (Double, Double) =
    (toDegrees(x / A), toDegrees(2 * atan(exp(y / A)) - PI / 2))

  // ---- UTM (WGS84 transverse Mercator, Krüger series)
  def utmForward(zone: Int, south: Boolean, lon: Double, lat: Double): (Double, Double) = {
    val (e, n) = tmForward(lon, lat, zone * 6 - 183)
    (500000.0 + e, (if (south) 10000000.0 else 0.0) + n)
  }

  def utmInverse(zone: Int, south: Boolean, x: Double, y: Double): (Double, Double) =
    tmInverse(x - 500000.0, y - (if (south) 10000000.0 else 0.0), zone * 6 - 183)

  private def tmForward(lonDeg: Double, latDeg: Double, lon0Deg: Double): (Double, Double) = {
    val phi = toRadians(latDeg)
    val dl = toRadians(lonDeg - lon0Deg)
    val c = 2 * sqrt(N3) / (1 + N3)
    val t = sinh(atanh(sin(phi)) - c * atanh(c * sin(phi)))
    val xiP = atan2(t, cos(dl))
    val etaP = atanh(sin(dl) / sqrt(1 + t * t))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 3) {
      xi += Alpha(j - 1) * sin(2 * j * xiP) * cosh(2 * j * etaP)
      eta += Alpha(j - 1) * cos(2 * j * xiP) * sinh(2 * j * etaP)
      j += 1
    }
    (K0 * AA * eta, K0 * AA * xi) // (easting from meridian, northing)
  }

  private def tmInverse(e: Double, n: Double, lon0Deg: Double): (Double, Double) = {
    val xi0 = n / (K0 * AA)
    val eta0 = e / (K0 * AA)
    var xiP = xi0
    var etaP = eta0
    var j = 1
    while (j <= 3) {
      xiP -= Beta(j - 1) * sin(2 * j * xi0) * cosh(2 * j * eta0)
      etaP -= Beta(j - 1) * cos(2 * j * xi0) * sinh(2 * j * eta0)
      j += 1
    }
    val chi = asin(sin(xiP) / cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 3) { phi += Delta(j - 1) * sin(2 * j * chi); j += 1 }
    val lon = lon0Deg + toDegrees(atan2(sinh(etaP), cos(xiP)))
    (lon, toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * log((1 + x) / (1 - x))
}

/** ST_Transform(geometry, from_srid, to_srid) → geometry. The engine's
  * geometry model carries SRID 0 (documented), so the source CRS is an
  * explicit argument — the 2-arg reference signature stays the loud NULL
  * it always was for SRID-0 input (GeoFunctions.java:530). Every
  * coordinate maps through the [[Epsg]] subset; an unlisted SRID pair
  * answers NULL. */
case class GeomTransform(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (s: StructType, IntegerType, IntegerType) if s.length == 4 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (geometry, int, int), got $other")
    }
  override def dataType: DataType = Wkt.geometryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_transform"

  override protected def nullSafeEval(g: Any, f: Any, t: Any): Any = {
    Epsg.transformer(f.asInstanceOf[Int], t.asInstanceOf[Int]) match {
      case None => null
      case Some(fn) =>
        val row = g.asInstanceOf[InternalRow]
        val xs = row.getArray(1).toDoubleArray()
        val ys = row.getArray(2).toDoubleArray()
        val nx = new Array[Double](xs.length)
        val ny = new Array[Double](ys.length)
        var i = 0
        while (i < xs.length) {
          val (a, b) = fn(xs(i), ys(i))
          nx(i) = a; ny(i) = b; i += 1
        }
        InternalRow(row.getUTF8String(0).clone(),
          new GenericArrayData(nx), new GenericArrayData(ny),
          new GenericArrayData(row.getArray(3).toIntArray()))
    }
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}
