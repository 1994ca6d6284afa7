package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Epsg

/** EPSG subset math: published anchor values, ellipsoidal behavior, and
  * round-trip closure for Web-Mercator and UTM. */
class EpsgSpec extends AnyFunSuite {

  private val A = 6378137.0
  private val F = 1.0 / 298.257223563

  test("web mercator anchors: origin, antimeridian, equator") {
    val (x0, y0) = Epsg.webMercatorForward(0, 0)
    assert(math.abs(x0) < 1e-9 && math.abs(y0) < 1e-9)
    // x(180°) = πR — the familiar 20037508.342789244 world half-width
    val (x180, _) = Epsg.webMercatorForward(180, 0)
    assert(math.abs(x180 - math.Pi * A) < 1e-6)
    assert(math.abs(x180 - 20037508.342789244) < 1e-6)
    // y is odd in latitude
    val (_, yp) = Epsg.webMercatorForward(10, 30)
    val (_, yn) = Epsg.webMercatorForward(10, -30)
    assert(math.abs(yp + yn) < 1e-9)
  }

  test("web mercator round-trips to double precision") {
    for (lon <- Seq(-179.9, -42.5, 0.0, 13.37, 179.9);
         lat <- Seq(-84.9, -45.0, 0.0, 30.25, 84.9)) {
      val (x, y) = Epsg.webMercatorForward(lon, lat)
      val (lon2, lat2) = Epsg.webMercatorInverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-11 && math.abs(lat2 - lat) < 1e-11,
        s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("UTM anchors: central meridian easting, equator northing, south offset") {
    // zone 31 central meridian = 3°E
    val (e0, n0) = Epsg.utmForward(31, south = false, 3.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0) < 1e-6)
    val (_, ns) = Epsg.utmForward(31, south = true, 3.0, 0.0)
    assert(math.abs(ns - 10000000.0) < 1e-6)
    // easting symmetric around the central meridian
    val (eW, _) = Epsg.utmForward(31, south = false, 2.0, 40.0)
    val (eE, _) = Epsg.utmForward(31, south = false, 4.0, 40.0)
    assert(math.abs((500000.0 - eW) - (eE - 500000.0)) < 1e-6)
  }

  test("UTM is ellipsoidal: meridian scale at the central meridian is k0·M") {
    // ΔN/Δφ at the equator on the central meridian ≈ k0 · M(0),
    // M(0) = a(1−e²) — the meridional radius of curvature, NOT the
    // spherical radius; this distinguishes the ellipsoid from a sphere
    // by ~21 km/rad.
    val e2 = F * (2 - F)
    val m0 = A * (1 - e2)
    val dPhi = 1e-4 // degrees
    val (_, n1) = Epsg.utmForward(31, south = false, 3.0, dPhi)
    val measured = n1 / math.toRadians(dPhi)
    assert(math.abs(measured - 0.9996 * m0) / (0.9996 * m0) < 1e-6,
      s"dN/dphi = $measured, expected ~${0.9996 * m0}")
  }

  test("UTM round-trips across zones and hemispheres") {
    for (zone <- Seq(1, 18, 31, 33, 60); south <- Seq(false, true);
         dLon <- Seq(-2.9, -1.0, 0.0, 1.5, 2.9);
         lat <- Seq(0.1, 27.5, 45.0, 71.9)) {
      val lon0 = zone * 6 - 183
      val latSigned = if (south) -lat else lat
      val (x, y) = Epsg.utmForward(zone, south, lon0 + dLon, latSigned)
      val (lon2, lat2) = Epsg.utmInverse(zone, south, x, y)
      assert(math.abs(lon2 - (lon0 + dLon)) < 1e-8 &&
        math.abs(lat2 - latSigned) < 1e-8,
        s"zone $zone south=$south (${lon0 + dLon},$latSigned) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("transformer composes pairs and rejects unlisted SRIDs") {
    assert(Epsg.transformer(4326, 999).isEmpty)
    assert(Epsg.transformer(999, 4326).isEmpty)
    assert(Epsg.transformer(4326, 4326).isDefined)
    // 3857 -> UTM via WGS84: equals the two-step composition
    val direct = Epsg.transformer(3857, 32631).get
    val (mx, my) = Epsg.webMercatorForward(3.5, 40.0)
    val (dx, dy) = direct(mx, my)
    val (ex, ey) = Epsg.utmForward(31, south = false, 3.5, 40.0)
    assert(math.abs(dx - ex) < 1e-6 && math.abs(dy - ey) < 1e-6)
  }
}
