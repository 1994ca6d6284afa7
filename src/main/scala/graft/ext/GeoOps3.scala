package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geometry breadth step 3 (SURVEY.md §2.8; reference plugin/trino-geospatial/
  * GeoFunctions.java constructors/converters/combiners: ST_LineFromText:214,
  * ST_Force2D:233, ST_Collect:307, ST_MakeLine:316, ST_MakePolygon:351,
  * ST_Multi:390, ST_SRID:495, ST_SetSRID:503, ST_AsEWKT:713, ST_AsEWKB:587,
  * ST_GeomFromEWKT:472, ST_IsSimple:851, line_interpolate_points:974,
  * ST_InteriorRings:1090, ST_Geometries:1333, ST_Normalize:1425,
  * ST_ReducePrecision:1436, ST_Z:1538, ST_PointOnSurface:1569,
  * ST_EnvelopeAsPts:1595, ST_OrientedEnvelope:1612,
  * ST_MinimumBoundingCircle:1622, ST_Polygonize:1632,
  * geometry_nearest_points:1708, ST_LineMerge:1766, geometry_union, plus
  * EncodedPolylineFunctions.java from/to_encoded_polyline).
  *
  * All kernels run over the flat ringed [[Wkt.Geom]] model. Documented
  * subset decisions (each degrades to NULL, never a wrong answer):
  *  - The geometry value carries no CRS slot, so ST_SRID is the constant 0
  *    (the JTS default the reference reports for untagged geometry),
  *    ST_SetSRID(g, 0) is the identity and any other SRID yields NULL;
  *    ST_AsEWKT/ST_AsEWKB equal ST_AsText/ST_AsBinary exactly as the
  *    reference's do at SRID 0 (GeoFunctions.java:718-722), and
  *    ST_GeomFromEWKT accepts-and-discards an `SRID=n;` prefix.
  *  - ST_Collect of mixed base types builds a GEOMETRYCOLLECTION
  *    (members of any kind, including MULTIs and nested collections).
  *  - The model is strictly 2D: ST_Force2D is the identity, ST_Z is NULL.
  *  - ST_Polygonize accepts closed rings (JTS's fully-noded case) and
  *    ignores dangles the way the reference's polygonizer drops them.
  */
object GeoOps3 {
  import Wkt.Geom
  import GeoOps.{parts, pointInRingArr}

  // ------------------------------------------------------------ components

  /** Component list: MULTIX → X parts (polygon parts keep their holes). */
  def components(g: Geom): List[Geom] = g.kind match {
    case "GEOMETRYCOLLECTION" => Wkt.gcParts(g).toList
    case "MULTIPOINT" =>
      (0 until g.xs.length).map(i =>
        Geom("POINT", Array(g.xs(i)), Array(g.ys(i)), Array(1))).toList
    case "MULTILINESTRING" =>
      parts(g).map { case (off, len, _) =>
        Geom("LINESTRING",
          java.util.Arrays.copyOfRange(g.xs, off, off + len),
          java.util.Arrays.copyOfRange(g.ys, off, off + len), Array(len))
      }.toList
    case "MULTIPOLYGON" =>
      // a shell plus its trailing holes is one part
      val groups = scala.collection.mutable.ListBuffer[(Int, List[Int])]()
      var off = 0
      for (len <- g.rings) {
        if (len > 0 || groups.isEmpty) groups += ((off, List(len)))
        else groups(groups.length - 1) =
          (groups.last._1, groups.last._2 :+ len)
        off += math.abs(len)
      }
      groups.map { case (o, lens) =>
        val total = lens.map(math.abs).sum
        Geom("POLYGON",
          java.util.Arrays.copyOfRange(g.xs, o, o + total),
          java.util.Arrays.copyOfRange(g.ys, o, o + total), lens.toArray)
      }.toList
    case _ => List(g)
  }

  def multi(g: Geom): Geom = g.kind match {
    case "POINT" => g.copy(kind = "MULTIPOINT")
    case "LINESTRING" => g.copy(kind = "MULTILINESTRING")
    case "POLYGON" => g.copy(kind = "MULTIPOLYGON")
    case _ => g
  }

  /** Collect: same base type → the MULTI kind; mixed base types → a
    * GEOMETRYCOLLECTION (the reference's stCollect shape). */
  def collect(gs: Seq[Geom]): Geom = {
    if (gs.isEmpty || gs.contains(null)) return null
    val flat = gs.flatMap(components)
    val kinds = flat.map(_.kind).distinct
    if (kinds.length != 1) return Wkt.gcBuild(flat)
    val kind = "MULTI" + kinds.head
    Geom(kind, flat.flatMap(_.xs).toArray, flat.flatMap(_.ys).toArray,
      flat.flatMap(_.rings).toArray)
  }

  /** LINESTRING from points/linestrings, vertices in order. */
  def makeLine(gs: Seq[Geom]): Geom = {
    if (gs.isEmpty || gs.contains(null)) return null
    if (gs.exists(g => g.kind != "POINT" && g.kind != "LINESTRING" &&
      g.kind != "MULTIPOINT")) return null
    val xs = gs.flatMap(_.xs).toArray
    val ys = gs.flatMap(_.ys).toArray
    if (xs.length < 2) null else Geom("LINESTRING", xs, ys, Array(xs.length))
  }

  private def closedLine(g: Geom): Boolean =
    g.kind == "LINESTRING" && g.xs.length >= 4 &&
      g.xs(0) == g.xs(g.xs.length - 1) && g.ys(0) == g.ys(g.ys.length - 1)

  /** POLYGON from a closed shell LINESTRING plus closed hole LINESTRINGs. */
  def makePolygon(shell: Geom, holes: Seq[Geom]): Geom = {
    if (shell == null || !closedLine(shell)) return null
    if (holes.contains(null) || holes.exists(h => !closedLine(h))) return null
    Geom("POLYGON",
      shell.xs ++ holes.flatMap(_.xs),
      shell.ys ++ holes.flatMap(_.ys),
      Array(shell.xs.length) ++ holes.map(h => -h.xs.length))
  }

  def interiorRings(g: Geom): List[Geom] =
    if (g.kind != "POLYGON") null
    else parts(g).filter(_._3).map { case (off, len, _) =>
      Geom("LINESTRING",
        java.util.Arrays.copyOfRange(g.xs, off, off + len),
        java.util.Arrays.copyOfRange(g.ys, off, off + len), Array(len))
    }.toList

  def envelopeAsPts(g: Geom): List[Geom] = {
    if (g.xs.isEmpty) return null
    val xmin = g.xs.min; val xmax = g.xs.max
    val ymin = g.ys.min; val ymax = g.ys.max
    List(Geom("POINT", Array(xmin), Array(ymin), Array(1)),
      Geom("POINT", Array(xmax), Array(ymax), Array(1)))
  }

  // ---------------------------------------------------------- normalization

  private def ringSignedArea(xs: Array[Double], ys: Array[Double],
      off: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val j = (i + 1) % len
      acc += xs(off + i) * ys(off + j) - xs(off + j) * ys(off + i)
      i += 1
    }
    acc / 2.0
  }

  /** One ring (with closing duplicate) → canonical: rotated to start at the
    * lexicographically smallest vertex, oriented CW for shells / CCW for
    * holes (the JTS normal form the reference's ST_Normalize produces). */
  private def normalizeRing(xs0: Array[Double], ys0: Array[Double],
      wantClockwise: Boolean): (Array[Double], Array[Double]) = {
    // strip closing duplicate for rotation work
    val n0 = xs0.length
    val closed = n0 > 1 && xs0(0) == xs0(n0 - 1) && ys0(0) == ys0(n0 - 1)
    val n = if (closed) n0 - 1 else n0
    val xs = xs0.take(n); val ys = ys0.take(n)
    val area = ringSignedArea(xs, ys, 0, n)
    val cw = area < 0
    val (oxs, oys) =
      if (cw == wantClockwise) (xs, ys) else (xs.reverse, ys.reverse)
    var best = 0
    for (i <- 1 until n)
      if (oxs(i) < oxs(best) || (oxs(i) == oxs(best) && oys(i) < oys(best))) best = i
    val rx = new Array[Double](n + 1); val ry = new Array[Double](n + 1)
    for (i <- 0 until n) {
      rx(i) = oxs((best + i) % n); ry(i) = oys((best + i) % n)
    }
    rx(n) = rx(0); ry(n) = ry(0)
    (rx, ry)
  }

  private def compareCoords(a: Geom, b: Geom): Int = {
    val n = math.min(a.xs.length, b.xs.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Double.compare(a.xs(i), b.xs(i))
      if (c != 0) return c
      val c2 = java.lang.Double.compare(a.ys(i), b.ys(i))
      if (c2 != 0) return c2
      i += 1
    }
    a.xs.length - b.xs.length
  }

  def normalize(g: Geom): Geom = g.kind match {
    case "POINT" => g
    case "MULTIPOINT" =>
      val idx = g.xs.indices.sortBy(i => (g.xs(i), g.ys(i)))
      Geom("MULTIPOINT", idx.map(g.xs).toArray, idx.map(g.ys).toArray,
        g.rings.clone())
    case "LINESTRING" =>
      // oriented so the smaller endpoint sequence comes first
      val rev = Geom("LINESTRING", g.xs.reverse, g.ys.reverse, g.rings)
      if (compareCoords(g, rev) <= 0) g else rev
    case "MULTILINESTRING" =>
      val comps = components(g).map(normalize).sortWith(compareCoords(_, _) < 0)
      Geom("MULTILINESTRING", comps.flatMap(_.xs).toArray,
        comps.flatMap(_.ys).toArray, comps.flatMap(_.rings).toArray)
    case "POLYGON" =>
      val ps = parts(g)
      val out = ps.map { case (off, len, hole) =>
        normalizeRing(java.util.Arrays.copyOfRange(g.xs, off, off + len),
          java.util.Arrays.copyOfRange(g.ys, off, off + len), !hole)
      }
      // shell first (as stored), holes sorted canonically
      val shell = out.head
      val holes = out.tail.sortBy(h => (h._1(0), h._2(0)))
      Geom("POLYGON", (shell +: holes).flatMap(_._1).toArray,
        (shell +: holes).flatMap(_._2).toArray,
        Array(shell._1.length) ++ holes.map(h => -h._1.length))
    case "MULTIPOLYGON" =>
      val comps = components(g).map(normalize).sortWith(compareCoords(_, _) < 0)
      Geom("MULTIPOLYGON", comps.flatMap(_.xs).toArray,
        comps.flatMap(_.ys).toArray, comps.flatMap(_.rings).toArray)
    case _ => g
  }

  /** Round every coordinate to the nearest multiple of gridSize; a ring
    * that collapses below 3 distinct vertices → null (loud, the reference's
    * precision reducer re-noding is out of scope). */
  def reducePrecision(g: Geom, grid: Double): Geom = {
    if (grid <= 0 || grid.isNaN || grid.isInfinite) return null
    def r(v: Double): Double = math.rint(v / grid) * grid
    val xs = g.xs.map(r); val ys = g.ys.map(r)
    if (g.kind == "POLYGON" || g.kind == "MULTIPOLYGON") {
      for ((off, len, _) <- parts(g)) {
        val distinct = (0 until len).map(i => (xs(off + i), ys(off + i))).distinct
        if (distinct.length < 3) return null
      }
    }
    Geom(g.kind, xs, ys, g.rings.clone())
  }

  // ------------------------------------------------------------- is_simple

  private def onSegmentInterior(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Boolean = {
    val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    if (cross != 0.0) return false
    val dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
    val l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    dot > 0 && dot < l2
  }

  /** Self-intersection test over one or many linestrings: any proper
    * crossing, or any vertex in another segment's interior, or duplicate
    * non-consecutive vertices → not simple (matches the reference's Esri
    * delegation on generic inputs; a closed ring is simple). */
  def isSimple(g: Geom): Boolean = g.kind match {
    case "POINT" => true
    case "MULTIPOINT" =>
      g.xs.indices.map(i => (g.xs(i), g.ys(i))).distinct.length == g.xs.length
    case "LINESTRING" | "MULTILINESTRING" =>
      val segs = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double, Int)]()
      var part = 0
      for ((off, len, _) <- parts(g)) {
        for (i <- 0 until len - 1)
          segs += ((g.xs(off + i), g.ys(off + i),
            g.xs(off + i + 1), g.ys(off + i + 1), part))
        part += 1
      }
      val ringClosed = components(g).map(closedLine)
      for (i <- segs.indices; j <- i + 1 until segs.length) {
        val a = segs(i); val b = segs(j)
        val adjacent = a._5 == b._5 && (j == i + 1 ||
          // closing pair of a closed ring shares the wrap endpoint
          (ringClosed(a._5) && i == segs.indexWhere(_._5 == a._5) &&
            j == segs.lastIndexWhere(_._5 == a._5)))
        if (Wkt.segmentsCross(a._1, a._2, a._3, a._4, b._1, b._2, b._3, b._4))
          return false
        if (!adjacent) {
          // improper contact: shared endpoint between non-adjacent segments,
          // or an endpoint inside the other segment
          if (onSegmentInterior(a._1, a._2, b._1, b._2, b._3, b._4) ||
            onSegmentInterior(a._3, a._4, b._1, b._2, b._3, b._4) ||
            onSegmentInterior(b._1, b._2, a._1, a._2, a._3, a._4) ||
            onSegmentInterior(b._3, b._4, a._1, a._2, a._3, a._4)) return false
          val sharesEndpoint =
            (a._1 == b._1 && a._2 == b._2) || (a._1 == b._3 && a._2 == b._4) ||
            (a._3 == b._1 && a._4 == b._2) || (a._3 == b._3 && a._4 == b._4)
          if (sharesEndpoint && a._5 == b._5) return false
        }
      }
      true
    case _ =>
      // polygonal: simple iff valid by the ring rules
      GeoRelations.invalidReason(g) == null
  }

  // -------------------------------------------------------- point on surface

  def pointOnSurface(g: Geom): Geom = g.kind match {
    case "POINT" => g
    case "MULTIPOINT" | "LINESTRING" | "MULTILINESTRING" =>
      // vertex closest to the centroid (JTS interior-point convention)
      val cx = g.xs.sum / g.xs.length; val cy = g.ys.sum / g.ys.length
      var best = 0; var bestD = Double.PositiveInfinity
      for (i <- g.xs.indices) {
        val d = (g.xs(i) - cx) * (g.xs(i) - cx) + (g.ys(i) - cy) * (g.ys(i) - cy)
        if (d < bestD) { bestD = d; best = i }
      }
      Geom("POINT", Array(g.xs(best)), Array(g.ys(best)), Array(1))
    case "POLYGON" | "MULTIPOLYGON" =>
      // midpoint of the widest interior span on the bisector scanline
      val ymin = g.ys.min; val ymax = g.ys.max
      // nudge off vertex ordinates so every crossing is proper
      var y = (ymin + ymax) / 2.0
      if (g.ys.contains(y)) y = y + (ymax - ymin) / 4096.0
      val xsAt = scala.collection.mutable.ArrayBuffer[Double]()
      for ((off, len, _) <- parts(g); i <- 0 until len) {
        val j = (i + 1) % len
        val y1 = g.ys(off + i); val y2 = g.ys(off + j)
        if ((y1 > y) != (y2 > y)) {
          val t = (y - y1) / (y2 - y1)
          xsAt += g.xs(off + i) + t * (g.xs(off + j) - g.xs(off + i))
        }
      }
      val sorted = xsAt.sorted
      if (sorted.length < 2)
        return Geom("POINT", Array(g.xs(0)), Array(g.ys(0)), Array(1))
      var bi = 0; var bw = -1.0
      var i = 0
      while (i + 1 < sorted.length) {
        val w = sorted(i + 1) - sorted(i)
        if (w > bw) { bw = w; bi = i }
        i += 2
      }
      Geom("POINT", Array((sorted(bi) + sorted(bi + 1)) / 2.0), Array(y), Array(1))
    case _ => null
  }

  // ------------------------------------------------- hulls / envelopes / MBC

  /** Monotone-chain convex hull over all vertices (CCW, no closing dup). */
  def convexHullPts(xs0: Array[Double], ys0: Array[Double]): (Array[Double], Array[Double]) = {
    val pts = xs0.indices.map(i => (xs0(i), ys0(i))).distinct.sorted
    if (pts.length <= 2)
      return (pts.map(_._1).toArray, pts.map(_._2).toArray)
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    (hull.map(_._1), hull.map(_._2))
  }

  /** Rotating-calipers minimum-area enclosing rectangle (ST_OrientedEnvelope).
    * For each hull edge: area = (dot-range × cross-range) / |e|² — exact for
    * the axis-aligned candidate on integer fixtures. Returns the 5-point
    * closed POLYGON. */
  def orientedEnvelope(g: Geom): Geom = {
    val (hx, hy) = convexHullPts(g.xs, g.ys)
    val n = hx.length
    if (n == 0) return null
    if (n == 1) return Geom("POINT", Array(hx(0)), Array(hy(0)), Array(1))
    if (n == 2)
      return Geom("LINESTRING", hx, hy, Array(2))
    var bestArea = Double.PositiveInfinity
    var best: Array[Double] = null
    for (i <- 0 until n) {
      val ex = hx((i + 1) % n) - hx(i); val ey = hy((i + 1) % n) - hy(i)
      val l2 = ex * ex + ey * ey
      if (l2 > 0) {
        var minD = Double.PositiveInfinity; var maxD = Double.NegativeInfinity
        var minC = Double.PositiveInfinity; var maxC = Double.NegativeInfinity
        for (k <- 0 until n) {
          val dx = hx(k) - hx(i); val dy = hy(k) - hy(i)
          val d = dx * ex + dy * ey
          val c = dx * ey - dy * ex // note: cross of (dx,dy) with e, sign flipped
          if (d < minD) minD = d
          if (d > maxD) maxD = d
          if (c < minC) minC = c
          if (c > maxC) maxC = c
        }
        val area = (maxD - minD) * (maxC - minC) / l2
        if (area < bestArea) {
          bestArea = area
          // corners = base + (d*e + c*(ey,-ex)) / l2 for the 4 extremes
          def corner(d: Double, c: Double): (Double, Double) =
            (hx(i) + (d * ex + c * ey) / l2, hy(i) + (d * ey - c * ex) / l2)
          val c1 = corner(minD, minC); val c2 = corner(maxD, minC)
          val c3 = corner(maxD, maxC); val c4 = corner(minD, maxC)
          best = Array(c1._1, c1._2, c2._1, c2._2, c3._1, c3._2, c4._1, c4._2)
        }
      }
    }
    if (best == null) return null
    Geom("POLYGON",
      Array(best(0), best(2), best(4), best(6), best(0)),
      Array(best(1), best(3), best(5), best(7), best(1)), Array(5))
  }

  /** Welzl's minimum enclosing circle over the vertices (deterministic:
    * input order, no shuffle). Returns (cx, cy, r). */
  def minCircle(xs: Array[Double], ys: Array[Double]): (Double, Double, Double) = {
    val pts = xs.indices.map(i => (xs(i), ys(i))).distinct.toArray
    def circle2(a: (Double, Double), b: (Double, Double)) = {
      val cx = (a._1 + b._1) / 2.0; val cy = (a._2 + b._2) / 2.0
      (cx, cy, math.hypot(a._1 - cx, a._2 - cy))
    }
    def circle3(a: (Double, Double), b: (Double, Double), c: (Double, Double)) = {
      val d = 2.0 * (a._1 * (b._2 - c._2) + b._1 * (c._2 - a._2) + c._1 * (a._2 - b._2))
      if (d == 0.0) null
      else {
        val ux = ((a._1 * a._1 + a._2 * a._2) * (b._2 - c._2) +
          (b._1 * b._1 + b._2 * b._2) * (c._2 - a._2) +
          (c._1 * c._1 + c._2 * c._2) * (a._2 - b._2)) / d
        val uy = ((a._1 * a._1 + a._2 * a._2) * (c._1 - b._1) +
          (b._1 * b._1 + b._2 * b._2) * (a._1 - c._1) +
          (c._1 * c._1 + c._2 * c._2) * (b._1 - a._1)) / d
        (ux, uy, math.hypot(a._1 - ux, a._2 - uy))
      }
    }
    def inside(c: (Double, Double, Double), p: (Double, Double)) =
      c != null && math.hypot(p._1 - c._1, p._2 - c._2) <= c._3 * (1 + 1e-12)
    if (pts.isEmpty) return null
    if (pts.length == 1) return (pts(0)._1, pts(0)._2, 0.0)
    var c: (Double, Double, Double) = circle2(pts(0), pts(1))
    for (i <- 2 until pts.length if !inside(c, pts(i))) {
      c = circle2(pts(0), pts(i))
      for (j <- 1 until i if !inside(c, pts(j))) {
        c = circle2(pts(i), pts(j))
        for (k <- 0 until j if !inside(c, pts(k))) {
          val c3 = circle3(pts(i), pts(j), pts(k))
          if (c3 != null) c = c3
        }
      }
    }
    c
  }

  /** ST_MinimumBoundingCircle: the circle rendered as the reference's JTS
    * path does — centre.buffer(radius) with 8 quadrant segments → a closed
    * 33-point polygon; a POINT for degenerate radius 0. */
  def minimumBoundingCircle(g: Geom): Geom = {
    val c = minCircle(g.xs, g.ys)
    if (c == null) return null
    val (cx, cy, r) = c
    if (r == 0.0) return Geom("POINT", Array(cx), Array(cy), Array(1))
    val n = 32
    val xs = new Array[Double](n + 1); val ys = new Array[Double](n + 1)
    for (k <- 0 until n) {
      val ang = 2.0 * math.Pi * k / n
      xs(k) = cx + r * math.cos(ang); ys(k) = cy + r * math.sin(ang)
    }
    xs(n) = xs(0); ys(n) = ys(0)
    Geom("POLYGON", xs, ys, Array(n + 1))
  }

  // ----------------------------------------------------------- polygonize

  /** Closed input rings → polygons with containment-nested holes: rings at
    * even nesting depth are shells, odd-depth rings become holes of their
    * innermost containing shell. Dangles (non-closed lines) are dropped the
    * way the reference's polygonizer drops them. */
  def polygonize(gs: Seq[Geom]): Geom = {
    val rings = gs.filter(g => g != null).flatMap(components).filter(closedLine)
    if (rings.isEmpty) return null
    def containsRing(outer: Geom, inner: Geom): Boolean =
      pointInRingArr(inner.xs(0), inner.ys(0), outer.xs, outer.ys, 0,
        outer.xs.length - 1) ||
      // vertex may sit on the boundary; try the ring's interior-ish midpoint
      pointInRingArr((inner.xs(0) + inner.xs(1)) / 2.0,
        (inner.ys(0) + inner.ys(1)) / 2.0, outer.xs, outer.ys, 0,
        outer.xs.length - 1)
    val depth = rings.map(r => rings.count(o => (o ne r) && containsRing(o, r)))
    val shells = rings.indices.filter(i => depth(i) % 2 == 0)
    val polys = shells.map { si =>
      val holes = rings.indices.filter { hi =>
        depth(hi) == depth(si) + 1 && containsRing(rings(si), rings(hi))
      }
      Geom("POLYGON",
        rings(si).xs ++ holes.flatMap(h => rings(h).xs),
        rings(si).ys ++ holes.flatMap(h => rings(h).ys),
        Array(rings(si).xs.length) ++ holes.map(h => -rings(h).xs.length))
    }
    if (polys.isEmpty) null
    else if (polys.length == 1) polys.head
    else Geom("MULTIPOLYGON", polys.flatMap(_.xs).toArray,
      polys.flatMap(_.ys).toArray, polys.flatMap(_.rings).toArray)
  }

  // ------------------------------------------------------------ line merge

  /** Merge MULTILINESTRING parts at degree-2 endpoints (the reference's JTS
    * LineMerger): chains are followed from non-joinable endpoints, each
    * segment used once. Single merged path → LINESTRING. */
  def lineMerge(g: Geom): Geom = {
    if (g.kind == "LINESTRING") return g
    if (g.kind != "MULTILINESTRING") return null
    val lines = components(g).toArray
    val used = new Array[Boolean](lines.length)
    type Pt = (Double, Double)
    def ends(i: Int): (Pt, Pt) = {
      val l = lines(i)
      ((l.xs(0), l.ys(0)), (l.xs(l.xs.length - 1), l.ys(l.ys.length - 1)))
    }
    val degree = scala.collection.mutable.HashMap[Pt, Int]().withDefaultValue(0)
    for (i <- lines.indices) {
      val (a, b) = ends(i)
      degree(a) += 1; degree(b) += 1
    }
    val out = scala.collection.mutable.ListBuffer[Geom]()
    for (start <- lines.indices if !used(start)) {
      // grow a chain from this line in both directions through degree-2 nodes
      var xs = lines(start).xs.toList
      var ys = lines(start).ys.toList
      used(start) = true
      var extended = true
      while (extended) {
        extended = false
        val head = (xs.head, ys.head); val tail = (xs.last, ys.last)
        for (j <- lines.indices if !used(j) && !extended) {
          val (a, b) = ends(j)
          if (tail == a && degree(tail) == 2) {
            xs = xs ++ lines(j).xs.toList.tail; ys = ys ++ lines(j).ys.toList.tail
            used(j) = true; extended = true
          } else if (tail == b && degree(tail) == 2) {
            xs = xs ++ lines(j).xs.reverse.toList.tail
            ys = ys ++ lines(j).ys.reverse.toList.tail
            used(j) = true; extended = true
          } else if (head == b && degree(head) == 2) {
            xs = lines(j).xs.toList.dropRight(1) ++ xs
            ys = lines(j).ys.toList.dropRight(1) ++ ys
            used(j) = true; extended = true
          } else if (head == a && degree(head) == 2) {
            xs = lines(j).xs.reverse.toList.dropRight(1) ++ xs
            ys = lines(j).ys.reverse.toList.dropRight(1) ++ ys
            used(j) = true; extended = true
          }
        }
      }
      out += Geom("LINESTRING", xs.toArray, ys.toArray, Array(xs.length))
    }
    if (out.length == 1) out.head
    else Geom("MULTILINESTRING", out.flatMap(_.xs).toArray,
      out.flatMap(_.ys).toArray, out.map(_.xs.length).toArray)
  }

  // -------------------------------------------------------- nearest points

  private def closestOnSeg(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
    val dx = bx - ax; val dy = by - ay
    val l2 = dx * dx + dy * dy
    val t = if (l2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
    (ax + t * dx, ay + t * dy)
  }

  /** geometry_nearest_points → the realizing pair (pa on A, pb on B).
    * Candidate set: every vertex of one side against every segment of the
    * other (the minimum of boundary-to-boundary distance is always
    * vertex-to-segment unless boundaries cross, where any crossing point
    * realizes 0). */
  def nearestPoints(a: Geom, b: Geom): (Geom, Geom) = {
    if (a == null || b == null || a.xs.isEmpty || b.xs.isEmpty) return null
    def segments(g: Geom): Array[(Double, Double, Double, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double)]()
      if (g.kind == "POINT" || g.kind == "MULTIPOINT")
        for (i <- g.xs.indices) out += ((g.xs(i), g.ys(i), g.xs(i), g.ys(i)))
      else for ((off, len, _) <- parts(g)) {
        val closeRing = g.kind == "POLYGON" || g.kind == "MULTIPOLYGON"
        val m = if (closeRing) len else len - 1
        for (i <- 0 until m) {
          val j = (i + 1) % len
          out += ((g.xs(off + i), g.ys(off + i), g.xs(off + j), g.ys(off + j)))
        }
      }
      out.toArray
    }
    val segA = segments(a); val segB = segments(b)
    var best = Double.PositiveInfinity
    var pa: (Double, Double) = null
    var pb: (Double, Double) = null
    for (sa <- segA; sb <- segB) {
      if (Wkt.segmentsCross(sa._1, sa._2, sa._3, sa._4, sb._1, sb._2, sb._3, sb._4)) {
        val denom = (sa._3 - sa._1) * (sb._4 - sb._2) - (sa._4 - sa._2) * (sb._3 - sb._1)
        val t = ((sb._1 - sa._1) * (sb._4 - sb._2) - (sb._2 - sa._2) * (sb._3 - sb._1)) / denom
        val ix = sa._1 + t * (sa._3 - sa._1); val iy = sa._2 + t * (sa._4 - sa._2)
        return (Geom("POINT", Array(ix), Array(iy), Array(1)),
          Geom("POINT", Array(ix), Array(iy), Array(1)))
      }
      // vertices of A against segment B and vice versa
      for ((px, py, qsx, qsy, qex, qey, aIsPoint) <- Seq(
        (sa._1, sa._2, sb._1, sb._2, sb._3, sb._4, true),
        (sa._3, sa._4, sb._1, sb._2, sb._3, sb._4, true),
        (sb._1, sb._2, sa._1, sa._2, sa._3, sa._4, false),
        (sb._3, sb._4, sa._1, sa._2, sa._3, sa._4, false))) {
        val (cx, cy) = closestOnSeg(px, py, qsx, qsy, qex, qey)
        val d = (px - cx) * (px - cx) + (py - cy) * (py - cy)
        if (d < best) {
          best = d
          if (aIsPoint) { pa = (px, py); pb = (cx, cy) }
          else { pa = (cx, cy); pb = (px, py) }
        }
      }
    }
    (Geom("POINT", Array(pa._1), Array(pa._2), Array(1)),
      Geom("POINT", Array(pb._1), Array(pb._2), Array(1)))
  }

  // -------------------------------------------------------------- polyline

  /** Google encoded-polyline (precision 1e-5, the reference's
    * EncodedPolylineFunctions.java): x = longitude, y = latitude. */
  def toEncodedPolyline(g: Geom): String = {
    if (g.kind != "LINESTRING" && g.kind != "MULTIPOINT") return null
    val sb = new StringBuilder
    var prevLat = 0L; var prevLng = 0L
    def enc(v: Long): Unit = {
      var u = v << 1
      if (v < 0) u = ~u
      while (u >= 0x20) {
        sb.append(((0x20 | (u & 0x1f)) + 63).toChar)
        u >>= 5
      }
      sb.append((u + 63).toChar)
    }
    for (i <- g.xs.indices) {
      val lat = math.round(g.ys(i) * 1e5)
      val lng = math.round(g.xs(i) * 1e5)
      enc(lat - prevLat); enc(lng - prevLng)
      prevLat = lat; prevLng = lng
    }
    sb.toString
  }

  def fromEncodedPolyline(s: String): Geom = {
    val xs = scala.collection.mutable.ArrayBuffer[Double]()
    val ys = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    var lat = 0L; var lng = 0L
    def dec(): Long = {
      var result = 0L; var shift = 0
      var b = 0x20
      while (b >= 0x20) {
        if (i >= s.length) return Long.MinValue
        b = s.charAt(i) - 63
        i += 1
        result |= (b & 0x1f).toLong << shift
        shift += 5
      }
      if ((result & 1) != 0) ~(result >> 1) else result >> 1
    }
    while (i < s.length) {
      val dLat = dec(); if (dLat == Long.MinValue) return null
      val dLng = dec(); if (dLng == Long.MinValue) return null
      lat += dLat; lng += dLng
      xs += lng / 1e5; ys += lat / 1e5
    }
    if (xs.length < 2) null
    else Geom("LINESTRING", xs.toArray, ys.toArray, Array(xs.length))
  }

  // ------------------------------------------------------------------- KML

  /** Minimal OGC KML subset (reference ST_GeomFromKML:595): Point /
    * LineString / Polygon with <coordinates> "lon,lat[,alt]" whitespace
    * lists; altitude dropped (2D model). Anything else → null. */
  def fromKml(kml: String): Geom = {
    def coordsOf(block: String): (Array[Double], Array[Double]) = {
      val m = "(?s)<coordinates>(.*?)</coordinates>".r.findFirstMatchIn(block)
      if (m.isEmpty) return null
      val toks = m.get.group(1).trim.split("\\s+").filter(_.nonEmpty)
      val xs = new Array[Double](toks.length); val ys = new Array[Double](toks.length)
      for (i <- toks.indices) {
        val p = toks(i).split(",")
        if (p.length < 2) return null
        try { xs(i) = p(0).toDouble; ys(i) = p(1).toDouble }
        catch { case _: NumberFormatException => return null }
      }
      (xs, ys)
    }
    val t = kml.trim
    if (t.contains("<Point")) {
      val c = coordsOf(t)
      if (c == null || c._1.length != 1) null
      else Geom("POINT", c._1, c._2, Array(1))
    } else if (t.contains("<LineString")) {
      val c = coordsOf(t)
      if (c == null || c._1.length < 2) null
      else Geom("LINESTRING", c._1, c._2, Array(c._1.length))
    } else if (t.contains("<Polygon")) {
      val outer = "(?s)<outerBoundaryIs>(.*?)</outerBoundaryIs>".r.findFirstMatchIn(t)
      if (outer.isEmpty) return null
      val shell = coordsOf(outer.get.group(1))
      if (shell == null || shell._1.length < 4) return null
      val holes = "(?s)<innerBoundaryIs>(.*?)</innerBoundaryIs>".r
        .findAllMatchIn(t).map(m => coordsOf(m.group(1))).toList
      if (holes.contains(null)) return null
      Geom("POLYGON",
        shell._1 ++ holes.flatMap(_._1),
        shell._2 ++ holes.flatMap(_._2),
        Array(shell._1.length) ++ holes.map(h => -h._1.length))
    } else null
  }

  /** line_interpolate_points(line, step): points at step, 2·step, … ≤ 1
    * (GeoFunctions.java:974). */
  def interpolatePoints(line: Geom, step: Double): List[Geom] = {
    if (line.kind != "LINESTRING" || step.isNaN || step <= 0 || step > 1) return null
    val n = line.xs.length
    var total = 0.0
    for (i <- 0 until n - 1)
      total += math.hypot(line.xs(i + 1) - line.xs(i), line.ys(i + 1) - line.ys(i))
    val ks = Iterator.from(1).map(_ * step).takeWhile(_ <= 1.0 + 1e-14).toList
    ks.map { f =>
      var target = math.min(f, 1.0) * total
      var res: Geom = null
      var i = 0
      while (res == null && i < n - 1) {
        val dx = line.xs(i + 1) - line.xs(i); val dy = line.ys(i + 1) - line.ys(i)
        val len = math.hypot(dx, dy)
        if (target <= len && len > 0) {
          val t = target / len
          res = Geom("POINT", Array(line.xs(i) + t * dx), Array(line.ys(i) + t * dy), Array(1))
        }
        target -= len
        i += 1
      }
      if (res == null)
        res = Geom("POINT", Array(line.xs(n - 1)), Array(line.ys(n - 1)), Array(1))
      res
    }
  }
}
