package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geometry breadth step 4 (reference GeoFunctions.java ST_VoronoiPolygons
  * :1646 and ST_Relate :1938).
  *
  *  - ST_VoronoiPolygons: each input point's cell is the intersection of
  *    the half-planes closer to it than to every other point
  *    (Sutherland–Hodgman clipping, O(n²) — the textbook construction the
  *    JTS incremental builder optimizes), clipped to the input's bounding
  *    box. DOCUMENTED DEVIATION: JTS clips to an EXPANDED envelope; the
  *    tight bbox keeps every clip coordinate an exact midline for integer
  *    fixtures, so cell areas are oracle-checkable. Cells come back as a
  *    MULTIPOLYGON in input point order (the reference returns a
  *    GeometryCollection, a kind this model does not have).
  *  - ST_Relate(a, b, pattern): DE-9IM matrix computed for the supported
  *    operand classes — point/point, point/single-ring polygon, and
  *    single-ring polygon pairs in generic position (boundaries disjoint,
  *    properly crossing, or point-touching) — matched against the
  *    T, F, 0, 1, 2, star pattern language. Unsupported operand combos →
  *    NULL, never a guessed matrix. */
object GeoOps4 {
  import Wkt.Geom
  import GeoOps.pointInRingArr

  // ------------------------------------------------------------- voronoi

  /** Clip convex polygon (xs, ys open ring) by half-plane f(x,y) ≤ 0 where
    * f = nx·(x−mx) + ny·(y−my). */
  private def clipHalfPlane(xs: Array[Double], ys: Array[Double],
      nx: Double, ny: Double, mx: Double, my: Double): (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n == 0) return (xs, ys)
    val ox = scala.collection.mutable.ArrayBuffer[Double]()
    val oy = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val fs = nx * (xs(i) - mx) + ny * (ys(i) - my)
      val fe = nx * (xs(j) - mx) + ny * (ys(j) - my)
      if (fs <= 0) { ox += xs(i); oy += ys(i) }
      if ((fs < 0 && fe > 0) || (fs > 0 && fe < 0)) {
        val t = fs / (fs - fe)
        ox += xs(i) + t * (xs(j) - xs(i))
        oy += ys(i) + t * (ys(j) - ys(i))
      }
      i += 1
    }
    (ox.toArray, oy.toArray)
  }

  def voronoi(g: Geom): Geom = {
    if (g.kind != "MULTIPOINT" && g.kind != "POINT") return null
    val pts = g.xs.indices.map(i => (g.xs(i), g.ys(i))).distinct
    if (pts.length < 2) return null
    val xmin = pts.map(_._1).min; val xmax = pts.map(_._1).max
    val ymin = pts.map(_._2).min; val ymax = pts.map(_._2).max
    if (xmin == xmax || ymin == ymax) return null // degenerate envelope
    val cells = pts.map { case (px, py) =>
      var xs = Array(xmin, xmax, xmax, xmin)
      var ys = Array(ymin, ymin, ymax, ymax)
      for ((qx, qy) <- pts if (qx, qy) != ((px, py))) {
        val r = clipHalfPlane(xs, ys, qx - px, qy - py,
          (px + qx) / 2.0, (py + qy) / 2.0)
        xs = r._1; ys = r._2
      }
      if (xs.length < 3) return null // numeric degeneracy — refuse loudly
      // close the ring, CCW
      var area = 0.0
      for (i <- xs.indices) {
        val j = (i + 1) % xs.length
        area += xs(i) * ys(j) - xs(j) * ys(i)
      }
      val (cx, cy) = if (area >= 0) (xs, ys) else (xs.reverse, ys.reverse)
      (cx :+ cx(0), cy :+ cy(0))
    }
    Geom("MULTIPOLYGON", cells.flatMap(_._1).toArray, cells.flatMap(_._2).toArray,
      cells.map(_._1.length).toArray)
  }

  // -------------------------------------------------------------- relate

  private def singleRing(g: Geom): Boolean =
    g.kind == "POLYGON" && g.rings.length == 1

  private def openRing(g: Geom): (Array[Double], Array[Double]) = {
    val len = math.abs(g.rings(0))
    val closed = len > 1 && g.xs(0) == g.xs(len - 1) && g.ys(0) == g.ys(len - 1)
    val n = if (closed) len - 1 else len
    (g.xs.take(n), g.ys.take(n))
  }

  private def anyProperCross(a: Geom, b: Geom): Boolean = {
    val (ax, ay) = openRing(a); val (bx, by) = openRing(b)
    for (i <- ax.indices; j <- bx.indices) {
      val i2 = (i + 1) % ax.length; val j2 = (j + 1) % bx.length
      if (Wkt.segmentsCross(ax(i), ay(i), ax(i2), ay(i2),
        bx(j), by(j), bx(j2), by(j2))) return true
    }
    false
  }

  /** DE-9IM row-major matrix [II IB IE / BI BB BE / EI EB EE] for the
    * supported classes, or null. */
  def relateMatrix(a: Geom, b: Geom): String = {
    if (a == null || b == null) return null
    (a.kind, b.kind) match {
      case ("POINT", "POINT") =>
        if (a.xs(0) == b.xs(0) && a.ys(0) == b.ys(0)) "0FFFFFFF2" else "FF0FFF0F2"
      case ("POINT", _) if singleRing(b) =>
        val (bx, by) = openRing(b)
        if (pointInRingArr(a.xs(0), a.ys(0), bx, by, 0, bx.length))
          "0FFFFF212" else "FF0FFF212"
      case (_, "POINT") if singleRing(a) =>
        transpose(relateMatrix(b, a))
      case _ if singleRing(a) && singleRing(b) =>
        val eq = GeoRelations.geomEquals(a, b)
        if (eq == true) return "2FFF1FFF2"
        val dist = GeoOps.distance(a, b)
        val crossing = anyProperCross(a, b)
        val meet = GeoOps.intersection(a, b) != null
        val (ax, ay) = openRing(a); val (bx, by) = openRing(b)
        val aInB = ax.indices.forall(i => pointInRingArr(ax(i), ay(i), bx, by, 0, bx.length))
        val bInA = bx.indices.forall(i => pointInRingArr(bx(i), by(i), ax, ay, 0, ax.length))
        if (dist > 0) "FF2FF1212"
        else if (crossing) "212101212"
        else if (aInB && !crossing) "2FF1FF212"
        else if (bInA && !crossing) "212FF1FF2"
        else if (!meet) "FF2F01212" // boundary point-contact, generic touch
        else null // degenerate contact outside the supported classes
      case _ => null
    }
  }

  private def transpose(m: String): String =
    if (m == null) null
    else new String(Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))

  /** Pattern language: T = non-F, F = F, 0/1/2 exact, * = anything. */
  def matches(matrix: String, pattern: String): Any = {
    if (matrix == null) return null
    if (pattern.length != 9) return null
    matrix.zip(pattern).forall {
      case (_, '*') => true
      case (c, 'T') => c != 'F'
      case (c, 'F') => c == 'F'
      case (c, p) => c == p
    }
  }
}

/** ST_VoronoiPolygons(geom) → MULTIPOLYGON of cells. */
case class GeomVoronoi(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_voronoipolygons expects a geometry")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_voronoipolygons"
  override def nullSafeEval(g0: Any): Any =
    GeoOps.toRow(GeoOps4.voronoi(GeoOps.fromRow(g0.asInstanceOf[InternalRow])))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_Relate(a, b, pattern) → boolean (GeoFunctions.java:1938). */
case class GeomRelate(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == Wkt.geometryType && second.dataType == Wkt.geometryType &&
      third.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_relate expects (geometry, geometry, string)")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_relate"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    GeoOps4.matches(
      GeoOps4.relateMatrix(
        GeoOps.fromRow(a.asInstanceOf[InternalRow]),
        GeoOps.fromRow(b.asInstanceOf[InternalRow])),
      p.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(first = a, second = b, third = c)
}
