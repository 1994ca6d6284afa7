package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WKT geometry text I/O and polygon-polygon predicates (SURVEY.md §2.8;
  * reference: plugin/trino-geospatial/src/main/java/io/trino/plugin/geospatial/
  * GeoFunctions.java — ST_GeometryFromText:123, ST_AsText, ST_Intersects,
  * ST_Within, ST_Centroid, ST_NumGeometries, ST_NumInteriorRing).
  *
  * Geometry runtime value: struct<kind: string, xs: array<double>,
  * ys: array<double>, rings: array<int>> — a flat coordinate store plus
  * signed ring lengths: a positive length opens a new part (LINESTRING
  * part, polygon SHELL), a negative length is a HOLE of the preceding
  * shell. This covers POINT, LINESTRING, POLYGON (with interior rings),
  * MULTIPOINT, MULTILINESTRING, and MULTIPOLYGON with one columnar layout —
  * the same flattening the reference's ESRI serializer uses for its
  * path/ring arrays. Malformed/unsupported text → NULL (the reference
  * throws; NULL keeps the function TRY-compatible).
  *
  * ST_AsText renders coordinates with Java's shortest-roundtrip double
  * formatting, which matches DuckDB's VARCHAR cast for the dyadic fractions
  * the oracles build — so format(parse(wkt)) == wkt is hash-checkable.
  *
  * Measures over the ringed model: area = Σ shells − Σ holes (shoelace);
  * perimeter counts every ring boundary; contains = in a shell and not in
  * one of its holes; centroid = signed-area-weighted ring centroids
  * (length-weighted midpoints for linestrings). All pure double kernels —
  * exact for the dyadic-coordinate oracle fixtures.
  *
  * Predicates (simple single-ring polygons, the planar core of the
  * reference's ESRI delegation):
  *  - intersects: any vertex containment either way, or any proper edge
  *    crossing (orientation tests).
  *  - within(a, b): every vertex of a inside b and no edge crossing.
  * Boundary classification follows the exact IEEE comparisons of the
  * underlying kernels; oracle queries keep test data off boundaries.
  */
object Wkt {

  val geometryType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ys", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("rings", ArrayType(IntegerType, containsNull = false), nullable = false)))

  final case class Geom(kind: String, xs: Array[Double], ys: Array[Double], rings: Array[Int])

  private val Outer =
    """(?is)^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|GEOMETRYCOLLECTION)\s*\((.*)\)\s*$""".r

  // GEOMETRYCOLLECTION rings layout: [N, then per part: typeCode
  // (1=POINT, 2=LINESTRING, 3=POLYGON, 4=MULTIPOINT, 5=MULTILINESTRING,
  // 6=MULTIPOLYGON, 7=nested GEOMETRYCOLLECTION), ring-array length, the
  // part's rings array verbatim (for code 7 that is itself a nested
  // layout)] — readable only by kind-aware code; every kernel dispatches
  // on kind first, so non-GC code never sees it.
  private val GcTypeCode = Map(
    "POINT" -> 1, "LINESTRING" -> 2, "POLYGON" -> 3,
    "MULTIPOINT" -> 4, "MULTILINESTRING" -> 5, "MULTIPOLYGON" -> 6,
    "GEOMETRYCOLLECTION" -> 7)
  private val GcTypeName = GcTypeCode.map(_.swap)

  /** Coordinates a geometry's rings array accounts for (recursive for the
    * collection layout, where rings is a mixed type/length stream). */
  private def coordTotal(kind: String, rings: Array[Int]): Int =
    if (kind != "GEOMETRYCOLLECTION") rings.map(math.abs).sum
    else {
      var i = 1
      var tot = 0
      while (i < rings.length) {
        val k = GcTypeName(rings(i))
        val nr = rings(i + 1)
        tot += coordTotal(k, java.util.Arrays.copyOfRange(rings, i + 2, i + 2 + nr))
        i += 2 + nr
      }
      tot
    }

  /** Build a GEOMETRYCOLLECTION from members of ANY kind, including MULTI
    * geometries and nested collections. */
  def gcBuild(parts: Seq[Geom]): Geom = {
    if (parts.isEmpty || parts.exists(p => p == null || !GcTypeCode.contains(p.kind)))
      return null
    val rings = scala.collection.mutable.ArrayBuffer[Int](parts.length)
    parts.foreach { p =>
      rings += GcTypeCode(p.kind)
      rings += p.rings.length
      rings ++= p.rings
    }
    Geom("GEOMETRYCOLLECTION", parts.flatMap(_.xs).toArray,
      parts.flatMap(_.ys).toArray, rings.toArray)
  }

  /** Decode a GEOMETRYCOLLECTION into its member geometries (one level;
    * nested members come back as collections to recurse into). */
  def gcParts(g: Geom): Seq[Geom] = {
    require(g.kind == "GEOMETRYCOLLECTION", s"not a collection: ${g.kind}")
    val out = scala.collection.mutable.ArrayBuffer[Geom]()
    var i = 1 // rings(0) = member count
    var off = 0
    while (i < g.rings.length) {
      val kind = GcTypeName(g.rings(i))
      val nr = g.rings(i + 1)
      val lens = java.util.Arrays.copyOfRange(g.rings, i + 2, i + 2 + nr)
      val total = coordTotal(kind, lens)
      out += Geom(kind,
        java.util.Arrays.copyOfRange(g.xs, off, off + total),
        java.util.Arrays.copyOfRange(g.ys, off, off + total), lens)
      off += total
      i += 2 + nr
    }
    out.toSeq
  }

  /** Split on commas at paren depth 0. */
  private def splitTop(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).toArray
  }

  private def unparen(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else null
  }

  /** "x y, x y, …" → (xs, ys) or null. */
  private def coords(body: String): (Array[Double], Array[Double]) = {
    val pairs = body.split(",").map(_.trim).filter(_.nonEmpty)
    val xs = new Array[Double](pairs.length)
    val ys = new Array[Double](pairs.length)
    var i = 0
    while (i < pairs.length) {
      val parts = pairs(i).split("\\s+")
      if (parts.length != 2) return null
      try { xs(i) = parts(0).toDouble; ys(i) = parts(1).toDouble }
      catch { case _: NumberFormatException => return null }
      i += 1
    }
    (xs, ys)
  }

  /** Parse WKT into the ringed model, or null for unsupported/malformed. */
  def parse(wkt: String): Geom = {
    def rings(parts: Seq[(String, Int)]): Geom = { // (coord body, sign) per ring
      val bx = scala.collection.mutable.ArrayBuffer[Double]()
      val by = scala.collection.mutable.ArrayBuffer[Double]()
      val lens = scala.collection.mutable.ArrayBuffer[Int]()
      parts.foreach { case (body, sign) =>
        val c = coords(body)
        if (c == null || c._1.length < 3) return null
        bx ++= c._1; by ++= c._2; lens += sign * c._1.length
      }
      Geom("", bx.toArray, by.toArray, lens.toArray)
    }
    wkt match {
      case Outer(kind, body) => kind.toUpperCase match {
        case "POINT" =>
          val c = coords(body)
          if (c == null || c._1.length != 1) null
          else Geom("POINT", c._1, c._2, Array(1))
        case "LINESTRING" =>
          val c = coords(body)
          if (c == null || c._1.length < 2) null
          else Geom("LINESTRING", c._1, c._2, Array(c._1.length))
        case "MULTIPOINT" =>
          // accepts both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
          val parts = splitTop(body).map(p => if (p.startsWith("(")) unparen(p) else p)
          if (parts.contains(null)) return null
          val cs = parts.map(coords)
          if (cs.exists(c => c == null || c._1.length != 1)) null
          else Geom("MULTIPOINT", cs.flatMap(_._1), cs.flatMap(_._2), cs.map(_ => 1))
        case "MULTILINESTRING" =>
          val parts = splitTop(body).map(unparen)
          if (parts.contains(null)) return null
          val cs = parts.map(coords)
          if (cs.exists(c => c == null || c._1.length < 2)) null
          else Geom("MULTILINESTRING", cs.flatMap(_._1), cs.flatMap(_._2), cs.map(_._1.length))
        case "POLYGON" =>
          val parts = splitTop(body).map(unparen)
          if (parts.contains(null) || parts.isEmpty) return null
          val g = rings(parts.zipWithIndex.map { case (p, i) => (p, if (i == 0) 1 else -1) }.toSeq)
          if (g == null) null else g.copy(kind = "POLYGON")
        case "MULTIPOLYGON" =>
          val polys = splitTop(body).map(unparen)
          if (polys.contains(null) || polys.isEmpty) return null
          val flat = scala.collection.mutable.ArrayBuffer[(String, Int)]()
          polys.foreach { poly =>
            val parts = splitTop(poly).map(unparen)
            if (parts.contains(null) || parts.isEmpty) return null
            parts.zipWithIndex.foreach { case (p, i) => flat += ((p, if (i == 0) 1 else -1)) }
          }
          val g = rings(flat.toSeq)
          if (g == null) null else g.copy(kind = "MULTIPOLYGON")
        case "GEOMETRYCOLLECTION" =>
          // each top-level element is itself full WKT — including MULTI
          // members and nested collections (parse recursion handles them);
          // "GEOMETRYCOLLECTION EMPTY" has no Outer match and stays null
          val parts = splitTop(body).map(parse)
          if (parts.contains(null)) null else gcBuild(parts.toSeq)
      }
      case _ => null
    }
  }

  def format(kind: String, xs: Array[Double], ys: Array[Double], rings: Array[Int]): String = {
    var off = 0
    def ring(len: Int): String = {
      val body = (off until off + len).map(i => s"${xs(i)} ${ys(i)}").mkString(", ")
      off += len
      body
    }
    kind.toUpperCase match {
      case "POINT" => s"POINT (${ring(1)})"
      case "LINESTRING" => s"LINESTRING (${ring(xs.length)})"
      case "MULTIPOINT" => s"MULTIPOINT (${rings.map(_ => ring(1)).mkString(", ")})"
      case "MULTILINESTRING" =>
        s"MULTILINESTRING (${rings.map(l => s"(${ring(l)})").mkString(", ")})"
      case "POLYGON" =>
        s"POLYGON (${rings.map(l => s"(${ring(math.abs(l))})").mkString(", ")})"
      case "MULTIPOLYGON" =>
        val sb = new StringBuilder
        var first = true
        var i = 0
        while (i < rings.length) {
          if (rings(i) > 0) {
            if (!first) sb.append(", ")
            first = false
            sb.append("((").append(ring(rings(i)))
            while (i + 1 < rings.length && rings(i + 1) < 0) {
              i += 1
              sb.append("), (").append(ring(-rings(i)))
            }
            sb.append("))")
          }
          i += 1
        }
        s"MULTIPOLYGON ($sb)"
      case "GEOMETRYCOLLECTION" =>
        val g = Geom("GEOMETRYCOLLECTION", xs, ys, rings)
        "GEOMETRYCOLLECTION (" + gcParts(g).map(p =>
          format(p.kind, p.xs, p.ys, p.rings)).mkString(", ") + ")"
      case k => s"$k (${ring(xs.length)})"
    }
  }

  // ---------------------------------------------------- ring-aware measures

  private def signedRingArea(xs: ArrayData, ys: ArrayData, off: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val j = (i + 1) % len
      acc += xs.getDouble(off + i) * ys.getDouble(off + j) -
        xs.getDouble(off + j) * ys.getDouble(off + i)
      i += 1
    }
    acc / 2.0
  }

  private def ringPerimeter(xs: ArrayData, ys: ArrayData, off: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val j = (i + 1) % len
      val dx = xs.getDouble(off + j) - xs.getDouble(off + i)
      val dy = ys.getDouble(off + j) - ys.getDouble(off + i)
      acc += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    acc
  }

  private def pathLength(xs: ArrayData, ys: ArrayData, off: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len - 1) {
      val dx = xs.getDouble(off + i + 1) - xs.getDouble(off + i)
      val dy = ys.getDouble(off + i + 1) - ys.getDouble(off + i)
      acc += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    acc
  }

  private def pointInRing(px: Double, py: Double,
      xs: ArrayData, ys: ArrayData, off: Int, len: Int): Boolean = {
    var in = false
    var i = 0
    var j = len - 1
    while (i < len) {
      val xi = xs.getDouble(off + i); val yi = ys.getDouble(off + i)
      val xj = xs.getDouble(off + j); val yj = ys.getDouble(off + j)
      if (((yi > py) != (yj > py)) &&
        (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) in = !in
      j = i
      i += 1
    }
    in
  }

  private def eachRing[A](rings: ArrayData)(f: (Int, Int, Boolean) => Unit): Unit = {
    var off = 0
    var i = 0
    while (i < rings.numElements()) {
      val len = rings.getInt(i)
      f(off, math.abs(len), len > 0)
      off += math.abs(len)
      i += 1
    }
  }

  def gArea(kind: String, xs: ArrayData, ys: ArrayData, rings: ArrayData): Double =
    kind match {
      case "POLYGON" | "MULTIPOLYGON" =>
        var acc = 0.0
        eachRing(rings) { (off, len, shell) =>
          val a = math.abs(signedRingArea(xs, ys, off, len))
          acc += (if (shell) a else -a)
        }
        acc
      case "GEOMETRYCOLLECTION" =>
        gcParts(Geom(kind,
          Array.tabulate(xs.numElements())(xs.getDouble),
          Array.tabulate(ys.numElements())(ys.getDouble),
          Array.tabulate(rings.numElements())(rings.getInt)))
          .map(p => gArea(p.kind, new GenericArrayData(p.xs),
            new GenericArrayData(p.ys), new GenericArrayData(p.rings))).sum
      case _ => 0.0
    }

  def gPerimeter(kind: String, xs: ArrayData, ys: ArrayData, rings: ArrayData): Double =
    kind match {
      case "POLYGON" | "MULTIPOLYGON" =>
        var acc = 0.0
        eachRing(rings) { (off, len, _) => acc += ringPerimeter(xs, ys, off, len) }
        acc
      case "GEOMETRYCOLLECTION" =>
        gcParts(Geom(kind,
          Array.tabulate(xs.numElements())(xs.getDouble),
          Array.tabulate(ys.numElements())(ys.getDouble),
          Array.tabulate(rings.numElements())(rings.getInt)))
          .map(p => gPerimeter(p.kind, new GenericArrayData(p.xs),
            new GenericArrayData(p.ys), new GenericArrayData(p.rings))).sum
      case _ => 0.0
    }

  def gLength(kind: String, xs: ArrayData, ys: ArrayData, rings: ArrayData): Double =
    kind match {
      case "LINESTRING" | "MULTILINESTRING" =>
        var acc = 0.0
        eachRing(rings) { (off, len, _) => acc += pathLength(xs, ys, off, len) }
        acc
      case "GEOMETRYCOLLECTION" =>
        gcParts(Geom(kind,
          Array.tabulate(xs.numElements())(xs.getDouble),
          Array.tabulate(ys.numElements())(ys.getDouble),
          Array.tabulate(rings.numElements())(rings.getInt)))
          .map(p => gLength(p.kind, new GenericArrayData(p.xs),
            new GenericArrayData(p.ys), new GenericArrayData(p.rings))).sum
      case _ => 0.0
    }

  /** Point-in-geometry over shells minus their holes. */
  def gContains(kind: String, xs: ArrayData, ys: ArrayData, rings: ArrayData,
      px: Double, py: Double): Boolean = {
    if (kind != "POLYGON" && kind != "MULTIPOLYGON") return false
    var inShell = false  // point is inside the currently-open shell
    var result = false
    eachRing(rings) { (off, len, shell) =>
      if (shell) {
        inShell = pointInRing(px, py, xs, ys, off, len)
        if (inShell) result = true
      } else if (inShell && pointInRing(px, py, xs, ys, off, len)) {
        result = false
        inShell = false // a hole swallowed it; later shells may still claim it
      }
    }
    result
  }

  /** Signed-area-weighted centroid; (cx, cy). Linestrings use length-weighted
    * segment midpoints; points average. Degenerate (zero measure) → NaN. */
  def gCentroid(kind: String, xs: ArrayData, ys: ArrayData, rings: ArrayData): (Double, Double) =
    kind match {
      case "POLYGON" | "MULTIPOLYGON" =>
        var wx = 0.0; var wy = 0.0; var wa = 0.0
        eachRing(rings) { (off, len, shell) =>
          val aSigned = signedRingArea(xs, ys, off, len)
          val a = math.abs(aSigned)
          if (a > 0.0) {
            var cx = 0.0; var cy = 0.0
            var i = 0
            while (i < len) {
              val j = (i + 1) % len
              val cross = xs.getDouble(off + i) * ys.getDouble(off + j) -
                xs.getDouble(off + j) * ys.getDouble(off + i)
              cx += (xs.getDouble(off + i) + xs.getDouble(off + j)) * cross
              cy += (ys.getDouble(off + i) + ys.getDouble(off + j)) * cross
              i += 1
            }
            cx = cx / (6.0 * aSigned)
            cy = cy / (6.0 * aSigned)
            val w = if (shell) a else -a
            wx += w * cx; wy += w * cy; wa += w
          }
        }
        (wx / wa, wy / wa)
      case "LINESTRING" | "MULTILINESTRING" =>
        var wx = 0.0; var wy = 0.0; var wl = 0.0
        eachRing(rings) { (off, len, _) =>
          var i = 0
          while (i < len - 1) {
            val dx = xs.getDouble(off + i + 1) - xs.getDouble(off + i)
            val dy = ys.getDouble(off + i + 1) - ys.getDouble(off + i)
            val l = math.sqrt(dx * dx + dy * dy)
            wx += l * (xs.getDouble(off + i) + xs.getDouble(off + i + 1)) / 2.0
            wy += l * (ys.getDouble(off + i) + ys.getDouble(off + i + 1)) / 2.0
            wl += l
            i += 1
          }
        }
        (wx / wl, wy / wl)
      case _ =>
        val n = xs.numElements()
        var sx = 0.0; var sy = 0.0
        var i = 0
        while (i < n) { sx += xs.getDouble(i); sy += ys.getDouble(i); i += 1 }
        (sx / n, sy / n)
    }

  def gNumGeometries(kind: String, rings: ArrayData): Int = kind match {
    case "POLYGON" | "LINESTRING" | "POINT" => 1
    case "GEOMETRYCOLLECTION" => rings.getInt(0)
    case "MULTIPOLYGON" =>
      var n = 0
      var i = 0
      while (i < rings.numElements()) { if (rings.getInt(i) > 0) n += 1; i += 1 }
      n
    case _ => rings.numElements()
  }

  def gNumInteriorRing(kind: String, rings: ArrayData): Int = {
    var n = 0
    var i = 0
    while (i < rings.numElements()) { if (rings.getInt(i) < 0) n += 1; i += 1 }
    n
  }

  // ------------------------------------------------ polygon-polygon predicates

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Proper segment crossing (shared endpoints/collinear touch excluded —
    * oracle data stays off these measure-zero cases). */
  def segmentsCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val d1 = orient(cx, cy, dx, dy, ax, ay)
    val d2 = orient(cx, cy, dx, dy, bx, by)
    val d3 = orient(ax, ay, bx, by, cx, cy)
    val d4 = orient(ax, ay, bx, by, dx, dy)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  private def anyEdgeCross(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData): Boolean = {
    val n = math.min(xa.numElements(), ya.numElements())
    val m = math.min(xb.numElements(), yb.numElements())
    var i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      var j = 0
      while (j < m) {
        val j2 = (j + 1) % m
        if (segmentsCross(
          xa.getDouble(i), ya.getDouble(i), xa.getDouble(i2), ya.getDouble(i2),
          xb.getDouble(j), yb.getDouble(j), xb.getDouble(j2), yb.getDouble(j2))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def allVerticesIn(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData): Boolean = {
    val n = math.min(xa.numElements(), ya.numElements())
    var i = 0
    while (i < n) {
      if (!GeoPolygon.contains(xa.getDouble(i), ya.getDouble(i), xb, yb)) return false
      i += 1
    }
    true
  }

  private def anyVertexIn(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData): Boolean = {
    val n = math.min(xa.numElements(), ya.numElements())
    var i = 0
    while (i < n) {
      if (GeoPolygon.contains(xa.getDouble(i), ya.getDouble(i), xb, yb)) return true
      i += 1
    }
    false
  }

  /** ST_Length of an open path (LINESTRING): Σ segment lengths, no closing
    * edge — the open-path counterpart of GeoPolygon.perimeter. */
  def length(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = xs.getDouble(i + 1) - xs.getDouble(i)
      val dy = ys.getDouble(i + 1) - ys.getDouble(i)
      acc += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    acc
  }

  def intersects(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData): Boolean =
    anyVertexIn(xa, ya, xb, yb) || anyVertexIn(xb, yb, xa, ya) ||
      anyEdgeCross(xa, ya, xb, yb)

  def within(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData): Boolean =
    allVerticesIn(xa, ya, xb, yb) && !anyEdgeCross(xa, ya, xb, yb)
}

/** ST_GeometryFromText(wkt) → geometry struct (NULL on unsupported WKT). */
case class WktParse(child: Expression) extends UnaryExpression with CodegenFallback {
  // malformed WKT yields null for a non-null input: the optimizer must not
  // fold IS NULL checks via Spark 4's default UnaryExpression null-intolerance
  // nor assume nullability from the child
  override def nullIntolerant: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires VARCHAR, got ${other.simpleString}")
  }
  override def dataType: DataType = Wkt.geometryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geometry_from_text"
  override def nullSafeEval(input: Any): Any = {
    val parsed = Wkt.parse(input.asInstanceOf[UTF8String].toString)
    if (parsed == null) null
    else InternalRow(
      UTF8String.fromString(parsed.kind),
      new GenericArrayData(parsed.xs),
      new GenericArrayData(parsed.ys),
      new GenericArrayData(parsed.rings))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_AsText(geometry struct) → canonical WKT. */
case class WktFormat(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 4 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a geometry struct, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "st_as_text"
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val xs = row.getArray(1)
    val ys = row.getArray(2)
    val rings = row.getArray(3)
    UTF8String.fromString(Wkt.format(
      row.getUTF8String(0).toString,
      Array.tabulate(xs.numElements())(xs.getDouble),
      Array.tabulate(ys.numElements())(ys.getDouble),
      Array.tabulate(rings.numElements())(rings.getInt)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared base for scalar measures over the geometry struct. */
private[ext] abstract class GeomUnary extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 4 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a geometry struct, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
  protected def geom(input: Any): (String, ArrayData, ArrayData, ArrayData) = {
    val row = input.asInstanceOf[InternalRow]
    (row.getUTF8String(0).toString, row.getArray(1), row.getArray(2), row.getArray(3))
  }
}

/** ST_Area over the ringed geometry (shells − holes; reference
  * GeoFunctions.java stArea). */
case class GeomArea(child: Expression) extends GeomUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_geom_area"
  override def nullSafeEval(input: Any): Any = {
    val (k, xs, ys, rings) = geom(input); Wkt.gArea(k, xs, ys, rings)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** ST_Perimeter over every ring boundary. */
case class GeomPerimeter(child: Expression) extends GeomUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_geom_perimeter"
  override def nullSafeEval(input: Any): Any = {
    val (k, xs, ys, rings) = geom(input); Wkt.gPerimeter(k, xs, ys, rings)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** ST_Length over LINESTRING / MULTILINESTRING parts. */
case class GeomLength(child: Expression) extends GeomUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_geom_length"
  override def nullSafeEval(input: Any): Any = {
    val (k, xs, ys, rings) = geom(input); Wkt.gLength(k, xs, ys, rings)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** ST_Centroid x/y (exposed as scalars — oracle results stay flat). */
case class GeomCentroid(child: Expression, ordinate: Int) extends GeomUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (ordinate == 0) "st_centroid_x" else "st_centroid_y"
  override def nullSafeEval(input: Any): Any = {
    val (k, xs, ys, rings) = geom(input)
    val c = Wkt.gCentroid(k, xs, ys, rings)
    val v = if (ordinate == 0) c._1 else c._2
    if (v.isNaN) null else v
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_XMin/ST_XMax/ST_YMin/ST_YMax (envelope corners; reference
  * GeoFunctions.java stXMin family). */
case class GeomEnvelopeBound(child: Expression, xAxis: Boolean, isMin: Boolean)
    extends GeomUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String =
    s"st_${if (xAxis) "x" else "y"}_${if (isMin) "min" else "max"}"
  override def nullSafeEval(input: Any): Any = {
    val (_, xs, ys, _) = geom(input)
    val arr = if (xAxis) xs else ys
    val n = arr.numElements()
    if (n == 0) null
    else {
      var acc = arr.getDouble(0)
      var i = 1
      while (i < n) {
        val v = arr.getDouble(i)
        if (if (isMin) v < acc else v > acc) acc = v
        i += 1
      }
      acc
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_NumGeometries / ST_NumInteriorRing / ST_NumPoints. */
case class GeomCount(child: Expression, what: String) extends GeomUnary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = s"st_num_$what"
  override def nullSafeEval(input: Any): Any = {
    val (k, xs, _, rings) = geom(input)
    what match {
      case "geometries" => Wkt.gNumGeometries(k, rings)
      case "interior_ring" => Wkt.gNumInteriorRing(k, rings)
      case "points" => xs.numElements()
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_Contains(geometry, point) over shells minus holes. */
case class GeomContainsPoint(g: Expression, px: Expression, py: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with CodegenFallback {
  override def first: Expression = g
  override def second: Expression = px
  override def third: Expression = py
  override def checkInputDataTypes(): TypeCheckResult = g.dataType match {
    case s: StructType if s.length == 4
      && px.dataType == DoubleType && py.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (geometry, double, double)")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geom_contains"
  override def nullSafeEval(gv: Any, x: Any, y: Any): Any = {
    val row = gv.asInstanceOf[InternalRow]
    Wkt.gContains(row.getUTF8String(0).toString, row.getArray(1), row.getArray(2),
      row.getArray(3), x.asInstanceOf[Double], y.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

private[ext] abstract class PolygonPairPredicate extends Expression with CodegenFallback
    with DoubleArrayPair {
  def xa: Expression; def ya: Expression; def xb: Expression; def yb: Expression
  def compute(a1: ArrayData, a2: ArrayData, b1: ArrayData, b2: ArrayData): Boolean
  override def children: Seq[Expression] = Seq(xa, ya, xb, yb)
  override def checkInputDataTypes(): TypeCheckResult =
    checkArrays(children.map(_.dataType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val e = children.map(_.eval(input))
    if (e.contains(null)) null
    else java.lang.Boolean.valueOf(compute(
      e(0).asInstanceOf[ArrayData], e(1).asInstanceOf[ArrayData],
      e(2).asInstanceOf[ArrayData], e(3).asInstanceOf[ArrayData]))
  }
}

/** ST_Length over (xs, ys) LINESTRING coordinates (open path). */
case class LineStringLength(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback with DoubleArrayPair {
  override def checkInputDataTypes(): TypeCheckResult =
    checkArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_length"
  override def nullSafeEval(a: Any, b: Any): Any =
    Wkt.length(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Intersects over two (xs, ys) polygons. */
case class PolygonIntersects(xa: Expression, ya: Expression, xb: Expression, yb: Expression)
    extends PolygonPairPredicate {
  override def prettyName: String = "st_intersects"
  override def compute(a1: ArrayData, a2: ArrayData, b1: ArrayData, b2: ArrayData): Boolean =
    Wkt.intersects(a1, a2, b1, b2)
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): Expression =
    copy(xa = nc(0), ya = nc(1), xb = nc(2), yb = nc(3))
}

/** ST_Within: polygon a strictly inside polygon b. */
case class PolygonWithin(xa: Expression, ya: Expression, xb: Expression, yb: Expression)
    extends PolygonPairPredicate {
  override def prettyName: String = "st_within"
  override def compute(a1: ArrayData, a2: ArrayData, b1: ArrayData, b2: ArrayData): Boolean =
    Wkt.within(a1, a2, b1, b2)
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): Expression =
    copy(xa = nc(0), ya = nc(1), xb = nc(2), yb = nc(3))
}
