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
  * ST_Within).
  *
  * Geometry runtime value: struct<kind: string, xs: array<double>,
  * ys: array<double>> over the same coordinate-array kernels as
  * graft.ext.GeoExpressions (GeoPolygon). WKT subset: POINT (x y),
  * LINESTRING (x y, …), POLYGON ((x y, …)) with a single outer ring —
  * MULTI* and holes return NULL (documented; the reference throws on
  * unsupported input, NULL keeps the function TRY-compatible).
  *
  * ST_AsText renders coordinates with Java's shortest-roundtrip double
  * formatting, which matches DuckDB's VARCHAR cast for the dyadic fractions
  * the oracles build — so format(parse(wkt)) == wkt is hash-checkable.
  *
  * Predicates (simple polygons, the planar core of the reference's ESRI
  * delegation):
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
    StructField("ys", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private val Point = """(?i)\s*POINT\s*\(\s*([^()]*?)\s*\)\s*""".r
  private val LineString = """(?i)\s*LINESTRING\s*\(\s*([^()]*?)\s*\)\s*""".r
  private val Polygon = """(?i)\s*POLYGON\s*\(\s*\(\s*([^()]*?)\s*\)\s*\)\s*""".r

  /** (kind, xs, ys) or null for unsupported/malformed text. */
  def parse(wkt: String): (String, Array[Double], Array[Double]) = {
    def coords(body: String): Option[(Array[Double], Array[Double])] = {
      val pairs = body.split(",").map(_.trim).filter(_.nonEmpty)
      val xs = new Array[Double](pairs.length)
      val ys = new Array[Double](pairs.length)
      var i = 0
      while (i < pairs.length) {
        val parts = pairs(i).split("\\s+")
        if (parts.length != 2) return None
        try { xs(i) = parts(0).toDouble; ys(i) = parts(1).toDouble }
        catch { case _: NumberFormatException => return None }
        i += 1
      }
      Some((xs, ys))
    }
    wkt match {
      case Point(b) => coords(b).filter(_._1.length == 1)
        .map { case (xs, ys) => ("POINT", xs, ys) }.orNull
      case LineString(b) => coords(b).filter(_._1.length >= 2)
        .map { case (xs, ys) => ("LINESTRING", xs, ys) }.orNull
      case Polygon(b) => coords(b).filter(_._1.length >= 3)
        .map { case (xs, ys) => ("POLYGON", xs, ys) }.orNull
      case _ => null
    }
  }

  def format(kind: String, xs: Array[Double], ys: Array[Double]): String = {
    val body = xs.indices.map(i => s"${xs(i)} ${ys(i)}").mkString(", ")
    kind.toUpperCase match {
      case "POINT" => s"POINT ($body)"
      case "POLYGON" => s"POLYGON (($body))"
      case k => s"$k ($body)"
    }
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
      UTF8String.fromString(parsed._1),
      new GenericArrayData(parsed._2),
      new GenericArrayData(parsed._3))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_AsText(geometry struct) → canonical WKT. */
case class WktFormat(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 => TypeCheckResult.TypeCheckSuccess
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
    UTF8String.fromString(Wkt.format(
      row.getUTF8String(0).toString,
      Array.tabulate(xs.numElements())(xs.getDouble),
      Array.tabulate(ys.numElements())(ys.getDouble)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
