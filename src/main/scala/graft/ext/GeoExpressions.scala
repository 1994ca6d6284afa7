package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Polygon geometry kernels (SURVEY.md §2.8 geospatial; reference:
  * plugin/trino-geospatial/src/main/java/io/trino/plugin/geospatial/GeoFunctions.java —
  * ST_Area, ST_Perimeter, ST_Contains over polygon geometries).
  *
  * Geometry representation: a polygon is a pair of DOUBLE arrays (xs, ys) of
  * equal length (closed implicitly) — the coordinate-level core of the ST_*
  * functions without a dedicated geometry type. All kernels accumulate
  * left-to-right in vertex order, so a per-element SQL formulation (the DuckDB
  * oracle) reproduces results bit-for-bit:
  *  - area: shoelace formula, |Σ xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ| / 2
  *  - perimeter: Σ √(dx² + dy²)
  *  - point-in-polygon: even-odd ray casting (boundary classification follows
  *    the exact IEEE comparisons — identical in any engine running the same
  *    arithmetic).
  */
object GeoPolygon {
  def area(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      acc += xs.getDouble(i) * ys.getDouble(j) - xs.getDouble(j) * ys.getDouble(i)
      i += 1
    }
    math.abs(acc) / 2.0
  }

  def perimeter(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val dx = xs.getDouble(j) - xs.getDouble(i)
      val dy = ys.getDouble(j) - ys.getDouble(i)
      acc += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    acc
  }

  def contains(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = math.min(xs.numElements(), ys.numElements())
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = ys.getDouble(i); val yj = ys.getDouble(j)
      val xi = xs.getDouble(i); val xj = xs.getDouble(j)
      if (((yi > py) != (yj > py)) && (px < (xj - xi) * (py - yi) / (yj - yi) + xi))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }
}

private[ext] trait DoubleArrayPair { self: Expression =>
  protected def checkArrays(types: Seq[DataType]): TypeCheckResult =
    if (types.forall(_ == ArrayType(DoubleType, false)) ||
      types.forall { case ArrayType(DoubleType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"${self.prettyName} requires ARRAY<DOUBLE> coordinates")
}

/** ST_Area over (xs, ys) coordinate arrays. */
case class PolygonArea(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with DoubleArrayPair {
  override def checkInputDataTypes(): TypeCheckResult = checkArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoPolygon.area(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Perimeter over (xs, ys) coordinate arrays. */
case class PolygonPerimeter(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with DoubleArrayPair {
  override def checkInputDataTypes(): TypeCheckResult = checkArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_perimeter"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoPolygon.perimeter(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_Contains(polygon, point) via even-odd ray casting. */
case class PolygonContains(px: Expression, py: Expression, xs: Expression, ys: Expression)
    extends Expression with CodegenFallback with DoubleArrayPair {
  override def children: Seq[Expression] = Seq(px, py, xs, ys)
  override def checkInputDataTypes(): TypeCheckResult =
    if (px.dataType != DoubleType || py.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires DOUBLE point coordinates")
    else checkArrays(Seq(xs.dataType, ys.dataType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_contains"

  override def eval(input: InternalRow): Any = {
    val a = px.eval(input); val b = py.eval(input)
    val c = xs.eval(input); val d = ys.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else java.lang.Boolean.valueOf(GeoPolygon.contains(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData]))
  }

  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): Expression =
    copy(px = nc(0), py = nc(1), xs = nc(2), ys = nc(3))
}

/** ST_ConvexHull over (xs, ys) point arrays (reference GeoFunctions.java
  * ST_ConvexHull): Andrew's monotone chain, collinear vertices dropped,
  * output CCW starting from the lexicographically-smallest (x, y) vertex —
  * a canonical form both engines can compare. Returns
  * struct<xs array<double>, ys array<double>>. */
case class ConvexHull(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with DoubleArrayPair {
  override def checkInputDataTypes(): TypeCheckResult = checkArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = StructType(Seq(
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false))))
  override def prettyName: String = "st_convex_hull"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]; val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    if (n == 0) return null
    val pts = Array.tabulate(n)(i => (xs.getDouble(i), ys.getDouble(i)))
      .distinct.sortBy(identity)
    def cross(o: (Double, Double), p: (Double, Double), q: (Double, Double)): Double =
      (p._1 - o._1) * (q._2 - o._2) - (p._2 - o._2) * (q._1 - o._1)
    def chain(ps: Array[(Double, Double)]): List[(Double, Double)] = {
      var out = List.empty[(Double, Double)]
      for (p <- ps) {
        while (out.lengthCompare(2) >= 0 && cross(out.tail.head, out.head, p) <= 0)
          out = out.tail
        out = p :: out
      }
      out.reverse
    }
    val lower = chain(pts)
    val upper = chain(pts.reverse)
    // drop the duplicated endpoints; result is CCW from the smallest vertex
    val hull =
      if (pts.length == 1) pts.toList
      else lower.init ++ upper.init
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    InternalRow(
      new GenericArrayData(hull.map(_._1).toArray),
      new GenericArrayData(hull.map(_._2).toArray))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
