package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst wrappers for [[GeoOps3]] (reference GeoFunctions.java — see the
  * per-op citations there). Four generic shapes keep the surface compact:
  * unary geometry→geometry, unary geometry→array, array→geometry, and the
  * text/scalar converters; each dispatches on an op tag checked at
  * analysis time. */

/** geometry → geometry unary ops. */
case class GeomGen1(child: Expression, op: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a geometry")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$op"
  override def nullSafeEval(g0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    val out = op match {
      case "force2d" => g
      case "multi" => GeoOps3.multi(g)
      case "normalize" => GeoOps3.normalize(g)
      case "line_merge" => GeoOps3.lineMerge(g)
      case "point_on_surface" => GeoOps3.pointOnSurface(g)
      case "oriented_envelope" => GeoOps3.orientedEnvelope(g)
      case "minimum_bounding_circle" => GeoOps3.minimumBoundingCircle(g)
    }
    GeoOps.toRow(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** geometry → array<geometry> unary ops. */
case class GeomGen1Arr(child: Expression, op: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a geometry")
  override def dataType: DataType = ArrayType(Wkt.geometryType, containsNull = false)
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$op"
  override def nullSafeEval(g0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    val out: List[Wkt.Geom] = op match {
      case "geometries" => GeoOps3.components(g)
      case "interior_rings" => GeoOps3.interiorRings(g)
      case "envelope_as_pts" => GeoOps3.envelopeAsPts(g)
    }
    if (out == null) null
    else new GenericArrayData(out.map(GeoOps.toRow).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<geometry> → geometry ops (ST_Collect, ST_MakeLine, geometry_union,
  * ST_Polygonize). */
case class GeomGenArr1(child: Expression, op: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == Wkt.geometryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<geometry>")
  }
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = op
  override def nullSafeEval(arr0: Any): Any = {
    val arr = arr0.asInstanceOf[ArrayData]
    val gs = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null
      else GeoOps.fromRow(arr.getStruct(i, 4))
    }
    val out = op match {
      case "st_collect" => GeoOps3.collect(gs)
      case "st_make_line" => GeoOps3.makeLine(gs)
      case "st_polygonize" => GeoOps3.polygonize(gs)
      case "geometry_union" =>
        if (gs.isEmpty || gs.contains(null)) null
        else gs.reduce[Wkt.Geom]((a, b) =>
          if (a == null || b == null) null else GeoOps.union(a, b))
    }
    GeoOps.toRow(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Binary (geometry, geometry) → geometry: ST_Collect(a, b) and the 1-arg
  * ST_MakePolygon lifted to (shell, holes-array) below. */
case class GeomCollect2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_collect expects two geometries")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_collect"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.toRow(GeoOps3.collect(Seq(
      GeoOps.fromRow(a.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b.asInstanceOf[InternalRow]))))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_MakePolygon(shell[, holes]) — holes as array<geometry> (empty = none). */
case class GeomMakePolygon(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (t, ArrayType(h, _)) if t == Wkt.geometryType && h == Wkt.geometryType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "st_makepolygon expects (geometry, array<geometry>)")
  }
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_makepolygon"
  override def nullSafeEval(shell0: Any, holes0: Any): Any = {
    val shell = GeoOps.fromRow(shell0.asInstanceOf[InternalRow])
    val arr = holes0.asInstanceOf[ArrayData]
    val holes = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null else GeoOps.fromRow(arr.getStruct(i, 4))
    }
    GeoOps.toRow(GeoOps3.makePolygon(shell, holes))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** geometry scalar converters: st_srid → 0 (no CRS slot; the JTS default the
  * reference reports for untagged geometry), st_z → NULL (2D model),
  * st_is_simple, st_as_ewkt (≡ ST_AsText at SRID 0), to_encoded_polyline. */
case class GeomGenScalar(child: Expression, op: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a geometry")
  override def dataType: DataType = op match {
    case "srid" => IntegerType
    case "z" => DoubleType
    case "is_simple" => BooleanType
    case _ => StringType
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = s"st_$op"
  override def nullSafeEval(g0: Any): Any = {
    val g = GeoOps.fromRow(g0.asInstanceOf[InternalRow])
    op match {
      case "srid" => 0
      case "z" => null
      case "is_simple" => GeoOps3.isSimple(g)
      case "as_ewkt" =>
        UTF8String.fromString(Wkt.format(g.kind, g.xs, g.ys, g.rings))
      case "to_encoded_polyline" =>
        Option(GeoOps3.toEncodedPolyline(g)).map(UTF8String.fromString).orNull
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** text → geometry converters: st_line_from_text, st_geom_from_ewkt
  * (SRID=n; prefix accepted and discarded — no CRS slot), st_geom_from_kml,
  * from_encoded_polyline. */
case class GeomGenParse(child: Expression, op: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = op
  override def nullSafeEval(s0: Any): Any = {
    val s = s0.asInstanceOf[UTF8String].toString
    val out = op match {
      case "st_line_from_text" =>
        val g = Wkt.parse(s)
        if (g != null && g.kind == "LINESTRING") g else null
      case "st_geom_from_ewkt" =>
        Wkt.parse(s.replaceFirst("(?i)^\\s*SRID=\\d+\\s*;", ""))
      case "st_geom_from_kml" => GeoOps3.fromKml(s)
      case "from_encoded_polyline" => GeoOps3.fromEncodedPolyline(s)
    }
    GeoOps.toRow(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_SetSRID(g, srid): srid 0 is the identity (our value carries no CRS
  * slot); any other srid → NULL, loudly degraded rather than silently
  * dropped. */
case class GeomSetSrid(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_setsrid expects (geometry, int)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_setsrid"
  override def nullSafeEval(g0: Any, srid0: Any): Any =
    if (srid0.asInstanceOf[Int] != 0) null
    else GeoOps.toRow(GeoOps.fromRow(g0.asInstanceOf[InternalRow]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_ReducePrecision(g, gridSize). */
case class GeomReducePrecision(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_reduceprecision expects (geometry, double)")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_reduceprecision"
  override def nullSafeEval(g0: Any, grid0: Any): Any =
    GeoOps.toRow(GeoOps3.reducePrecision(
      GeoOps.fromRow(g0.asInstanceOf[InternalRow]), grid0.asInstanceOf[Double]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** line_interpolate_points(line, fractionStep) → array<geometry>. */
case class LineInterpolatePoints(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("line_interpolate_points expects (geometry, double)")
  override def dataType: DataType = ArrayType(Wkt.geometryType, containsNull = false)
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "line_interpolate_points"
  override def nullSafeEval(l0: Any, f0: Any): Any = {
    val out = GeoOps3.interpolatePoints(
      GeoOps.fromRow(l0.asInstanceOf[InternalRow]), f0.asInstanceOf[Double])
    if (out == null) null
    else new GenericArrayData(out.map(GeoOps.toRow).toArray[Any])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** geometry_nearest_points(a, b) → row(geometry, geometry)
  * (GeoFunctions.java:1708). */
case class GeomNearestPoints(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == Wkt.geometryType && right.dataType == Wkt.geometryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geometry_nearest_points expects two geometries")
  override def dataType: DataType = StructType(Seq(
    StructField("p1", Wkt.geometryType, nullable = false),
    StructField("p2", Wkt.geometryType, nullable = false)))
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "geometry_nearest_points"
  override def nullSafeEval(a0: Any, b0: Any): Any = {
    val out = GeoOps3.nearestPoints(
      GeoOps.fromRow(a0.asInstanceOf[InternalRow]),
      GeoOps.fromRow(b0.asInstanceOf[InternalRow]))
    if (out == null) null
    else InternalRow(GeoOps.toRow(out._1), GeoOps.toRow(out._2))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
