package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Well-Known Binary I/O over the [[Wkt]] ringed model (reference
  * plugin/trino-geospatial/GeoFunctions.java — ST_AsBinary:726,
  * ST_GeomFromBinary:480; the format is OGC SFA 1.2.1 §7.2).
  *
  * Writer emits NDR (little-endian, the PostGIS convention; the OGC spec
  * admits either order and every reader accepts both). Reader accepts XDR
  * and NDR, and EWKB's SRID flag (0x20000000) by skipping the SRID — the
  * same "WKB or EWKB in, plain WKB out" posture as the reference. Z/M
  * dimensions (flags 0x80000000/0x40000000 or type codes 1001+) are
  * REJECTED with NULL: this model is 2D, and silently dropping ordinates
  * would be a wrong answer.
  *
  * Polygon rings stay exactly as stored (closed, shell first, holes
  * after); a MULTIPOLYGON groups each shell with its following holes —
  * the same flat-rings convention the rest of the geometry stack uses. */
object Wkb {
  import Wkt.Geom

  private val TPoint = 1
  private val TLine = 2
  private val TPolygon = 3
  private val TMultiPoint = 4
  private val TMultiLine = 5
  private val TMultiPolygon = 6
  private val TGeomCollection = 7

  // ------------------------------------------------------------------ write

  def write(g: Geom): Array[Byte] = {
    if (g == null) return null
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    putGeom(buf, g)
    buf.array()
  }

  private def sizeOf(g: Geom): Int = g.kind match {
    case "POINT" => 21
    case "LINESTRING" => 9 + 16 * g.xs.length
    case "POLYGON" => 9 + 4 * g.rings.length + 16 * g.xs.length
    case "MULTIPOINT" => 9 + 21 * g.rings.length
    case "MULTILINESTRING" => 9 + g.rings.map(l => 9 + 16 * math.abs(l)).sum
    case "MULTIPOLYGON" =>
      // one polygon header per shell (positive ring)
      9 + g.rings.count(_ > 0) * 9 + 4 * g.rings.length + 16 * g.xs.length
    case "GEOMETRYCOLLECTION" =>
      9 + Wkt.gcParts(g).map(sizeOf).sum
  }

  private def putHeader(buf: ByteBuffer, tpe: Int): Unit = {
    buf.put(1.toByte) // NDR
    buf.putInt(tpe)
  }

  private def putPoints(buf: ByteBuffer, g: Geom, off: Int, len: Int): Unit = {
    var i = 0
    while (i < len) {
      buf.putDouble(g.xs(off + i)); buf.putDouble(g.ys(off + i))
      i += 1
    }
  }

  private def putGeom(buf: ByteBuffer, g: Geom): Unit = g.kind match {
    case "POINT" =>
      putHeader(buf, TPoint)
      buf.putDouble(g.xs(0)); buf.putDouble(g.ys(0))
    case "LINESTRING" =>
      putHeader(buf, TLine)
      buf.putInt(g.xs.length)
      putPoints(buf, g, 0, g.xs.length)
    case "POLYGON" =>
      putHeader(buf, TPolygon)
      buf.putInt(g.rings.length)
      var off = 0
      for (r <- g.rings) {
        val len = math.abs(r)
        buf.putInt(len)
        putPoints(buf, g, off, len)
        off += len
      }
    case "MULTIPOINT" =>
      putHeader(buf, TMultiPoint)
      buf.putInt(g.rings.length)
      for (i <- g.rings.indices) {
        putHeader(buf, TPoint)
        buf.putDouble(g.xs(i)); buf.putDouble(g.ys(i))
      }
    case "MULTILINESTRING" =>
      putHeader(buf, TMultiLine)
      buf.putInt(g.rings.length)
      var off = 0
      for (r <- g.rings) {
        val len = math.abs(r)
        putHeader(buf, TLine)
        buf.putInt(len)
        putPoints(buf, g, off, len)
        off += len
      }
    case "GEOMETRYCOLLECTION" =>
      putHeader(buf, TGeomCollection)
      val parts = Wkt.gcParts(g)
      buf.putInt(parts.length)
      parts.foreach(putGeom(buf, _))
    case "MULTIPOLYGON" =>
      putHeader(buf, TMultiPolygon)
      buf.putInt(g.rings.count(_ > 0))
      // each polygon: its shell plus the holes that follow it
      var i = 0
      var off = 0
      while (i < g.rings.length) {
        var j = i + 1
        while (j < g.rings.length && g.rings(j) < 0) j += 1
        putHeader(buf, TPolygon)
        buf.putInt(j - i)
        var k = i
        while (k < j) {
          val len = math.abs(g.rings(k))
          buf.putInt(len)
          putPoints(buf, g, off, len)
          off += len
          k += 1
        }
        i = j
      }
  }

  // ------------------------------------------------------------------- read

  /** Parse WKB/EWKB; null on malformed, Z/M, collections, or trailing bytes. */
  def read(bytes: Array[Byte]): Geom = {
    if (bytes == null) return null
    try {
      val buf = ByteBuffer.wrap(bytes)
      val g = readGeom(buf, topLevel = true)
      if (g != null && buf.remaining() == 0) g else null
    } catch { case _: Exception => null }
  }

  private def readHeader(buf: ByteBuffer, topLevel: Boolean): Int = {
    buf.order(buf.get() match {
      case 0 => ByteOrder.BIG_ENDIAN
      case 1 => ByteOrder.LITTLE_ENDIAN
      case _ => return -1
    })
    var tpe = buf.getInt
    // EWKB flags: SRID present → skip it; Z/M → unsupported (2D model)
    if ((tpe & 0xc0000000) != 0) return -1
    if ((tpe & 0x20000000) != 0) {
      if (!topLevel) return -1 // EWKB nests SRID only at top level
      buf.getInt // srid, dropped like the reference's WKB-compat path
      tpe &= ~0x20000000
    }
    if (tpe > 1000) -1 else tpe // ISO Z/M type codes (1001+) unsupported
  }

  private def readGeom(buf: ByteBuffer, topLevel: Boolean): Geom = {
    val tpe = readHeader(buf, topLevel)
    tpe match {
      case TPoint =>
        Geom("POINT", Array(buf.getDouble), Array(buf.getDouble), Array(1))
      case TLine =>
        val n = buf.getInt
        if (n < 2 || n > buf.remaining() / 16) return null
        val xs = new Array[Double](n); val ys = new Array[Double](n)
        for (i <- 0 until n) { xs(i) = buf.getDouble; ys(i) = buf.getDouble }
        Geom("LINESTRING", xs, ys, Array(n))
      case TPolygon =>
        readPolygonBody(buf).map { case (xs, ys, rings) =>
          Geom("POLYGON", xs, ys, rings)
        }.orNull
      case TMultiPoint =>
        val n = buf.getInt
        if (n < 1 || n > buf.remaining() / 21) return null
        val xs = new Array[Double](n); val ys = new Array[Double](n)
        for (i <- 0 until n) {
          if (readHeader(buf, topLevel = false) != TPoint) return null
          xs(i) = buf.getDouble; ys(i) = buf.getDouble
        }
        Geom("MULTIPOINT", xs, ys, Array.fill(n)(1))
      case TMultiLine =>
        val n = buf.getInt
        if (n < 1 || n > buf.remaining() / 9) return null
        val bx = scala.collection.mutable.ArrayBuffer[Double]()
        val by = scala.collection.mutable.ArrayBuffer[Double]()
        val lens = scala.collection.mutable.ArrayBuffer[Int]()
        for (_ <- 0 until n) {
          if (readHeader(buf, topLevel = false) != TLine) return null
          val m = buf.getInt
          if (m < 2 || m > buf.remaining() / 16) return null
          lens += m
          for (_ <- 0 until m) { bx += buf.getDouble; by += buf.getDouble }
        }
        Geom("MULTILINESTRING", bx.toArray, by.toArray, lens.toArray)
      case TGeomCollection =>
        val n = buf.getInt
        if (n < 1 || n > buf.remaining() / 9) return null
        val parts = (0 until n).map(_ => readGeom(buf, topLevel = false))
        if (parts.contains(null)) return null
        // members of any kind, including MULTIs and nested collections
        Wkt.gcBuild(parts)
      case TMultiPolygon =>
        val n = buf.getInt
        if (n < 1 || n > buf.remaining() / 9) return null
        val bx = scala.collection.mutable.ArrayBuffer[Double]()
        val by = scala.collection.mutable.ArrayBuffer[Double]()
        val lens = scala.collection.mutable.ArrayBuffer[Int]()
        for (_ <- 0 until n) {
          if (readHeader(buf, topLevel = false) != TPolygon) return null
          readPolygonBody(buf) match {
            case Some((xs, ys, rings)) =>
              bx ++= xs; by ++= ys; lens ++= rings
            case None => return null
          }
        }
        Geom("MULTIPOLYGON", bx.toArray, by.toArray, lens.toArray)
      case _ => null
    }
  }

  /** rings with the flat sign convention: first positive (shell), rest
    * negative (holes). */
  private def readPolygonBody(buf: ByteBuffer):
      Option[(Array[Double], Array[Double], Array[Int])] = {
    val nRings = buf.getInt
    if (nRings < 1 || nRings > buf.remaining() / 4) return None
    val bx = scala.collection.mutable.ArrayBuffer[Double]()
    val by = scala.collection.mutable.ArrayBuffer[Double]()
    val lens = scala.collection.mutable.ArrayBuffer[Int]()
    for (r <- 0 until nRings) {
      val m = buf.getInt
      if (m < 3 || m > buf.remaining() / 16) return None
      lens += (if (r == 0) m else -m)
      for (_ <- 0 until m) { bx += buf.getDouble; by += buf.getDouble }
    }
    Some((bx.toArray, by.toArray, lens.toArray))
  }
}

/** ST_AsBinary(geometry) → varbinary (GeoFunctions.java:726). */
case class GeomAsBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == Wkt.geometryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_asbinary expects a geometry struct")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_asbinary"
  override def nullSafeEval(g: Any): Any =
    Wkb.write(GeoOps.fromRow(g.asInstanceOf[InternalRow]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ST_GeomFromBinary(varbinary) → geometry (GeoFunctions.java:480). */
case class GeomFromBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_geomfrombinary expects varbinary")
  override def dataType: DataType = Wkt.geometryType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "st_geomfrombinary"
  override def nullSafeEval(b: Any): Any =
    GeoOps.toRow(Wkb.read(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
