package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** IEEE-754 and big-endian binary codecs (SURVEY.md §2.8 binary functions;
  * reference: core/trino-main/src/main/java/io/trino/operator/scalar/
  * VarbinaryFunctions.java toIEEE754Binary64/fromIEEE754Binary64/
  * toIEEE754Binary32/fromIEEE754Binary32/toBigEndian32/fromBigEndian32).
  *
  * Each emits/consumes the network-byte-order (big-endian) fixed-width
  * binary the reference produces. Codegen'd via static helper calls — these
  * are pure byte shuffles, safe in the hot path.
  */
object BinaryCodecs {
  def doubleToBe(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(java.lang.Double.doubleToLongBits(v)).array()
  def beToDouble(b: Array[Byte]): Double = {
    require(b.length == 8, s"from_ieee754_64 requires 8 bytes, got ${b.length}")
    java.lang.Double.longBitsToDouble(java.nio.ByteBuffer.wrap(b).getLong)
  }
  def floatToBe(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(java.lang.Float.floatToIntBits(v.toFloat)).array()
  def beToFloat(b: Array[Byte]): Float = {
    require(b.length == 4, s"from_ieee754_32 requires 4 bytes, got ${b.length}")
    java.lang.Float.intBitsToFloat(java.nio.ByteBuffer.wrap(b).getInt)
  }
  def intToBe(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v).array()
  def longToBe(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8).putLong(v).array()
  def beToLong(b: Array[Byte]): Long = {
    require(b.length == 8, s"expected 8 bytes, got ${b.length}")
    java.nio.ByteBuffer.wrap(b).getLong
  }
  def beToInt(b: Array[Byte]): Int = {
    require(b.length == 4, s"from_big_endian_32 requires 4 bytes, got ${b.length}")
    java.nio.ByteBuffer.wrap(b).getInt
  }
}

private[ext] abstract class CodecExpr extends UnaryExpression {
  /** (inputType, outputType, static method name on BinaryCodecs). */
  def sig: (DataType, DataType, String)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == sig._1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${sig._1.simpleString}, got ${child.dataType.simpleString}")
  override def dataType: DataType = sig._2
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.BinaryCodecs.${sig._3}($c)")
}

case class ToIeee754B64(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (DoubleType, BinaryType, "doubleToBe")
  override def prettyName: String = "to_ieee754_64"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.doubleToBe(v.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class FromIeee754B64(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (BinaryType, DoubleType, "beToDouble")
  override def prettyName: String = "from_ieee754_64"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.beToDouble(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class ToIeee754B32(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (DoubleType, BinaryType, "floatToBe")
  override def prettyName: String = "to_ieee754_32"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.floatToBe(v.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class FromIeee754B32(child: Expression) extends CodecExpr {
  // REAL in the reference (VarbinaryFunctions.java fromIEEE754Binary32)
  override def sig: (DataType, DataType, String) = (BinaryType, FloatType, "beToFloat")
  override def prettyName: String = "from_ieee754_32"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.beToFloat(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class ToBigEndian32(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (IntegerType, BinaryType, "intToBe")
  override def prettyName: String = "to_big_endian_32"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.intToBe(v.asInstanceOf[Int])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class FromBigEndian32(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (BinaryType, IntegerType, "beToInt")
  override def prettyName: String = "from_big_endian_32"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.beToInt(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class ToBigEndian64(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (LongType, BinaryType, "longToBe")
  override def prettyName: String = "to_big_endian_64"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.longToBe(v.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
case class FromBigEndian64(child: Expression) extends CodecExpr {
  override def sig: (DataType, DataType, String) = (BinaryType, LongType, "beToLong")
  override def prettyName: String = "from_big_endian_64"
  override def nullSafeEval(v: Any): Any = BinaryCodecs.beToLong(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
