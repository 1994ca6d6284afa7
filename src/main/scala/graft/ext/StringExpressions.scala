package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (reference: operator/scalar/StringFunctions.java
  * normalize()) — Spark has no normalize builtin. */
case class NormalizeNfc(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character hamming distance between equal-length strings (reference:
  * StringFunctions.java hammingDistance — errors on length mismatch, as the
  * reference does). */
case class StringHamming(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two STRING arguments")
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance_str"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].toString
    val y = b.asInstanceOf[UTF8String].toString
    require(x.length == y.length,
      s"$prettyName requires equal-length strings (${x.length} vs ${y.length})")
    var d = 0L; var i = 0
    while (i < x.length) { if (x.charAt(i) != y.charAt(i)) d += 1; i += 1 }
    java.lang.Long.valueOf(d)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** char2hexint: uppercase hex of the UTF-16BE encoding (reference
  * plugin/trino-teradata-functions TeradataStringFunctions.java:62). */
case class Char2HexInt(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StringType
  override def prettyName: String = "char2hexint"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02X"))
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): Char2HexInt = copy(child = c)
}
