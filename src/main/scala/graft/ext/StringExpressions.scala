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
