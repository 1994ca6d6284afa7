package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector distance residuals beside [[CosineSimilarity]] (reference
  * operator/scalar/ArrayFunctions — euclidean_distance, dot_product over
  * dense arrays; the repo's embedding convention is ARRAY<FLOAT>).
  * Accumulation in double over float inputs, like the cosine kernel. */
abstract class VectorBinary extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments")
  }
  override def dataType: DataType = DoubleType
  protected def combine(x: ArrayData, y: ArrayData, n: Int): Double
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    combine(x, y, math.min(x.numElements(), y.numElements()))
  }
}

/** euclidean_distance(a, b) = ‖a − b‖₂. */
case class EuclideanDistance(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "euclidean_distance"
  override protected def combine(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_product(a, b) = Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "dot_product"
  override protected def combine(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
