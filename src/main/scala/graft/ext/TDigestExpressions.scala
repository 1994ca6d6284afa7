package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.Sketches

/** Scalar extractors over the t-digest VALUE struct (reference
  * operator/scalar/TDigestFunctions.java:31 — value_at_quantile :45,
  * values_at_quantiles :57, quantile_at_value :70). The digest arrives as
  * the struct emitted by Sketches.tdigestAgg (means, weights, compression);
  * evaluation reconstructs the centroid model and interpolates — O(C) per
  * call with C = compression-bounded centroid count, row-local, no state.
  * CodegenFallback: these sit on aggregate OUTPUTS (one row per group), not
  * in per-row hot paths. */
private[graft] object TDigestDecode {
  def apply(row: InternalRow): Sketches.TDigest =
    Sketches.ofState(Sketches.TDigestState(
      row.getArray(0).toDoubleArray(),
      row.getArray(1).toDoubleArray(),
      row.getDouble(2)))

  val stateType: DataType = StructType(Seq(
    StructField("means", ArrayType(DoubleType, containsNull = false)),
    StructField("weights", ArrayType(DoubleType, containsNull = false)),
    StructField("compression", DoubleType)))
}

case class TDigestValueAtQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "value_at_quantile"
  override protected def nullSafeEval(d: Any, q: Any): Any =
    TDigestDecode(d.asInstanceOf[InternalRow]).quantile(
      q match { case x: Double => x case x: java.lang.Number => x.doubleValue })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class TDigestValuesAtQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "values_at_quantiles"
  override protected def nullSafeEval(d: Any, qs: Any): Any = {
    val td = TDigestDecode(d.asInstanceOf[InternalRow])
    new GenericArrayData(
      qs.asInstanceOf[ArrayData].toDoubleArray().map(td.quantile))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class TDigestQuantileAtValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantile_at_value"
  override protected def nullSafeEval(d: Any, v: Any): Any =
    TDigestDecode(d.asInstanceOf[InternalRow]).quantileAtValue(
      v match { case x: Double => x case x: java.lang.Number => x.doubleValue })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
