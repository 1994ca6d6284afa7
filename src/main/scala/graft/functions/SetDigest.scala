package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Set-digest family (SURVEY.md §2.4; reference:
  * core/trino-main/src/main/java/io/trino/type/setdigest/ — make_set_digest,
  * merge_set_digest, cardinality, intersection_cardinality, jaccard_index).
  *
  * The digest here is a K-minimum-values (KMV) sketch over 64-bit element
  * hashes: the k smallest hash values (unsigned order) of the set. One
  * mergeable state serves both estimators, like the reference's HLL+minhash
  * combo:
  *  - cardinality ≈ (k−1) / u_k where u_k is the k-th minimum normalized to
  *    [0,1) (exact when fewer than k distinct hashes were seen);
  *  - jaccard(A,B) ≈ |KMV_k(A ∪ B) ∩ A ∩ B| / k (Beyer et al., SIGMOD'07 —
  *    see PAPERS.md).
  *
  * The digest state is a sorted ARRAY<BIGINT> column — it flows through
  * shuffles/joins like any value and merges by union (take k smallest).
  * Scale: per-group state is O(k); merge is a sorted-array union — the same
  * bounded-memory contract as the reference's digest.
  */
object SetDigest {
  val K = 512

  private def unsignedLt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0
  private def toUnit(x: Long): Double = {
    // unsigned 64-bit → [0, 1)
    val d = if (x >= 0) x.toDouble else x.toDouble + 1.8446744073709552e19
    d / 1.8446744073709552e19
  }

  /** k smallest distinct values of two sorted-unsigned arrays. */
  private[functions] def unionK(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (unsignedLt(a(i), b(j))) { val v = a(i); i += 1; v }
        else if (a(i) == b(j)) { val v = a(i); i += 1; j += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private[functions] def estimate(sorted: Array[Long], k: Int): Double =
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / toUnit(sorted(k - 1))

  /** Amortized KMV buffer: appends are O(1); a compact pass (unsigned sort +
    * dedupe + truncate to K) runs every CAP appends — the same buffered-insert
    * discipline as the t-digest Aggregator. */
  final class KmvBuf(var arr: Array[Long], var n: Int) extends Serializable {
    def this() = this(new Array[Long](KmvBuf.Cap), 0)
    def add(h: Long): Unit = {
      if (n == arr.length) compact()
      arr(n) = h; n += 1
    }
    def compact(): Unit = {
      val a = java.util.Arrays.copyOf(arr, n)
      var i = 0
      while (i < a.length) { a(i) = a(i) ^ Long.MinValue; i += 1 } // unsigned order
      java.util.Arrays.sort(a)
      var out = 0
      i = 0
      while (i < a.length && out < K) {
        if (out == 0 || arr(out - 1) != (a(i) ^ Long.MinValue)) {
          arr(out) = a(i) ^ Long.MinValue; out += 1
        }
        i += 1
      }
      n = out
    }
    def sortedK: Array[Long] = { compact(); java.util.Arrays.copyOf(arr, n) }
  }
  object KmvBuf { val Cap: Int = 8192 }

  /** make_set_digest: aggregate pre-hashed 64-bit elements into a KMV array. */
  final class KmvAgg extends Aggregator[Long, KmvBuf, Array[Long]] {
    def zero: KmvBuf = new KmvBuf()
    def reduce(buf: KmvBuf, h: Long): KmvBuf = { buf.add(h); buf }
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      val u = unionK(a.sortedK, b.sortedK, K)
      System.arraycopy(u, 0, a.arr, 0, u.length)
      a.n = u.length
      a
    }
    def finish(buf: KmvBuf): Array[Long] = buf.sortedK
    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** make_set_digest(hashedCol) — aggregate column function. */
  def makeSetDigest(hashed: Column): Column = udaf(new KmvAgg).apply(hashed)

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def digestCardinality(digest: Column): Column =
    column(KmvCardinality(expression(digest)))
  def jaccardIndex(a: Column, b: Column): Column =
    column(KmvJaccard(expression(a), expression(b)))
  def intersectionCardinality(a: Column, b: Column): Column =
    column(KmvIntersection(expression(a), expression(b)))
}

private[functions] trait KmvInput { self: Expression =>
  protected def checkLongArray(ts: Seq[DataType]): TypeCheckResult =
    if (ts.forall { case ArrayType(LongType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"${self.prettyName} requires ARRAY<BIGINT> digests")
  protected def arr(a: Any): Array[Long] = a.asInstanceOf[ArrayData].toLongArray()
}

/** cardinality(set_digest) → estimated distinct count. */
case class KmvCardinality(child: Expression)
    extends UnaryExpression with CodegenFallback with KmvInput {
  override def checkInputDataTypes(): TypeCheckResult = checkLongArray(Seq(child.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_digest_cardinality"
  override def nullSafeEval(a: Any): Any = SetDigest.estimate(arr(a), SetDigest.K)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** jaccard_index(a, b) via the union-KMV estimator. */
case class KmvJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with KmvInput {
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_index"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (arr(a), arr(b))
    val u = SetDigest.unionK(x, y, SetDigest.K)
    if (u.isEmpty) 0.0
    else {
      val xs = x.toSet; val ys = y.toSet
      u.count(v => xs.contains(v) && ys.contains(v)).toDouble / u.length
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** intersection_cardinality(a, b) ≈ jaccard × |A ∪ B| estimate. */
case class KmvIntersection(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with KmvInput {
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "intersection_cardinality"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (arr(a), arr(b))
    val u = SetDigest.unionK(x, y, SetDigest.K)
    if (u.isEmpty) 0.0
    else {
      val xs = x.toSet; val ys = y.toSet
      val j = u.count(v => xs.contains(v) && ys.contains(v)).toDouble / u.length
      j * SetDigest.estimate(u, SetDigest.K)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
