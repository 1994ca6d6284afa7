package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Theta sketch family (reference: plugin/trino-datasketches/.../theta/ —
  * `theta_sketch_union` aggregate over serialized sketches and
  * `theta_sketch_cardinality(varbinary) → double`; the sketch itself is
  * the published Theta Sketch Framework of Dasgupta/Lang/Rhodes/Thaler —
  * see PAPERS.md). Not wire-compatible with Apache DataSketches blobs
  * (that library is not in this build); the ALGORITHM is the same, so
  * estimates carry the same mergeability and error properties.
  *
  * Sketch value: a sorted ARRAY<BIGINT> whose head is THETA (an unsigned
  * 64-bit threshold) followed by the retained hashes, all strictly below
  * theta in unsigned order. Fewer than K distinct hashes → theta =
  * 0xFFFF…FF (the whole hash space) and the estimate is EXACT. More → the
  * K smallest are retained and theta is the (K+1)-th smallest, giving
  * estimate = retained / theta-as-fraction-of-hash-space.
  *
  * The set algebra is what makes theta sketches more than a cardinality
  * counter (and what HLL cannot do): UNION re-trims to K under the min
  * theta; INTERSECTION and A-NOT-B filter retained entries under the min
  * theta without trimming. All states are O(K); merge is a sorted-array
  * walk — the same bounded-memory per-group contract as the engine's
  * other sketches, safe at any group count. */
object ThetaSketch {

  /** Nominal entries (DataSketches' default lg_k=12). */
  val K = 4096

  private val UnsignedMax = -1L // 0xFFFFFFFFFFFFFFFF

  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private def toUnit(x: Long): Double = {
    val d = if (x >= 0) x.toDouble else x.toDouble + 1.8446744073709552e19
    d / 1.8446744073709552e19
  }

  /** entries must be sorted-unsigned and strictly below theta. */
  final case class Sketch(theta: Long, entries: Array[Long]) {
    def estimate: Double =
      if (theta == UnsignedMax) entries.length.toDouble
      else entries.length / toUnit(theta)
    def serialize: Array[Long] = theta +: entries
  }

  def deserialize(arr: Array[Long]): Sketch =
    if (arr == null || arr.isEmpty) Sketch(UnsignedMax, Array.empty)
    else Sketch(arr.head, arr.tail)

  /** Sort-unsigned + dedupe, then trim to K (theta := (K+1)-th smallest). */
  private def build(theta0: Long, hashes: Array[Long], n: Int): Sketch = {
    val a = java.util.Arrays.copyOf(hashes, n)
    var i = 0
    while (i < a.length) { a(i) = a(i) ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(a)
    val out = new Array[Long](math.min(a.length, K + 1))
    var m = 0
    i = 0
    while (i < a.length && m < out.length) {
      val v = a(i) ^ Long.MinValue
      if ((m == 0 || out(m - 1) != v) && unsignedLt(v, theta0)) { out(m) = v; m += 1 }
      i += 1
    }
    if (m <= K) Sketch(theta0, java.util.Arrays.copyOf(out, m))
    else Sketch(out(K), java.util.Arrays.copyOf(out, K))
  }

  /** Union: min theta, merged entries below it, re-trimmed to K. */
  def union(a: Sketch, b: Sketch): Sketch = {
    val theta = if (unsignedLt(a.theta, b.theta)) a.theta else b.theta
    val merged = new Array[Long](a.entries.length + b.entries.length)
    System.arraycopy(a.entries, 0, merged, 0, a.entries.length)
    System.arraycopy(b.entries, 0, merged, a.entries.length, b.entries.length)
    build(theta, merged, merged.length)
  }

  /** Intersection: entries common to both, below the min theta. No trim —
    * the result cannot exceed either input's K. */
  def intersect(a: Sketch, b: Sketch): Sketch = {
    val theta = if (unsignedLt(a.theta, b.theta)) a.theta else b.theta
    val bs = b.entries.toSet
    Sketch(theta, a.entries.filter(h => unsignedLt(h, theta) && bs(h)))
  }

  /** A-not-B: a's entries below the min theta, absent from b. */
  def aNotB(a: Sketch, b: Sketch): Sketch = {
    val theta = if (unsignedLt(a.theta, b.theta)) a.theta else b.theta
    val bs = b.entries.toSet
    Sketch(theta, a.entries.filter(h => unsignedLt(h, theta) && !bs(h)))
  }

  /** Buffered-insert state (the KmvBuf discipline: O(1) appends, periodic
    * compaction to the sketch invariant). */
  final class Buf(var theta: Long, var arr: Array[Long], var n: Int)
      extends Serializable {
    def this() = this(UnsignedMax, new Array[Long](8192), 0)
    def add(h: Long): Unit = {
      if (unsignedLt(h, theta)) {
        if (n == arr.length) compact()
        arr(n) = h; n += 1
      }
    }
    def compact(): Unit = {
      val s = build(theta, arr, n)
      theta = s.theta
      System.arraycopy(s.entries, 0, arr, 0, s.entries.length)
      n = s.entries.length
    }
    def toSketch: Sketch = { compact(); Sketch(theta, java.util.Arrays.copyOf(arr, n)) }
    def absorb(s: Sketch): Unit = {
      val u = union(toSketch, s)
      theta = u.theta
      System.arraycopy(u.entries, 0, arr, 0, u.entries.length)
      n = u.entries.length
    }
  }

  /** theta_sketch_agg: aggregate pre-hashed 64-bit elements (xxhash64). */
  final class AggFromHashes extends Aggregator[Long, Buf, Array[Long]] {
    def zero: Buf = new Buf()
    def reduce(buf: Buf, h: Long): Buf = { buf.add(h); buf }
    def merge(a: Buf, b: Buf): Buf = { a.absorb(b.toSketch); a }
    def finish(buf: Buf): Array[Long] = buf.toSketch.serialize
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** theta_sketch_union as an AGGREGATE over sketch values. */
  final class UnionAgg extends Aggregator[Array[Long], Buf, Array[Long]] {
    def zero: Buf = new Buf()
    def reduce(buf: Buf, s: Array[Long]): Buf = { buf.absorb(deserialize(s)); buf }
    def merge(a: Buf, b: Buf): Buf = { a.absorb(b.toSketch); a }
    def finish(buf: Buf): Array[Long] = buf.toSketch.serialize
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** theta_sketch_intersection as an AGGREGATE over sketch values (the
    * identity is the full-space sketch only until the first input; an
    * empty aggregate yields the empty sketch). */
  final class IntersectAgg
      extends Aggregator[Array[Long], Option[Sketch], Array[Long]] {
    def zero: Option[Sketch] = None
    def reduce(st: Option[Sketch], s: Array[Long]): Option[Sketch] = {
      val in = deserialize(s)
      Some(st.fold(in)(intersect(_, in)))
    }
    def merge(a: Option[Sketch], b: Option[Sketch]): Option[Sketch] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(intersect(x, y))
        case (x, y) => x.orElse(y)
      }
    def finish(st: Option[Sketch]): Array[Long] =
      st.getOrElse(Sketch(UnsignedMax, Array.empty)).serialize
    def bufferEncoder: Encoder[Option[Sketch]] = Encoders.kryo[Option[Sketch]]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  // ---- Column API ----

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Aggregate a pre-hashed (xxhash64) column into a theta sketch. */
  def thetaSketchAgg(hashed: Column): Column = udaf(new AggFromHashes).apply(hashed)

  /** Merge a column of sketches (the reference's theta_sketch_union). */
  def thetaSketchUnion(sketches: Column): Column = udaf(new UnionAgg).apply(sketches)

  /** Intersect a column of sketches. */
  def thetaSketchIntersection(sketches: Column): Column =
    udaf(new IntersectAgg).apply(sketches)

  /** The reference's theta_sketch_cardinality(sketch) → double. */
  def thetaSketchCardinality(sketch: Column): Column =
    column(ThetaCardinality(expression(sketch)))
  def thetaSketchUnion2(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "union"))
  def thetaSketchIntersect2(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "intersect"))
  def thetaSketchANotB(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "a_not_b"))
}

/** theta_sketch_cardinality(sketch) → double estimate (exact below K). */
case class ThetaCardinality(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with KmvInput {
  import org.apache.spark.sql.types._
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkLongArray(Seq(child.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_sketch_cardinality"
  override def nullSafeEval(a: Any): Any =
    ThetaSketch.deserialize(arr(a)).estimate
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** Scalar two-sketch set algebra: union / intersect / a_not_b. */
case class ThetaSetOp(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with KmvInput {
  import org.apache.spark.sql.types._
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkLongArray(Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"theta_sketch_$op"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (ThetaSketch.deserialize(arr(a)), ThetaSketch.deserialize(arr(b)))
    val out = op match {
      case "union" => ThetaSketch.union(x, y)
      case "intersect" => ThetaSketch.intersect(x, y)
      case _ => ThetaSketch.aNotB(x, y)
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.serialize)
  }
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(left = l, right = r)
}
