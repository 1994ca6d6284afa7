package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Quantile + heavy-hitter sketch aggregates (SURVEY.md §2.4).
  *
  * Reference counterparts:
  *  - qdigest/tdigest aggregations + value_at_quantile (reference:
  *    core/trino-main/src/main/java/io/trino/operator/aggregation/
  *    QuantileDigestAggregationFunction.java:41, TDigestAggregationFunction.java,
  *    scalar extractors QuantileDigestFunctions.java:40 / TDigestFunctions.java:31):
  *    here a merging t-digest (Dunning's algorithm: centroids bounded by the
  *    q(1−q) scale function) as a typed Aggregator whose partial state IS the
  *    digest — partial aggregation ships compressed centroids, not rows,
  *    exactly like the reference serializes digest state between stages.
  *  - approx_most_frequent (reference: operator/aggregation/
  *    ApproximateMostFrequentFunction): the space-saving sketch
  *    (Metwally et al., "Efficient computation of frequent and top-k elements
  *    in data streams") with capacity-bounded counters and mergeable state.
  *    With capacity ≥ |distinct| the counts are exact — which the oracle
  *    exploits — and with smaller capacity the usual ε·N error bound holds.
  *
  * Scale: both buffers are O(compression)/O(capacity) regardless of input
  * rows, so map-side partials stay small and the final merge is cheap.
  */
object Sketches {

  // ---------------------------------------------------------------- t-digest

  /** Merging t-digest. Not thread-shared; used inside Aggregator buffers. */
  final class TDigest(val compression: Double) extends Serializable {
    var means: Array[Double] = Array.empty
    var weights: Array[Double] = Array.empty
    private var bufV: Array[Double] = new Array[Double](64)
    private var bufW: Array[Double] = new Array[Double](64)
    private var bufN = 0
    var total: Double = 0.0

    def add(x: Double): Unit = add(x, 1.0)

    /** Weighted insertion (reference approx_percentile(x, weight, q) —
      * operator/aggregation/TDigestAggregationFunction weighted form). */
    def add(x: Double, w: Double): Unit = {
      if (bufN == bufV.length) compress()
      bufV(bufN) = x; bufW(bufN) = w; bufN += 1; total += w
    }

    def merge(o: TDigest): Unit = {
      // append ALL incoming centroids, then recluster once — per-centroid
      // reclustering would make merges O(C² log C) in centroid count
      o.compress()
      compress()
      means = means ++ o.means
      weights = weights ++ o.weights
      var i = 0
      while (i < o.weights.length) { total += o.weights(i); i += 1 }
      recluster()
    }

    def compress(): Unit = {
      if (bufN == 0) return
      val bv = java.util.Arrays.copyOf(bufV, bufN)
      val bw = java.util.Arrays.copyOf(bufW, bufN)
      bufN = 0
      means = means ++ bv
      weights = weights ++ bw
      recluster()
    }

    /** Sort centroids by mean and greedily merge neighbours within the
      * q(1−q)·4·total/compression weight bound. */
    private def recluster(): Unit = {
      if (means.isEmpty) return
      val idx = means.indices.toArray.sortBy(means)
      val ms = idx.map(means); val ws = idx.map(weights)
      val outM = scala.collection.mutable.ArrayBuffer[Double]()
      val outW = scala.collection.mutable.ArrayBuffer[Double]()
      var cm = ms(0); var cw = ws(0); var cum = 0.0
      var i = 1
      while (i < ms.length) {
        val q = (cum + (cw + ws(i)) / 2) / math.max(total, 1.0)
        val limit = 4.0 * total * q * (1 - q) / compression
        if (cw + ws(i) <= math.max(limit, 1.0)) {
          cm = (cm * cw + ms(i) * ws(i)) / (cw + ws(i)); cw += ws(i)
        } else {
          outM += cm; outW += cw; cum += cw
          cm = ms(i); cw = ws(i)
        }
        i += 1
      }
      outM += cm; outW += cw
      means = outM.toArray; weights = outW.toArray
    }

    /** value_at_quantile: linear interpolation between centroid means. */
    def quantile(q: Double): Double = {
      compress()
      if (means.isEmpty) return Double.NaN
      if (means.length == 1) return means(0)
      val target = q * total
      var cum = 0.0
      var i = 0
      while (i < means.length) {
        val c = weights(i) / 2
        if (cum + c >= target) {
          if (i == 0) return means(0)
          val prevCum = cum - weights(i - 1) / 2
          val frac = (target - prevCum) / ((cum + c) - prevCum)
          return means(i - 1) + (means(i) - means(i - 1)) * math.min(math.max(frac, 0.0), 1.0)
        }
        cum += weights(i)
        i += 1
      }
      means.last
    }

    /** quantile_at_value: the inverse CDF — rank fraction of `v`, linearly
      * interpolated between centroid midpoints (reference
      * operator/scalar/TDigestFunctions quantile_at_value; same estimator as
      * the public t-digest cdf()). */
    def quantileAtValue(v: Double): Double = {
      compress()
      if (means.isEmpty) return Double.NaN
      if (v <= means(0)) return 0.0
      if (v >= means.last) return 1.0
      var cum = 0.0
      var i = 0
      while (i < means.length - 1) {
        if (v >= means(i) && v < means(i + 1)) {
          val mid = cum + weights(i) / 2
          val nextMid = cum + weights(i) + weights(i + 1) / 2
          val frac = (v - means(i)) / (means(i + 1) - means(i))
          return (mid + frac * (nextMid - mid)) / total
        }
        cum += weights(i)
        i += 1
      }
      1.0
    }
  }

  private class TDigestQuantiles(qs: Seq[Double], compression: Double)
      extends Aggregator[Double, TDigest, Array[Double]] {
    def zero: TDigest = new TDigest(compression)
    def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
    def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
    def finish(d: TDigest): Array[Double] = qs.map(d.quantile).toArray
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** tdigest_agg + value_at_quantile in one step: approximate quantiles of a
    * double column at the given q's. */
  def tdigestQuantiles(c: Column, qs: Seq[Double], compression: Double = 200.0): Column =
    udaf(new TDigestQuantiles(qs, compression), Encoders.scalaDouble).apply(c)

  private class TDigestQuantilesAtValues(vs: Seq[Double], compression: Double)
      extends Aggregator[Double, TDigest, Array[Double]] {
    def zero: TDigest = new TDigest(compression)
    def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
    def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
    def finish(d: TDigest): Array[Double] = vs.map(d.quantileAtValue).toArray
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** tdigest_agg + quantile_at_value: approximate rank fractions of the given
    * values (the inverse of [[tdigestQuantiles]]). */
  def tdigestQuantilesAtValues(c: Column, vs: Seq[Double], compression: Double = 200.0): Column =
    udaf(new TDigestQuantilesAtValues(vs, compression), Encoders.scalaDouble).apply(c)

  private class TDigestQuantilesWeighted(qs: Seq[Double], compression: Double)
      extends Aggregator[(Double, Double), TDigest, Array[Double]] {
    def zero: TDigest = new TDigest(compression)
    def reduce(b: TDigest, xw: (Double, Double)): TDigest = { b.add(xw._1, xw._2); b }
    def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
    def finish(d: TDigest): Array[Double] = qs.map(d.quantile).toArray
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Weighted approx_percentile (reference approx_percentile(x, weight, qs),
    * operator/aggregation/TDigestAggregationFunction.java weighted overload):
    * each x carries an integral/fractional weight — the digest state stays
    * O(compression) regardless of total weight. */
  def tdigestQuantilesWeighted(c: Column, w: Column, qs: Seq[Double],
      compression: Double = 200.0): Column =
    udaf(new TDigestQuantilesWeighted(qs, compression),
      ExpressionEncoder[(Double, Double)]()).apply(c, w)

  // ------------------------------------------------- digest-as-value flow

  /** The t-digest as a first-class VALUE (reference `tdigest` type flowing
    * between tdigest_agg → merge → the scalar extractors, TDigestFunctions
    * .java:31): a struct of centroid means/weights + compression, so
    * digests group, shuffle, and re-aggregate like any column. */
  final case class TDigestState(means: Array[Double], weights: Array[Double],
      compression: Double)

  private[graft] def stateOf(d: TDigest): TDigestState = {
    d.compress()
    TDigestState(d.means, d.weights, d.compression)
  }
  private[graft] def ofState(s: TDigestState): TDigest = {
    val d = new TDigest(s.compression)
    var i = 0
    while (i < s.means.length) { d.add(s.means(i), s.weights(i)); i += 1 }
    d.compress()
    d
  }

  private class TDigestAgg(compression: Double)
      extends Aggregator[Double, TDigest, TDigestState] {
    def zero: TDigest = new TDigest(compression)
    def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
    def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
    def finish(d: TDigest): TDigestState = stateOf(d)
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[TDigestState] = ExpressionEncoder[TDigestState]()
  }

  // input is Tuple1-wrapped: udaf() flattens a bare case-class input into
  // one ARGUMENT per field, but the digest must arrive as ONE struct column
  private class TDigestMergeAgg
      extends Aggregator[Tuple1[TDigestState], TDigest, TDigestState] {
    def zero: TDigest = new TDigest(200.0)
    def reduce(b: TDigest, s: Tuple1[TDigestState]): TDigest = { b.merge(ofState(s._1)); b }
    def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
    def finish(d: TDigest): TDigestState = stateOf(d)
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[TDigestState] = ExpressionEncoder[TDigestState]()
  }

  /** tdigest_agg(x) → digest value (reference TDigestAggregationFunction). */
  def tdigestAgg(c: Column, compression: Double = 200.0): Column =
    udaf(new TDigestAgg(compression), Encoders.scalaDouble).apply(c)

  /** merge(tdigest) → digest value (reference MergeTDigestAggregation). */
  def tdigestMerge(c: Column): Column =
    udaf(new TDigestMergeAgg, ExpressionEncoder[Tuple1[TDigestState]]()).apply(c)

  /** SQL-name registration of the digest-value aggregates (the scalar
    * extractors are native expressions in ext.TDigestExpressions). */
  def registerAggregates(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("tdigest_agg",
      udaf(new TDigestAgg(200.0), Encoders.scalaDouble))
    spark.udf.register("merge_tdigest",
      udaf(new TDigestMergeAgg, ExpressionEncoder[Tuple1[TDigestState]]()))
  }

  // ------------------------------------------------------------ space-saving

  /** Space-saving counter set: value → (count, maxError). */
  final class SpaceSaving(val capacity: Int) extends Serializable {
    val counts = scala.collection.mutable.HashMap[String, (Long, Long)]()

    def add(v: String, c: Long, err: Long): Unit = counts.get(v) match {
      case Some((cc, ee)) => counts(v) = (cc + c, ee + err)
      case None =>
        if (counts.size < capacity) counts(v) = (c, err)
        else {
          // evict the (count, value)-minimal entry; inherit its count as error
          val (mv, (mc, _)) = counts.minBy { case (k, (cc, _)) => (cc, k) }
          counts.remove(mv)
          counts(v) = (mc + c, mc + err)
        }
    }

    def merge(o: SpaceSaving): Unit =
      o.counts.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .foreach { case (v, (c, e)) => add(v, c, e) }

    /** Top-k rendered "value:count" by (count desc, value asc). */
    def render(k: Int): String =
      counts.toSeq.sortBy { case (v, (c, _)) => (-c, v) }.take(k)
        .map { case (v, (c, _)) => s"$v:$c" }.mkString(",")
  }

  private class ApproxMostFrequent(k: Int, capacity: Int)
      extends Aggregator[String, SpaceSaving, String] {
    def zero: SpaceSaving = new SpaceSaving(capacity)
    def reduce(b: SpaceSaving, v: String): SpaceSaving = { if (v != null) b.add(v, 1, 0); b }
    def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = { a.merge(b); a }
    def finish(s: SpaceSaving): String = s.render(k)
    def bufferEncoder: Encoder[SpaceSaving] = Encoders.kryo[SpaceSaving]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** approx_most_frequent(k, col) with `capacity` counters; exact when
    * capacity ≥ |distinct values|. */
  def approxMostFrequent(c: Column, k: Int, capacity: Int): Column =
    udaf(new ApproxMostFrequent(k, capacity), Encoders.STRING).apply(c)
}
