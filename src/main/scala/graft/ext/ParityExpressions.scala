package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-name-parity expressions (round 8): the reference scalar names
  * that neither map 1:1 onto a Spark built-in nor compose from existing
  * expressions (those are assembled in functions.Registry / the dialect
  * rename maps instead).
  *
  *  - t_cdf / t_pdf (reference MathFunctions.java — the commons-math
  *    TDistribution delegation): Student-t via the repo's regularized
  *    incomplete beta (StatMath), pdf via Lanczos log-gamma.
  *  - murmur3 (operator/scalar/VarbinaryFunctions.java murmur3): the public
  *    MurmurHash3 x64 128-bit algorithm (Appleby, public domain), 16-byte
  *    result, seed 0 — known-answer vectors in FunctionSpec.
  *  - regexp_position (operator/scalar/JoniRegexpFunctions.java): 1-based
  *    index of the first match, -1 when none (NOT 0 — Spark's regexp_instr
  *    convention differs).
  *  - json_array_contains (operator/scalar/JsonFunctions.java): top-level
  *    array membership of a scalar, NULL on malformed/non-array JSON.
  *  - json_parse: canonical compact rendering, NULL on malformed input
  *    (TRY-friendly; the reference throws).
  */
object ParityMath {
  /** Student-t CDF: x≥0 → 1 − I_{ν/(ν+x²)}(ν/2, ½)/2, symmetric below. */
  def tCdf(x: Double, df: Double): Double = {
    if (df <= 0 || x.isNaN) return Double.NaN
    val ib = StatMath.regularizedBeta(df / (df + x * x), df / 2.0, 0.5)
    if (x >= 0) 1.0 - 0.5 * ib else 0.5 * ib
  }

  /** Student-t PDF via log-gamma. */
  def tPdf(x: Double, df: Double): Double = {
    if (df <= 0 || x.isNaN) return Double.NaN
    val logNorm = StatMath.lgamma((df + 1) / 2.0) - StatMath.lgamma(df / 2.0) -
      0.5 * math.log(df * math.Pi)
    math.exp(logNorm - (df + 1) / 2.0 * math.log1p(x * x / df))
  }

  /** MurmurHash3 x64 128-bit, seed 0 (Appleby's reference layout: two
    * little-endian 64-bit words h1 ++ h2). */
  def murmur3x64128(data: Array[Byte]): Array[Byte] = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val len = data.length
    var h1 = 0L; var h2 = 0L
    def rotl(v: Long, r: Int): Long = java.lang.Long.rotateLeft(v, r)
    def getLong(off: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (data(off + i) & 0xffL); i -= 1 }
      v
    }
    val nblocks = len / 16
    var b = 0
    while (b < nblocks) {
      var k1 = getLong(b * 16)
      var k2 = getLong(b * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    val tail = nblocks * 16
    var k1 = 0L; var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var i = rem - 1
      while (i >= 8) { k2 ^= (data(tail + i) & 0xffL) << ((i - 8) * 8); i -= 1 }
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= (data(tail + i) & 0xffL) << (i * 8); i -= 1 }
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    def fmix(k0: Long): Long = {
      var k = k0
      k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
      k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
      k ^= k >>> 33
      k
    }
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) { out(i) = (h1 >>> (i * 8)).toByte; out(8 + i) = (h2 >>> (i * 8)).toByte; i += 1 }
    out
  }
}

/** t_cdf(x, df) / t_pdf(x, df). */
case class StudentT(left: Expression, right: Expression, isCdf: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (double, double)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (isCdf) "t_cdf" else "t_pdf"
  override def nullSafeEval(x: Any, df: Any): Any =
    if (isCdf) ParityMath.tCdf(x.asInstanceOf[Double], df.asInstanceOf[Double])
    else ParityMath.tPdf(x.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** murmur3(varbinary) → 16-byte varbinary. */
case class Murmur3Hash128(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("murmur3 expects varbinary")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "murmur3"
  override def nullSafeEval(b: Any): Any =
    ParityMath.murmur3x64128(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** regexp_position(string, pattern): 1-based first-match index, -1 if none. */
case class RegexpPosition(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("regexp_position expects (string, string)")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "regexp_position"
  @transient private lazy val compiled: java.util.regex.Pattern = right match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
      java.util.regex.Pattern.compile(v.toString)
    case _ => null
  }
  override def nullSafeEval(s: Any, p: Any): Any = {
    val pat = if (compiled != null) compiled
      else java.util.regex.Pattern.compile(p.asInstanceOf[UTF8String].toString)
    val m = pat.matcher(s.asInstanceOf[UTF8String].toString)
    if (m.find()) m.start() + 1 else -1
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** json_array_contains(json, value): scalar membership in a top-level JSON
  * array; NULL for malformed / non-array input (lax, TRY-friendly). */
case class JsonArrayContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_array_contains expects (json string, scalar)")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "json_array_contains"
  override def nullSafeEval(j: Any, v: Any): Any = {
    import org.json4s._
    try {
      org.json4s.jackson.JsonMethods.parse(j.asInstanceOf[UTF8String].toString) match {
        case JArray(elems) =>
          val hit = v match {
            case b: java.lang.Boolean => elems.exists {
              case JBool(x) => x == b.booleanValue(); case _ => false
            }
            case s: UTF8String => elems.exists {
              case JString(x) => x == s.toString; case _ => false
            }
            case n: java.lang.Long => elems.exists {
              case JInt(x) => x == BigInt(n); case JLong(x) => x == n.longValue()
              case JDecimal(x) => x == BigDecimal(n); case JDouble(x) => x == n.doubleValue()
              case _ => false
            }
            case d: java.lang.Double => elems.exists {
              case JDouble(x) => x == d.doubleValue()
              case JDecimal(x) => x.toDouble == d.doubleValue()
              case JInt(x) => x.toDouble == d.doubleValue()
              case _ => false
            }
            case _ => false
          }
          java.lang.Boolean.valueOf(hit)
        case _ => null
      }
    } catch { case _: Exception => null }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** json_parse(varchar): canonical compact JSON text, NULL on malformed. */
case class JsonCanonical(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_parse expects a string")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "json_parse"
  override def nullSafeEval(j: Any): Any =
    try {
      val parsed = org.json4s.jackson.JsonMethods.parse(j.asInstanceOf[UTF8String].toString)
      UTF8String.fromString(org.json4s.jackson.JsonMethods.compact(parsed))
    } catch { case _: Exception => null }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
