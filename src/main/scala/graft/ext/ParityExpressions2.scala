package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-name-parity expressions, batch 2 (round 8): the remaining
  * reference scalar names that need real evaluation logic. Compositions of
  * Spark built-ins stay in functions.Registry; these carry semantics Spark
  * cannot express:
  *
  *  - strpos 3-arg (operator/scalar/StringFunctions.java stringPosition):
  *    1-based position of the Nth occurrence, negative N counts from the
  *    end, 0 on miss, N=0 is an error.
  *  - normalize (StringFunctions.java normalize): NFC/NFD/NFKC/NFKD.
  *  - to_iso8601 (DateTimeFunctions.java toISO8601FromDate / timestamp
  *    variants): date → yyyy-MM-dd, timestamp(6) → full micro precision.
  *  - json_extract / json_extract_scalar / json_size / json_array_get
  *    (JsonFunctions.java, JsonExtract.java): the legacy simple-path
  *    dialect ($.field, [idx], ["quoted field"]) — deliberately separate
  *    from the SQL/JSON 2016 engine in ext.JsonPath, which implements the
  *    standard path language.
  *  - parse_data_size (DataSizeFunctions.java): decimal(38,0) bytes with
  *    binary (1024) unit factors.
  *  - parse_duration (operator/scalar/DateTimeFunctions via airlift
  *    Duration): "<decimal> <unit>" → day-time interval.
  *  - human_readable_seconds (timestamp/HumanReadableSeconds.java).
  *  - combinations (ArrayCombinationsFunction.java): lexicographic
  *    index-order n-subsets, n ≤ 5, bounded result size.
  *  - ngrams (ArrayNgramsFunction.java): n clamped to array length.
  *  - contains_sequence (ArrayContainsSequence.java): contiguous
  *    subsequence test.
  *  - inverse_beta_cdf (MathFunctions.java:734): bisection inverse of the
  *    repo's regularized incomplete beta.
  *
  * Error model: domain violations throw (matching the reference's
  * INVALID_FUNCTION_ARGUMENT); malformed *data* (bad JSON) yields NULL so
  * TRY composes, mirroring the repo's existing json_parse convention.
  */
object ParityScalar2 {

  private[ext] def isIntegral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  def strposInstance(str: String, sub: String, instance: Long): Long = {
    if (instance == 0)
      throw new IllegalArgumentException("'instance' must be a non-zero number")
    if (sub.isEmpty) return 1L
    if (instance > 0) {
      var from = 0; var left = instance
      while (left > 0) {
        val i = str.indexOf(sub, from)
        if (i < 0) return 0L
        if (left == 1) return i + 1L
        from = i + 1; left -= 1
      }
      0L
    } else {
      var from = str.length; var left = -instance
      while (left > 0) {
        val i = str.lastIndexOf(sub, from)
        if (i < 0) return 0L
        if (left == 1) return i + 1L
        from = i - 1; left -= 1
      }
      0L
    }
  }

  /** Walk the legacy JSON path ($.field, [n], ["field"]) over a json4s AST.
    * Returns None when the path misses or the JSON is malformed. */
  def legacyWalk(json: String, path: String): Option[org.json4s.JValue] = {
    import org.json4s._
    val steps = parseLegacyPath(path).getOrElse(return None)
    var node: JValue =
      try org.json4s.jackson.JsonMethods.parse(json)
      catch { case _: Exception => return None }
    steps.foreach {
      case Left(field) =>
        node match {
          case JObject(fs) => node = fs.find(_._1 == field).map(_._2).getOrElse(return None)
          case _ => return None
        }
      case Right(idx) =>
        node match {
          case JArray(xs) =>
            if (idx < 0 || idx >= xs.length) return None
            node = xs(idx)
          case _ => return None
        }
    }
    Some(node)
  }

  /** $.a.b[0]["c d"] → List(Left(a), Left(b), Right(0), Left(c d)). */
  def parseLegacyPath(path: String): Option[List[Either[String, Int]]] = {
    if (path.isEmpty || path.charAt(0) != '$') return None
    val out = scala.collection.mutable.ListBuffer[Either[String, Int]]()
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          val start = i
          while (i < path.length && path.charAt(i) != '.' && path.charAt(i) != '[') i += 1
          if (i == start) return None
          out += Left(path.substring(start, i))
        case '[' =>
          i += 1
          if (i < path.length && path.charAt(i) == '"') {
            i += 1
            val start = i
            while (i < path.length && path.charAt(i) != '"') i += 1
            if (i >= path.length) return None
            out += Left(path.substring(start, i))
            i += 1
            if (i >= path.length || path.charAt(i) != ']') return None
            i += 1
          } else {
            val start = i
            while (i < path.length && path.charAt(i) != ']') i += 1
            if (i >= path.length) return None
            val t = path.substring(start, i)
            val n = try t.trim.toInt catch { case _: Exception => return None }
            out += Right(n)
            i += 1
          }
        case _ => return None
      }
    }
    Some(out.toList)
  }

  def renderJson(v: org.json4s.JValue): String =
    org.json4s.jackson.JsonMethods.compact(v)

  def scalarText(v: org.json4s.JValue): Option[String] = {
    import org.json4s._
    v match {
      case JString(s) => Some(s)
      case JInt(n) => Some(n.toString)
      case JLong(n) => Some(n.toString)
      case JDouble(n) => Some(n.toString)
      case JDecimal(n) => Some(n.toString)
      case JBool(b) => Some(b.toString)
      case JNull => None
      case _ => None // objects/arrays: json_extract_scalar returns NULL
    }
  }

  private val dataSizeUnits: Map[String, java.math.BigDecimal] = {
    def p(sh: Int) = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(sh))
    Map("B" -> p(0), "kB" -> p(10), "MB" -> p(20), "GB" -> p(30),
      "TB" -> p(40), "PB" -> p(50), "EB" -> p(60), "ZB" -> p(70), "YB" -> p(80))
  }

  def parseDataSize(s: String): java.math.BigInteger = {
    var i = 0
    while (i < s.length && (Character.isDigit(s.charAt(i)) || s.charAt(i) == '.')) i += 1
    if (i == 0) throw new IllegalArgumentException(s"Invalid data size: '$s'")
    val value =
      try new java.math.BigDecimal(s.substring(0, i))
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"Invalid data size: '$s'") }
    val unit = dataSizeUnits.getOrElse(s.substring(i),
      throw new IllegalArgumentException(s"Invalid data size: '$s'"))
    value.multiply(unit).toBigInteger
  }

  private val durationRe = """^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*$""".r
  private val durationUnitMicros: Map[String, Double] = Map(
    "ns" -> 1e-3, "us" -> 1.0, "ms" -> 1e3, "s" -> 1e6,
    "m" -> 60e6, "h" -> 3600e6, "d" -> 86400e6)

  /** airlift Duration.valueOf → micros (day-time interval payload). */
  def parseDurationMicros(s: String): Long = s match {
    case durationRe(num, unit) =>
      val factor = durationUnitMicros.getOrElse(unit,
        throw new IllegalArgumentException(s"Unknown time unit: $unit"))
      math.round(num.toDouble * factor)
    case _ => throw new IllegalArgumentException(s"duration is not a valid data duration string: $s")
  }

  def humanReadableSeconds(inputSeconds: Double): String = {
    if (inputSeconds.isNaN || inputSeconds.isInfinite)
      throw new IllegalArgumentException(s"Invalid argument found: $inputSeconds")
    var seconds = math.round(math.abs(inputSeconds))
    val weeks = seconds / 604800; seconds %= 604800
    val days = seconds / 86400; seconds %= 86400
    val hours = seconds / 3600; seconds %= 3600
    val minutes = seconds / 60; seconds %= 60
    def render(v: Long, name: String) = if (v == 1) s"$v $name" else s"$v ${name}s"
    val parts = Seq(weeks -> "week", days -> "day", hours -> "hour",
      minutes -> "minute", seconds -> "second").collect { case (v, n) if v > 0 => render(v, n) }
    if (parts.isEmpty) render(0, "second") else parts.mkString(", ")
  }

  /** Inverse regularized incomplete beta by bisection (the reference
    * delegates to commons-math BetaDistribution.inverseCumulativeProbability;
    * bisection against the same I_x(a,b) converges to double precision). */
  def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    if (!(p >= 0 && p <= 1))
      throw new IllegalArgumentException("p must be in the interval [0, 1]")
    if (!(a > 0 && b > 0))
      throw new IllegalArgumentException("a, b must be > 0")
    if (p == 0) return 0.0
    if (p == 1) return 1.0
    var lo = 0.0; var hi = 1.0
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2
      if (StatMath.regularizedBeta(mid, a, b) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }
}

case class StrPosInstance(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        ParityScalar2.isIntegral(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("strpos(varchar, varchar, bigint)")
  override def dataType: DataType = LongType
  override def prettyName: String = "strpos"
  override def nullSafeEval(s: Any, sub: Any, inst: Any): Any =
    ParityScalar2.strposInstance(s.toString, sub.toString,
      inst.asInstanceOf[Number].longValue())
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** normalize(s, form) — form pinned at plan time (the reference requires a
  * literal keyword too: StringFunctions.java normalize @SqlType enum). */
case class NormalizeForm(child: Expression, form: String) extends UnaryExpression with CodegenFallback {
  private val javaForm = java.text.Normalizer.Form.valueOf(form)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("normalize expects a string")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(v.toString, javaForm))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ToIso8601(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType | TimestampType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("to_iso8601 expects date or timestamp")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "to_iso8601"
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType =>
      UTF8String.fromString(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case TimestampType =>
      // session is pinned UTC; timestamp(6) renders all six fractional digits
      val micros = v.asInstanceOf[Long]
      val secs = Math.floorDiv(micros, 1000000L)
      val frac = Math.floorMod(micros, 1000000L)
      val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
      UTF8String.fromString(
        f"${ldt.toLocalDate.toString}T${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d.$frac%06d")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Legacy-path JSON extraction; mode ∈ json | scalar | size. */
case class LegacyJsonExtract(child: Expression, path: String, mode: String)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json functions expect a varchar json value")
  override def dataType: DataType = if (mode == "size") LongType else StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = false
  override def prettyName: String = if (mode == "size") "json_size" else s"json_extract_$mode"
  override def nullSafeEval(j: Any): Any = {
    import org.json4s._
    ParityScalar2.legacyWalk(j.toString, path) match {
      case None => null
      case Some(node) => mode match {
        case "json" => UTF8String.fromString(ParityScalar2.renderJson(node))
        case "scalar" =>
          ParityScalar2.scalarText(node).map(UTF8String.fromString).orNull
        case "size" => node match {
          case JObject(fs) => fs.length.toLong
          case JArray(xs) => xs.length.toLong
          case _ => 0L
        }
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JsonArrayGet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && ParityScalar2.isIntegral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_array_get(varchar, bigint)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "json_array_get"
  override def nullSafeEval(j: Any, ix: Any): Any = {
    import org.json4s._
    val idx = ix.asInstanceOf[Number].longValue()
    try org.json4s.jackson.JsonMethods.parse(j.toString) match {
      case JArray(xs) =>
        val i = if (idx < 0) xs.length + idx else idx
        if (i < 0 || i >= xs.length) null
        else UTF8String.fromString(ParityScalar2.renderJson(xs(i.toInt)))
      case _ => null
    } catch { case _: Exception => null }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class IsJsonScalar(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("is_json_scalar expects varchar")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "is_json_scalar"
  override def nullSafeEval(j: Any): Any = {
    import org.json4s._
    try org.json4s.jackson.JsonMethods.parse(j.toString, useBigDecimalForDouble = true) match {
      case JObject(_) | JArray(_) => false
      case _ => true
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ParseDataSize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("parse_data_size expects varchar")
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "parse_data_size"
  override def nullSafeEval(v: Any): Any =
    Decimal(new java.math.BigDecimal(ParityScalar2.parseDataSize(v.toString)), 38, 0)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ParseDuration(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("parse_duration expects varchar")
  override def dataType: DataType = DayTimeIntervalType()
  override def prettyName: String = "parse_duration"
  override def nullSafeEval(v: Any): Any = ParityScalar2.parseDurationMicros(v.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ToMilliseconds(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DayTimeIntervalType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("to_milliseconds expects a day-time interval")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "to_milliseconds"
  override def nullSafeEval(v: Any): Any = v.asInstanceOf[Long] / 1000L
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"$c / 1000L")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HumanReadableSecondsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("human_readable_seconds expects double")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "human_readable_seconds"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ParityScalar2.humanReadableSeconds(v.asInstanceOf[Double]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class InverseBetaCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("inverse_beta_cdf(double, double, double)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "inverse_beta_cdf"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    ParityScalar2.inverseBetaCdf(a.asInstanceOf[Double], b.asInstanceOf[Double], p.asInstanceOf[Double])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** combinations(array, n): n-element subsets in lexicographic index order
  * (reference ArrayCombinationsFunction.java:46 — same bounds: n ≤ 5,
  * ≤ 100000 result elements). */
case class CombinationsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_, _), t) if ParityScalar2.isIntegral(t) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("combinations(array, integer)")
  }
  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)
  override def prettyName: String = "combinations"
  override def nullSafeEval(arr: Any, nAny: Any): Any = {
    val elems = arr.asInstanceOf[ArrayData].toObjectArray(elemType)
    val n = nAny.asInstanceOf[Number].intValue()
    if (n < 0) throw new IllegalArgumentException(s"combination size must not be negative: $n")
    if (n > 5) throw new IllegalArgumentException(s"combination size must not exceed 5: $n")
    val len = elems.length
    if (n > len) return new GenericArrayData(Array.empty[Any])
    // count = C(len, n), bounded as in the reference
    var count = 1L
    var i = 0
    while (i < n) { count = count * (len - i) / (i + 1); i += 1 }
    if (count * n > 100000L)
      throw new IllegalArgumentException("combinations exceed max size")
    val out = new Array[Any](count.toInt)
    val idx = Array.tabulate(n)(identity)
    var r = 0
    var more = true
    while (more) {
      out(r) = new GenericArrayData(idx.map(elems(_)))
      r += 1
      // advance to the next lexicographic combination
      var j = n - 1
      while (j >= 0 && idx(j) == len - n + j) j -= 1
      if (j < 0) more = false
      else {
        idx(j) += 1
        var k = j + 1
        while (k < n) { idx(k) = idx(k - 1) + 1; k += 1 }
      }
      if (n == 0) more = false
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ngrams(array, n): windows of size min(n, len); n must be positive
  * (reference ArrayNgramsFunction.java). */
case class NgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_, _), t) if ParityScalar2.isIntegral(t) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("ngrams(array, integer)")
  }
  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)
  override def prettyName: String = "ngrams"
  override def nullSafeEval(arr: Any, nAny: Any): Any = {
    val elems = arr.asInstanceOf[ArrayData].toObjectArray(elemType)
    val n0 = nAny.asInstanceOf[Number].longValue()
    if (n0 <= 0) throw new IllegalArgumentException("N must be positive")
    val n = math.min(elems.length.toLong, n0).toInt
    val total = elems.length - n + 1
    val out = new Array[Any](math.max(total, 0))
    var i = 0
    while (i < total) {
      out(i) = new GenericArrayData(java.util.Arrays.copyOfRange(
        elems.asInstanceOf[Array[AnyRef]], i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** contains_sequence(array, seq): contiguous subsequence, null-position
  * identical semantics (reference ArrayContainsSequence.java). */
case class ContainsSequenceExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("contains_sequence(array(T), array(T))")
  }
  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_sequence"
  override def nullSafeEval(arr: Any, seqAny: Any): Any = {
    val a = arr.asInstanceOf[ArrayData].toObjectArray(elemType)
    val s = seqAny.asInstanceOf[ArrayData].toObjectArray(elemType)
    if (s.isEmpty) return true
    var i = 0
    val limit = a.length - s.length
    while (i <= limit) {
      var j = 0
      var ok = true
      while (ok && j < s.length) {
        val x = a(i + j); val y = s(j)
        ok = (x == null && y == null) || (x != null && x == y)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** array_first_match / array_last_match (reference ArrayFirstFunction.java /
  * ArrayLastFunction.java): first (last) element satisfying the predicate,
  * NULL when none does. A genuine HigherOrderFunction so lambda arguments
  * bind through the analyzer exactly as for exists/forall. */
case class ArrayFirstMatch(
    argument: org.apache.spark.sql.catalyst.expressions.Expression,
    function: org.apache.spark.sql.catalyst.expressions.Expression,
    fromEnd: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with org.apache.spark.sql.catalyst.expressions.ArrayBasedSimpleHigherOrderFunction
    with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{LambdaFunction, NamedLambdaVariable}

  override def dataType: DataType = argument.dataType.asInstanceOf[ArrayType].elementType
  override def nullable: Boolean = true
  override def prettyName: String = if (fromEnd) "array_last_match" else "array_first_match"

  override def bindInternal(
      f: (org.apache.spark.sql.catalyst.expressions.Expression, Seq[(DataType, Boolean)]) => LambdaFunction)
      : org.apache.spark.sql.catalyst.expressions.HigherOrderFunction = {
    val ArrayType(elementType, containsNull) = argument.dataType
    copy(function = f(function, (elementType, containsNull) :: Nil))
  }

  @transient private lazy val elementVar: NamedLambdaVariable =
    function.asInstanceOf[LambdaFunction].arguments.head.asInstanceOf[NamedLambdaVariable]

  override def nullSafeEval(inputRow: InternalRow, argumentValue: Any): Any = {
    val arr = argumentValue.asInstanceOf[ArrayData]
    val f = functionForEval
    val n = arr.numElements()
    var i = if (fromEnd) n - 1 else 0
    val step = if (fromEnd) -1 else 1
    while (i >= 0 && i < n) {
      val v = if (arr.isNullAt(i)) null else arr.get(i, elementVar.dataType)
      elementVar.value.set(v)
      if (f.eval(inputRow) == true) return v
      i += step
    }
    null
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): ArrayFirstMatch =
    copy(argument = newLeft, function = newRight)
}
