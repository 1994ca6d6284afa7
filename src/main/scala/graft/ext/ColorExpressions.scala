package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CLI-visualization color functions (reference operator/scalar/
  * ColorFunctions.java: color :88, rgb :109, the interpolating color
  * overloads :126/:144, bar :196/:202, render :161ff). The reference's
  * COLOR type is a BIGINT encoding — non-negative = 0xRRGGBB, negative =
  * -(ansi index + 1) for the 8 named system colors — and that exact
  * encoding is kept here so values are interchangeable. These are
  * terminal-rendering helpers, not analytics: CodegenFallback is fine
  * off the hot path. */
object ColorOps {
  private val systemColors = Map(
    "BLACK" -> 0, "RED" -> 1, "GREEN" -> 2, "YELLOW" -> 3,
    "BLUE" -> 4, "MAGENTA" -> 5, "CYAN" -> 6, "WHITE" -> 7)

  /** ColorFunctions.parseRgb: '#rgb' nibble-replicated to #rrggbb. */
  private def parseRgb(s: String): Int = {
    if (s.length != 4 || s.charAt(0) != '#') return -1
    val r = Character.digit(s.charAt(1), 16)
    val g = Character.digit(s.charAt(2), 16)
    val b = Character.digit(s.charAt(3), 16)
    if (r == -1 || g == -1 || b == -1) return -1
    (((r << 4) | r) << 16) | (((g << 4) | g) << 8) | ((b << 4) | b)
  }

  def color(s: String): Long = {
    val rgb = parseRgb(s)
    if (rgb != -1) rgb.toLong
    else systemColors.get(s.toUpperCase) match {
      case Some(i) => -(i + 1).toLong
      case None => throw new IllegalArgumentException(s"Invalid color: '$s'")
    }
  }

  def rgb(r: Long, g: Long, b: Long): Long = {
    require(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255,
      s"invalid RGB channel in rgb($r, $g, $b)")
    (r << 16) | (g << 8) | b
  }

  private def red(c: Long): Int = ((c >> 16) & 0xff).toInt
  private def green(c: Long): Int = ((c >> 8) & 0xff).toInt
  private def blue(c: Long): Int = (c & 0xff).toInt

  /** ColorFunctions.interpolate: linear in HSB space (java.awt.Color's
    * conversions — pure math, headless-safe). */
  def interpolate(fraction: Float, low: Long, high: Long): Int = {
    val lo = java.awt.Color.RGBtoHSB(red(low), green(low), blue(low), null)
    val hi = java.awt.Color.RGBtoHSB(red(high), green(high), blue(high), null)
    val h = fraction * (hi(0) - lo(0)) + lo(0)
    val s = fraction * (hi(1) - lo(1)) + lo(1)
    val v = fraction * (hi(2) - lo(2)) + lo(2)
    java.awt.Color.HSBtoRGB(h, s, v) & 0xffffff
  }

  /** Interpolating color(fraction, lowColor, highColor) :144. */
  def colorInterp(fraction: Double, low: Long, high: Long): Long = {
    require(low >= 0, "lowColor not a valid RGB color")
    require(high >= 0, "highColor not a valid RGB color")
    val f = math.min(math.max(fraction, 0.0), 1.0)
    interpolate(f.toFloat, low, high).toLong
  }

  /** 6×6×6 ANSI cube index (ColorFunctions.toAnsi). */
  private def toAnsi(c: Long): Int =
    if (c >= 0) {
      val r = red(c) * 6 / 256; val g = green(c) * 6 / 256; val b = blue(c) * 6 / 256
      16 + r * 36 + g * 6 + b
    } else (-c - 1).toInt

  private def escape(c: Long): String = s"\u001b[38;5;${toAnsi(c)}m"
  private val Reset = "\u001b[0m"

  /** ColorFunctions.bar — exact loop shape, including the int cast of
    * percent*width and the i/(width-1) gradient position. */
  def bar(percent: Double, width: Long, low: Long, high: Long): String = {
    var count: Long = (percent * width).toInt.toLong
    count = math.max(0L, math.min(width, count))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      val fraction = (i * 1.0 / (width - 1)).toFloat
      sb.append(escape(interpolate(fraction, low, high))).append('█')
      i += 1
    }
    sb.append(Reset)
    var j = count
    while (j < width) { sb.append(' '); j += 1 }
    sb.toString
  }

  def render(value: String, c: Long): String = escape(c) + value + Reset
  def renderBool(b: Boolean): String =
    if (b) render("✓", color("green")) else render("✗", color("red"))
}

/** color(varchar) → color code. */
case class ColorParse(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("color requires VARCHAR")
  override def dataType: DataType = LongType
  override def prettyName: String = "color"
  override def nullSafeEval(v: Any): Any = ColorOps.color(v.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** color(fraction, lowColor, highColor) — HSB interpolation — and the
  * 5-arg color(value, low, high, lowColor, highColor) rescaling overload. */
case class ColorInterp(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 3 || children.length == 5) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("color interpolation takes 3 or 5 arguments")
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "color"
  private def d(v: Any): Double = v.asInstanceOf[Number].doubleValue
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else if (children.length == 3)
      ColorOps.colorInterp(d(vs(0)),
        vs(1).asInstanceOf[Number].longValue, vs(2).asInstanceOf[Number].longValue)
    else
      ColorOps.colorInterp((d(vs(0)) - d(vs(1))) / (d(vs(2)) - d(vs(1))),
        vs(3).asInstanceOf[Number].longValue, vs(4).asInstanceOf[Number].longValue)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}

/** bar(percent, width[, lowColor, highColor]) → ANSI bar string. */
case class ColorBar(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 || children.length == 4) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bar takes 2 or 4 arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "bar"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val percent = vs(0).asInstanceOf[Number].doubleValue
    val width = vs(1).asInstanceOf[Number].longValue
    val (lo, hi) =
      if (children.length == 4)
        (vs(2).asInstanceOf[Number].longValue, vs(3).asInstanceOf[Number].longValue)
      else (ColorOps.rgb(255, 0, 0), ColorOps.rgb(0, 255, 0))
    UTF8String.fromString(ColorOps.bar(percent, width, lo, hi))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}

/** render(value, color) → ANSI-colored string; render(boolean) → ✓/✗. */
case class ColorRender(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 1 || children.length == 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("render takes 1 or 2 arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "render"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    UTF8String.fromString(
      if (children.length == 1) ColorOps.renderBool(vs(0).asInstanceOf[Boolean])
      else ColorOps.render(vs(0).toString, vs(1).asInstanceOf[Number].longValue))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}
