package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Terminal-presentation color functions — the reference's
  * ColorFunctions.java: `color` (named / #rgb shorthand / interpolated),
  * `rgb`, `render`, `bar`. Colors are bigints (rgb packed, system colors
  * as -(index+1), ColorFunctions.java:96); output strings carry ANSI
  * 256-color escapes (:255 toAnsi 6×6×6 cube mapping). These are cosmetic
  * CLI-output helpers, never analytical hot-path, so the expression uses
  * eval dispatch (CodegenFallback) rather than codegen kernels. */
object ColorUtil {
  private val SystemColors = Map(
    "BLACK" -> 0, "RED" -> 1, "GREEN" -> 2, "YELLOW" -> 3,
    "BLUE" -> 4, "MAGENTA" -> 5, "CYAN" -> 6, "WHITE" -> 7)
  private val AnsiReset = "[0m"

  def rgb(r: Long, g: Long, b: Long): Long = {
    require(r >= 0 && r <= 255, "red must be between 0 and 255")
    require(g >= 0 && g <= 255, "green must be between 0 and 255")
    require(b >= 0 && b <= 255, "blue must be between 0 and 255")
    (r << 16) | (g << 8) | b
  }

  /** '#rgb' css shorthand → packed rgb, else -1. */
  private def parseRgb(s: String): Long = {
    if (s.length != 4 || s.charAt(0) != '#') return -1
    val ds = s.substring(1).map(c => Character.digit(c, 16))
    if (ds.exists(_ == -1)) return -1
    val Seq(r, g, b) = ds.map(d => (d << 4) | d)
    rgb(r, g, b)
  }

  def color(s: String): Long = {
    val v = parseRgb(s)
    if (v != -1) v
    else SystemColors.get(s.toUpperCase) match {
      case Some(i) => -(i + 1)
      case None => throw new IllegalArgumentException(s"Invalid color: '$s'")
    }
  }

  private def red(c: Long): Int = { require(c >= 0, "color is not a valid rgb value"); ((c >>> 16) & 0xff).toInt }
  private def green(c: Long): Int = { require(c >= 0, "color is not a valid rgb value"); ((c >>> 8) & 0xff).toInt }
  private def blue(c: Long): Int = { require(c >= 0, "color is not a valid rgb value"); (c & 0xff).toInt }

  /** HSB-space interpolation, as the reference (java.awt.Color math). */
  def interpolate(fraction: Float, lowRgb: Long, highRgb: Long): Long = {
    val lo = java.awt.Color.RGBtoHSB(red(lowRgb), green(lowRgb), blue(lowRgb), null)
    val hi = java.awt.Color.RGBtoHSB(red(highRgb), green(highRgb), blue(highRgb), null)
    val h = fraction * (hi(0) - lo(0)) + lo(0)
    val s = fraction * (hi(1) - lo(1)) + lo(1)
    val v = fraction * (hi(2) - lo(2)) + lo(2)
    java.awt.Color.HSBtoRGB(h, s, v) & 0xFFFFFF
  }

  def colorInterp(fraction: Double, lowColor: Long, highColor: Long): Long = {
    require(lowColor >= 0, "lowColor not a valid RGB color")
    require(highColor >= 0, "highColor not a valid RGB color")
    interpolate(math.max(0, math.min(1, fraction)).toFloat, lowColor, highColor)
  }

  def colorScaled(value: Double, low: Double, high: Double, lowColor: Long, highColor: Long): Long =
    colorInterp((value - low) / (high - low), lowColor, highColor)

  private def toAnsi(r: Int, g: Int, b: Int): Int =
    16 + (r * 6 / 256) * 36 + (g * 6 / 256) * 6 + (b * 6 / 256)

  private def toAnsi(c: Long): Int =
    if (c >= 0) toAnsi(red(c), green(c), blue(c)) else (-c - 1).toInt

  private def escape(c: Long): String = "[38;5;" + toAnsi(c) + 'm'

  def render(value: String, c: Long): String = escape(c) + value + AnsiReset

  def renderBool(b: Boolean): String =
    if (b) render("✓", color("green")) else render("✗", color("red"))

  def bar(percent: Double, width: Long, lowColor: Long, highColor: Long): String = {
    val count = math.max(0, math.min(width, (percent * width).toInt))
    val sb = new StringBuilder
    var i = 0
    while (i < count) {
      val fraction = (i * 1.0 / (width - 1)).toFloat
      sb.append(escape(interpolate(fraction, lowColor, highColor))).append('█')
      i += 1
    }
    sb.append(AnsiReset)
    var j = count
    while (j < width) { sb.append(' '); j += 1 }
    sb.toString
  }

  def bar(percent: Double, width: Long): String =
    bar(percent, width, rgb(255, 0, 0), rgb(0, 255, 0))
}

/** Dispatch expression for the color family. Presentation-only → eval
  * dispatch; arguments pre-coerced by the SQL builders. */
case class ColorCall(fn: String, children: Seq[Expression])
  extends Expression with CodegenFallback {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = fn match {
    case "render" | "render_bool" | "bar" => StringType
    case _ => LongType
  }
  override def prettyName: String = if (fn.startsWith("render")) "render" else fn
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def d(i: Int) = vs(i).asInstanceOf[Number].doubleValue()
    def l(i: Int) = vs(i).asInstanceOf[Number].longValue()
    def s(i: Int) = vs(i).asInstanceOf[UTF8String].toString
    fn match {
      case "color" => ColorUtil.color(s(0))
      case "rgb" => ColorUtil.rgb(l(0), l(1), l(2))
      case "color_interp" => ColorUtil.colorInterp(d(0), l(1), l(2))
      case "color_scaled" => ColorUtil.colorScaled(d(0), d(1), d(2), l(3), l(4))
      case "render" => UTF8String.fromString(ColorUtil.render(s(0), l(1)))
      case "render_bool" =>
        UTF8String.fromString(ColorUtil.renderBool(vs(0).asInstanceOf[Boolean]))
      case "bar" =>
        if (children.length == 2) UTF8String.fromString(ColorUtil.bar(d(0), l(1)))
        else UTF8String.fromString(ColorUtil.bar(d(0), l(1), l(2), l(3)))
      case other => throw new IllegalArgumentException(s"unknown color fn $other")
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** Column API mirroring the reference overloads. */
object Colors {
  private def c(fn: String, args: Column*): Column =
    Bridge.column(ColorCall(fn, args.map(Bridge.expression)))
  def color(name: Column): Column = c("color", name)
  def rgb(r: Column, g: Column, b: Column): Column = c("rgb", r, g, b)
  def color(fraction: Column, low: Column, high: Column): Column =
    c("color_interp", fraction, low, high)
  def render(v: Column, col: Column): Column = c("render", v, col)
  def renderBool(v: Column): Column = c("render_bool", v)
  def bar(percent: Column, width: Column): Column = c("bar", percent, width)
  def bar(percent: Column, width: Column, lo: Column, hi: Column): Column =
    c("bar", percent, width, lo, hi)
}
