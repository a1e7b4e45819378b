package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ColorUtil, GraftFunctions}

/** Color family interpolation + error semantics (ColorFunctions.java paths
  * the ANSI-string oracle gate doesn't reach). */
class ColorSpec extends AnyFunSuite {
  import TestSpark._

  test("HSB interpolation endpoints and midpoint") {
    val red = ColorUtil.rgb(255, 0, 0)
    val green = ColorUtil.rgb(0, 255, 0)
    assert(ColorUtil.colorInterp(0.0, red, green) == red)
    assert(ColorUtil.colorInterp(1.0, red, green) == green)
    // hue 0 → 1/3 at fraction .5 = 1/6 = pure yellow
    assert(ColorUtil.colorInterp(0.5, red, green) == ColorUtil.rgb(255, 255, 0))
    // fraction clamped to [0,1]
    assert(ColorUtil.colorInterp(7.0, red, green) == green)
  }

  test("scaled variant maps the value range") {
    val lo = ColorUtil.rgb(0, 0, 0)
    val hi = ColorUtil.rgb(255, 255, 255)
    assert(ColorUtil.colorScaled(5.0, 0.0, 10.0, lo, hi) ==
      ColorUtil.colorInterp(0.5, lo, hi))
  }

  test("invalid colors raise reference-style errors") {
    intercept[IllegalArgumentException](ColorUtil.color("notacolor"))
    intercept[IllegalArgumentException](ColorUtil.rgb(300, 0, 0))
    intercept[IllegalArgumentException](
      ColorUtil.colorInterp(0.5, -2, ColorUtil.rgb(0, 255, 0)))
  }

  test("SQL registration: color/rgb/render/bar resolve and run") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT color('#f00') AS a, rgb(0, 128, 255) AS b,
        |       render(7, rgb(0,255,0)) AS c, render(true) AS d,
        |       bar(0.5D, 4) AS e, color(0.5D, rgb(255,0,0), rgb(0,255,0)) AS f
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 0xFF0000L)
    assert(r.getLong(1) == (128L << 8 | 255L))
    assert(r.getString(2).contains("7") && r.getString(2).startsWith("[38;5;46m"))
    assert(r.getString(3).contains("✓"))
    assert(r.getString(4).count(_ == '█') == 2 && r.getString(4).endsWith("  "))
    assert(r.getLong(5) == 0xFFFF00L)
  }
}
