package graft.functions

import org.apache.commons.math3.distribution._
import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Probability distribution CDFs and inverse CDFs — the reference's
  * statistical scalar family (MathFunctions.java:233 binomial_cdf,
  * :844-1110 normal/beta/cauchy/chi_squared/f/gamma/laplace/poisson/t/
  * weibull cdf + inverses). The reference delegates to commons-math3
  * distributions; commons-math3 3.6.1 ships on Spark's classpath, so the
  * same kernels give bit-identical semantics. Argument validation mirrors
  * the reference's checkCondition messages (IllegalArgumentException →
  * NULL under TRY()).
  *
  * Each kernel is a static pure function → the expressions embed into
  * whole-stage codegen via a single static call, like the HMAC family.
  */
object DistKernels {
  private def check(ok: Boolean, msg: String): Unit =
    if (!ok) throw new IllegalArgumentException(msg)

  // -- 2-arg kernels --
  def chiSquaredCdf(df: Double, value: Double): Double = {
    check(value >= 0, "chiSquaredCdf Function: value must non-negative")
    check(df > 0, "chiSquaredCdf Function: df must be greater than 0")
    new ChiSquaredDistribution(null, df,
      ChiSquaredDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseChiSquaredCdf(df: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseChiSquaredCdf Function: p must be in the interval [0, 1]")
    check(df > 0, "inverseChiSquaredCdf Function: df must be greater than 0")
    new ChiSquaredDistribution(null, df,
      ChiSquaredDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def tCdf(df: Double, value: Double): Double = {
    check(df > 0, "df must be greater than 0")
    new TDistribution(null, df, TDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseTCdf(df: Double, p: Double): Double = {
    check(df > 0, "df must be greater than 0")
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    new TDistribution(null, df, TDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def poissonCdf(lambda: Double, value: Double): Double = {
    check(value >= 0, "poissonCdf Function: value must be a non-negative integer")
    check(lambda > 0, "poissonCdf Function: lambda must be greater than 0")
    new PoissonDistribution(lambda).cumulativeProbability(value.toInt)
  }
  def inversePoissonCdf(lambda: Double, p: Double): Double = {
    check(p >= 0 && p < 1, "inversePoissonCdf Function: p must be in the interval [0, 1)")
    check(lambda > 0, "inversePoissonCdf Function: lambda must be greater than 0")
    new PoissonDistribution(lambda).inverseCumulativeProbability(p).toDouble
  }

  // -- 3-arg kernels --
  def normalCdf(mean: Double, sd: Double, value: Double): Double = {
    check(sd > 0, "normalCdf Function: standardDeviation must be > 0")
    0.5 * (1 + Erf.erf((value - mean) / (sd * math.sqrt(2))))
  }
  def inverseNormalCdf(mean: Double, sd: Double, p: Double): Double = {
    check(p > 0 && p < 1, "inverseNormalCdf Function: p must be 0 > p > 1")
    check(sd > 0, "inverseNormalCdf Function: sd must be > 0")
    mean + sd * 1.4142135623730951 * Erf.erfInv(2 * p - 1)
  }
  def betaCdf(a: Double, b: Double, value: Double): Double = {
    check(value >= 0 && value <= 1, "betaCdf Function: value must be in the interval [0, 1]")
    check(a > 0, "betaCdf Function: a must be > 0")
    check(b > 0, "betaCdf Function: b must be > 0")
    new BetaDistribution(null, a, b, BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseBetaCdf Function: p must be in the interval [0, 1]")
    check(a > 0, "inverseBetaCdf Function: a must be > 0")
    check(b > 0, "inverseBetaCdf Function: b must be > 0")
    new BetaDistribution(null, a, b, BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def cauchyCdf(median: Double, scale: Double, value: Double): Double = {
    check(scale > 0, "cauchyCdf Function: scale must be greater than 0")
    new CauchyDistribution(null, median, scale,
      CauchyDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseCauchyCdf(median: Double, scale: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseCauchyCdf Function: p must be in the interval [0, 1]")
    check(scale > 0, "inverseCauchyCdf Function: scale must be greater than 0")
    new CauchyDistribution(null, median, scale,
      CauchyDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def fCdf(df1: Double, df2: Double, value: Double): Double = {
    check(value >= 0, "fCdf Function: value must non-negative")
    check(df1 > 0, "fCdf Function: numerator df must be greater than 0")
    check(df2 > 0, "fCdf Function: denominator df must be greater than 0")
    new FDistribution(null, df1, df2, FDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseFCdf(df1: Double, df2: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseFCdf Function: p must be in the interval [0, 1]")
    check(df1 > 0, "inverseFCdf Function: numerator df must be greater than 0")
    check(df2 > 0, "inverseFCdf Function: denominator df must be greater than 0")
    new FDistribution(null, df1, df2, FDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def gammaCdf(shape: Double, scale: Double, value: Double): Double = {
    check(value >= 0, "gammaCdf Function: value must be greater than, or equal to, 0")
    check(shape > 0, "gammaCdf Function: shape must be greater than 0")
    check(scale > 0, "gammaCdf Function: scale must be greater than 0")
    new GammaDistribution(null, shape, scale,
      GammaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseGammaCdf(shape: Double, scale: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseGammaCdf Function: p must be in the interval [0, 1]")
    check(shape > 0, "inverseGammaCdf Function: shape must be greater than 0")
    check(scale > 0, "inverseGammaCdf Function: scale must be greater than 0")
    new GammaDistribution(null, shape, scale,
      GammaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def laplaceCdf(mean: Double, scale: Double, value: Double): Double = {
    check(scale > 0, "laplaceCdf Function: scale must be greater than 0")
    new LaplaceDistribution(null, mean, scale).cumulativeProbability(value)
  }
  def inverseLaplaceCdf(mean: Double, scale: Double, p: Double): Double = {
    check(scale > 0, "inverseLaplaceCdf Function: scale must be greater than 0")
    check(p >= 0 && p <= 1, "inverseLaplaceCdf Function: p must be in the interval [0, 1]")
    new LaplaceDistribution(null, mean, scale).inverseCumulativeProbability(p)
  }
  def weibullCdf(a: Double, b: Double, value: Double): Double = {
    check(a > 0, "weibullCdf Function: a must be greater than 0")
    check(b > 0, "weibullCdf Function: b must be greater than 0")
    new WeibullDistribution(null, a, b,
      WeibullDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(value)
  }
  def inverseWeibullCdf(a: Double, b: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "inverseWeibullCdf Function: p must be in the interval [0, 1]")
    check(a > 0, "inverseWeibullCdf Function: a must be greater than 0")
    check(b > 0, "inverseWeibullCdf Function: b must be greater than 0")
    new WeibullDistribution(null, a, b,
      WeibullDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(p)
  }
  def binomialCdf(numberOfTrials: Double, successProbability: Double, value: Double): Double = {
    check(successProbability >= 0 && successProbability <= 1,
      "successProbability must be in the interval [0, 1]")
    check(numberOfTrials > 0, "numberOfTrials must be greater than 0")
    new BinomialDistribution(null, numberOfTrials.toInt, successProbability)
      .cumulativeProbability(value.toInt)
  }

  /** inverse_binomial_cdf (reference MathFunctions.java inverseBinomialCdf)
    * — same commons-math BinomialDistribution the reference uses, so the
    * smallest-k inversion agrees bit-for-bit. */
  def inverseBinomialCdf(numberOfTrials: Double, successProbability: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(successProbability >= 0 && successProbability <= 1,
      "successProbability must be in the interval [0, 1]")
    check(numberOfTrials > 0, "numberOfTrials must be greater than 0")
    new BinomialDistribution(null, numberOfTrials.toInt, successProbability)
      .inverseCumulativeProbability(p).toDouble
  }

  def apply2(fn: String, a: Double, b: Double): Double = fn match {
    case "chi_squared_cdf" => chiSquaredCdf(a, b)
    case "inverse_chi_squared_cdf" => inverseChiSquaredCdf(a, b)
    case "t_cdf" => tCdf(a, b)
    case "inverse_t_cdf" => inverseTCdf(a, b)
    case "poisson_cdf" => poissonCdf(a, b)
    case "inverse_poisson_cdf" => inversePoissonCdf(a, b)
    case other => throw new IllegalArgumentException(s"unknown 2-arg cdf $other")
  }
  def apply3(fn: String, a: Double, b: Double, c: Double): Double = fn match {
    case "normal_cdf" => normalCdf(a, b, c)
    case "inverse_normal_cdf" => inverseNormalCdf(a, b, c)
    case "beta_cdf" => betaCdf(a, b, c)
    case "inverse_beta_cdf" => inverseBetaCdf(a, b, c)
    case "cauchy_cdf" => cauchyCdf(a, b, c)
    case "inverse_cauchy_cdf" => inverseCauchyCdf(a, b, c)
    case "f_cdf" => fCdf(a, b, c)
    case "inverse_f_cdf" => inverseFCdf(a, b, c)
    case "gamma_cdf" => gammaCdf(a, b, c)
    case "inverse_gamma_cdf" => inverseGammaCdf(a, b, c)
    case "laplace_cdf" => laplaceCdf(a, b, c)
    case "inverse_laplace_cdf" => inverseLaplaceCdf(a, b, c)
    case "weibull_cdf" => weibullCdf(a, b, c)
    case "inverse_weibull_cdf" => inverseWeibullCdf(a, b, c)
    case "binomial_cdf" => binomialCdf(a, b, c)
    case "inverse_binomial_cdf" => inverseBinomialCdf(a, b, c)
    case other => throw new IllegalArgumentException(s"unknown 3-arg cdf $other")
  }
}

/** 2-arg distribution function: dispatches by reference SQL name.
  * Arguments are pre-cast to double by the builders (DistCall.{c2,c3}). */
case class DistCall2(fn: String, left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn requires double arguments")
  override def dataType: DataType = DoubleType
  override def prettyName: String = fn
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DistKernels.apply2(fn, a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""graft.functions.DistKernels.apply2("$fn", $a, $b)""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 3-arg distribution function: dispatches by reference SQL name. */
case class DistCall3(fn: String, first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn requires double arguments")
  override def dataType: DataType = DoubleType
  override def prettyName: String = fn
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    DistKernels.apply3(fn, a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"""graft.functions.DistKernels.apply3("$fn", $a, $b, $c)""")
  override protected def withNewChildrenInternal(
    f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Builders that coerce arguments to double (reference functions take
  * DOUBLE; integer args like poisson's value arrive as int/bigint). */
object DistCall {
  private def dbl(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  def c2(fn: String, a: Expression, b: Expression): Expression =
    DistCall2(fn, dbl(a), dbl(b))
  def c3(fn: String, a: Expression, b: Expression, c: Expression): Expression =
    DistCall3(fn, dbl(a), dbl(b), dbl(c))
}

/** Column API for the distribution family. */
object Distributions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def x(col: Column): Expression = Bridge.expression(col)
  private def d2(fn: String)(a: Column, b: Column): Column = c(DistCall.c2(fn, x(a), x(b)))
  private def d3(fn: String)(a: Column, b: Column, v: Column): Column =
    c(DistCall.c3(fn, x(a), x(b), x(v)))

  val names2: Seq[String] = Seq("chi_squared_cdf", "inverse_chi_squared_cdf",
    "t_cdf", "inverse_t_cdf", "poisson_cdf", "inverse_poisson_cdf")
  val names3: Seq[String] = Seq("normal_cdf", "inverse_normal_cdf", "beta_cdf",
    "inverse_beta_cdf", "cauchy_cdf", "inverse_cauchy_cdf", "f_cdf",
    "inverse_f_cdf", "gamma_cdf", "inverse_gamma_cdf", "laplace_cdf",
    "inverse_laplace_cdf", "weibull_cdf", "inverse_weibull_cdf", "binomial_cdf")

  def inverseBinomialCdfCol(n: Column, sp: Column, p: Column): Column =
    d3("inverse_binomial_cdf")(n, sp, p)
  def normalCdf(m: Column, sd: Column, v: Column): Column = d3("normal_cdf")(m, sd, v)
  def inverseNormalCdf(m: Column, sd: Column, p: Column): Column = d3("inverse_normal_cdf")(m, sd, p)
  def betaCdf(a: Column, b: Column, v: Column): Column = d3("beta_cdf")(a, b, v)
  def inverseBetaCdf(a: Column, b: Column, p: Column): Column = d3("inverse_beta_cdf")(a, b, p)
  def cauchyCdf(m: Column, s: Column, v: Column): Column = d3("cauchy_cdf")(m, s, v)
  def inverseCauchyCdf(m: Column, s: Column, p: Column): Column = d3("inverse_cauchy_cdf")(m, s, p)
  def fCdf(d1: Column, d2c: Column, v: Column): Column = d3("f_cdf")(d1, d2c, v)
  def inverseFCdf(d1: Column, d2c: Column, p: Column): Column = d3("inverse_f_cdf")(d1, d2c, p)
  def gammaCdf(sh: Column, sc: Column, v: Column): Column = d3("gamma_cdf")(sh, sc, v)
  def inverseGammaCdf(sh: Column, sc: Column, p: Column): Column = d3("inverse_gamma_cdf")(sh, sc, p)
  def laplaceCdf(m: Column, s: Column, v: Column): Column = d3("laplace_cdf")(m, s, v)
  def inverseLaplaceCdf(m: Column, s: Column, p: Column): Column = d3("inverse_laplace_cdf")(m, s, p)
  def weibullCdf(a: Column, b: Column, v: Column): Column = d3("weibull_cdf")(a, b, v)
  def inverseWeibullCdf(a: Column, b: Column, p: Column): Column = d3("inverse_weibull_cdf")(a, b, p)
  def binomialCdf(n: Column, p: Column, v: Column): Column = d3("binomial_cdf")(n, p, v)
  def chiSquaredCdf(df: Column, v: Column): Column = d2("chi_squared_cdf")(df, v)
  def inverseChiSquaredCdf(df: Column, p: Column): Column = d2("inverse_chi_squared_cdf")(df, p)
  def tCdf(df: Column, v: Column): Column = d2("t_cdf")(df, v)
  def inverseTCdf(df: Column, p: Column): Column = d2("inverse_t_cdf")(df, p)
  def poissonCdf(lambda: Column, v: Column): Column = d2("poisson_cdf")(lambda, v)
  /** reference returns INTEGER; kernel computes in double, cast here. */
  def inversePoissonCdf(lambda: Column, p: Column): Column =
    d2("inverse_poisson_cdf")(lambda, p).cast("int")
}
