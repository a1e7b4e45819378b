package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DistKernels, Distributions, GraftFunctions}

/** Distribution CDF family (reference MathFunctions.java:233,844-1110):
  * SQL registration, known mathematical values, reference error semantics
  * (IllegalArgumentException on invalid params), and TRY() interop. The
  * oracle gate (fn_cdf) covers closed-form parity; this spec covers the
  * paths the gate can't: errors, SQL names, and null propagation. */
class DistributionSpec extends AnyFunSuite {
  import TestSpark._

  test("SQL names registered and give textbook values") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT normal_cdf(0D, 1D, 0D) AS a,
        |       cauchy_cdf(0D, 1D, 0D) AS b,
        |       chi_squared_cdf(2D, CAST(2 * ln(2) AS DOUBLE)) AS c,
        |       inverse_poisson_cdf(3D, 0.5D) AS d,
        |       binomial_cdf(4, 0.5D, 4) AS e
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.5)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12) // chi²₂ = Exp(2): median 2ln2
    assert(r.getDouble(3) == 3.0) // smallest k with Poisson(3) cdf ≥ 0.5
    assert(r.getDouble(4) == 1.0)
  }

  test("kernel symmetry and monotonicity") {
    // normal symmetry: F(μ+d) + F(μ-d) = 1
    assert(math.abs(DistKernels.normalCdf(2, 3, 5) + DistKernels.normalCdf(2, 3, -1) - 1) < 1e-12)
    // t symmetric around 0
    assert(math.abs(DistKernels.tCdf(7, 1.3) + DistKernels.tCdf(7, -1.3) - 1) < 1e-12)
    // weibull monotone
    val w = Seq(0.5, 1.0, 2.0, 4.0).map(DistKernels.weibullCdf(1.5, 2.0, _))
    assert(w == w.sorted && w.distinct.size == w.size)
    // inverse roundtrip at double precision for the analytic inverses
    assert(math.abs(DistKernels.inverseNormalCdf(0, 1, DistKernels.normalCdf(0, 1, 1.7)) - 1.7) < 1e-9)
  }

  test("reference error semantics: invalid params throw, TRY gives null") {
    intercept[IllegalArgumentException](DistKernels.normalCdf(0, -1, 0))
    intercept[IllegalArgumentException](DistKernels.betaCdf(2, 3, 1.5))
    intercept[IllegalArgumentException](DistKernels.poissonCdf(-1, 2))
    intercept[IllegalArgumentException](DistKernels.inverseNormalCdf(0, 1, 1.5))
    // through the engine: a bad row errors the query...
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT normal_cdf(0D, -1D, 0D)").collect()
    }
    assert(err.isInstanceOf[SparkException] || err.isInstanceOf[IllegalArgumentException])
    // ...and TRY() turns it into NULL (reference TRY semantics)
    val viaTry = spark.sql("SELECT try_expr(normal_cdf(0D, -1D, 0D)) AS v").collect()(0)
    assert(viaTry.isNullAt(0))
  }

  test("null propagation and integer coercion") {
    import spark.implicits._
    val df = Seq((Some(1.0), 4), (None, 9)).toDF("x", "n")
    val out = df.select(
      Distributions.normalCdf(lit(0.0), lit(1.0), col("x")).as("p"),
      Distributions.poissonCdf(lit(2.0), col("n")).as("q")).collect()
    assert(!out(0).isNullAt(0) && out(0).getDouble(1) > 0.9)
    assert(out(1).isNullAt(0))
  }
}
