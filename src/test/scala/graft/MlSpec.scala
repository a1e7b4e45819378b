package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, MlModel}

/** The ML surface (functions/MlModel.scala; reference presto-ml): trained
  * models must recover deterministic label rules, training must be
  * mergeable (partition-order independent), and the evaluation summary
  * must match the reference format byte-for-byte
  * (EvaluateClassifierPredictionsAggregation.java:105-113, sorted labels). */
class MlSpec extends AnyFunSuite {
  import TestSpark._

  private def registered = { GraftFunctions.register(spark); spark }

  test("learn_classifier recovers a separable 2-D rule across partitions") {
    val s = registered
    import s.implicits._
    // rule: x + y > 10 with a margin band excluded from training
    val pts = for {
      x <- 0 to 20; y <- 0 to 20
      if math.abs(x + y - 10) >= 2
    } yield (x.toDouble, y.toDouble, if (x + y > 10) 1L else 0L)
    val df = pts.toDF("x", "y", "label").repartition(7) // shuffled update order
    val model = df.agg(expr("learn_classifier(label, features(x, y))").as("m"))
    val pred = df.crossJoin(broadcast(model))
      .select(col("label"), expr("classify(features(x, y), m)").as("p"))
      .collect()
    assert(pred.nonEmpty && pred.forall(r => r.getLong(0) == r.getLong(1)),
      "classifier must reproduce the separable rule exactly")
  }

  test("learn_varchar_classifier round-trips string labels") {
    val s = registered
    import s.implicits._
    val df = (0 to 200).map(i => (i.toDouble, if (i > 100) "big" else "small"))
      .toDF("v", "label").repartition(5)
    val model = df.agg(expr("learn_varchar_classifier(label, features(v))").as("m"))
    val bad = df.crossJoin(broadcast(model))
      .select(col("label"), expr("classify_varchar(features(v), m)").as("p"))
      .filter(col("label") =!= col("p")).count()
    assert(bad == 0)
  }

  test("learn_regressor recovers exact linear coefficients") {
    val s = registered
    import s.implicits._
    val df = (for { a <- 1 to 30; b <- 1 to 5 }
      yield (a.toDouble, b.toDouble, 3.0 * a - 7.0 * b + 11.0))
      .toDF("a", "b", "y").repartition(6)
    val model = df.agg(expr("learn_regressor(y, features(a, b))").as("m"))
    val err = df.crossJoin(broadcast(model))
      .select(abs(expr("regress(features(a, b), m)") - col("y")).as("e"))
      .agg(max("e")).collect()(0).getDouble(0)
    assert(err < 1e-6, s"max |residual| $err on an exactly-linear target")
  }

  test("libsvm-named variants accept and ignore the params string") {
    val s = registered
    import s.implicits._
    val df = (0 to 50).map(i => (i.toDouble, if (i > 25) 1L else 0L)).toDF("v", "label")
    val m1 = df.agg(expr("learn_libsvm_classifier(label, features(v), 'C=1')")).collect()(0)
    val m2 = df.agg(expr("learn_classifier(label, features(v))")).collect()(0)
    assert(java.util.Arrays.equals(m1.getAs[Array[Byte]](0), m2.getAs[Array[Byte]](0)))
    val r1 = df.agg(expr("learn_libsvm_regressor(label, features(v), 'eps=0.1')")).collect()(0)
    assert(r1.getAs[Array[Byte]](0) != null)
  }

  test("evaluate_classifier_predictions matches the reference format exactly") {
    val s = registered
    import s.implicits._
    // 3 correct '1', 2 correct '0', 1 predicted '1' truth '0'
    val rows = Seq(("1", "1"), ("1", "1"), ("1", "1"), ("0", "0"), ("0", "0"),
      ("1", "0"))
    val got = rows.toDF("p", "t").repartition(3)
      .agg(expr("evaluate_classifier_predictions(p, t)")).collect()(0).getString(0)
    val want =
      "Accuracy: 5/6 (83.33%)\n" +
        "Class '0'\nPrecision: 2/2 (100.00%)\nRecall: 2/3 (66.67%)\n" +
        "Class '1'\nPrecision: 3/4 (75.00%)\nRecall: 3/3 (100.00%)\n"
    assert(got == want, s"got:\n$got")
  }

  test("features() builds 0-based map(bigint,double)") {
    val s = registered
    val r = s.sql("SELECT features(1, 2.5, 3) AS f").collect()(0)
      .getAs[Map[Long, Double]](0)
    assert(r == Map(0L -> 1.0, 1L -> 2.5, 2L -> 3.0))
  }

  test("classify on a regressor model (and vice versa) raises a clear error") {
    val s = registered
    import s.implicits._
    val df = (0 to 20).map(i => (i.toDouble, i.toLong)).toDF("v", "label")
    val reg = df.agg(expr("learn_regressor(label, features(v))").as("m"))
    val ex = intercept[Exception] {
      df.crossJoin(reg).select(expr("classify(features(v), m)")).collect()
    }
    assert(ex.getMessage.contains("not a classifier"))
  }

  test("model state merges are order-insensitive (1 vs many partitions)") {
    val s = registered
    import s.implicits._
    val base = (0 to 300).map(i => (i.toDouble, (i % 17).toDouble,
      if (i % 3 == 0) 1L else 0L))
    def preds(parts: Int): Seq[Row] = {
      val df = base.toDF("x", "y", "label").repartition(parts)
      val m = df.agg(expr("learn_classifier(label, features(x, y))").as("m"))
      df.crossJoin(broadcast(m))
        .select(col("x"), expr("classify(features(x, y), m)").as("p"))
        .orderBy("x").collect().toSeq
    }
    assert(preds(1) == preds(13))
  }

  test("gaussian-elimination solver handles pivoting") {
    // A = [[0,1],[1,0]] needs a row swap; solution of A x = [2,3] is [3,2]
    val a = Array(0.0, 1.0, 1.0, 0.0)
    val b = Array(2.0, 3.0)
    MlModel.solveInPlace(a, 2, Array(b))
    assert(math.abs(b(0) - 3.0) < 1e-12 && math.abs(b(1) - 2.0) < 1e-12)
  }

  test("non-integral double labels truncate at training (reference int cast)") {
    val s = registered
    import s.implicits._
    // labels 0.5 and 2.5 — the reference casts double labels to int at
    // training, so classify (bigint render) must return 0 or 2, not throw
    val df = (0 to 200)
      .map(i => (i.toDouble, if (i > 100) 2.5 else 0.5))
      .toDF("v", "label").repartition(3)
    val model = df.agg(expr("learn_classifier(label, features(v))").as("m"))
    val preds = df.crossJoin(broadcast(model))
      .select(col("v"), expr("classify(features(v), m)").as("p"))
      .collect()
    assert(preds.forall(r =>
      r.getLong(1) == (if (r.getDouble(0) > 100) 2L else 0L)))
  }
}
