package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle gates for the ML function surface (functions/MlModel.scala;
  * reference presto-ml). Each gate trains on fixture data whose labels are
  * an EXACT deterministic function of the features, so the closed-form
  * learners must recover the rule and the DuckDB oracle can state the
  * expected predictions directly — the gate is an end-to-end convergence
  * check, not a rows-only smoke test.
  *
  * Scale shape shared by all gates: training is ONE distributed aggregate
  * with KB-bounded mergeable state (the reference's learners are
  * single-machine — LearnClassifierAggregation.java:56 combine throws),
  * and the 1-row model side is broadcast into the apply join, so scoring
  * is a map-side pass over the big table.
  */
object Ml {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** learn_classifier + classify: label = quantity > 25 (margin 1 unit on
    * an integer-valued feature; LDA's boundary lands at the class-mean
    * midpoint ≈ 25.5, so the trained model must reproduce the rule on
    * every distinct quantity). */
  def classifier(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val li = t(s, dir, "lineitem")
    val model = li
      .select(when(col("l_quantity") > 25, 1L).otherwise(0L).as("label"),
        expr("features(l_quantity)").as("f"))
      .agg(expr("learn_classifier(label, f)").as("m"))
    li.select(col("l_quantity").cast("double").as("q")).distinct()
      .crossJoin(broadcast(model))
      .select(col("q"), expr("classify(features(q), m)").as("pred"))
      .orderBy("q")
  }

  /** learn_varchar_classifier + classify_varchar: label = discount >= 0.05
    * over the 11-value discount domain (margin one step at 0.045). */
  def classifierVarchar(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val li = t(s, dir, "lineitem")
    val model = li
      .select(when(col("l_discount") >= 0.05, "HI").otherwise("LO").as("label"),
        expr("features(l_discount * 100)").as("f"))
      .agg(expr("learn_varchar_classifier(label, f)").as("m"))
    li.select(col("l_discount").cast("double").as("d")).distinct()
      .crossJoin(broadcast(model))
      .select(col("d"), expr("classify_varchar(features(d * 100), m)").as("pred"))
      .orderBy("d")
  }

  /** learn_regressor + regress: label is exactly linear in the features
    * (y = 2·quantity + 10·discount + 3, zero residual), so ridge least
    * squares recovers the coefficients and predictions equal the rule to
    * fp precision; both sides round to 4 dp. */
  def regressor(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val li = t(s, dir, "lineitem")
    val model = li
      .select((col("l_quantity") * 2.0 + col("l_discount") * 10.0 + 3.0).as("y"),
        expr("features(l_quantity, l_discount)").as("f"))
      .agg(expr("learn_regressor(y, f)").as("m"))
    li.select(col("l_quantity").cast("double").as("q"),
        col("l_discount").cast("double").as("d")).distinct()
      .crossJoin(broadcast(model))
      .select(col("q"), col("d"),
        round(expr("regress(features(q, d), m)"), 4).as("pred"))
      .orderBy("q", "d")
  }

  /** evaluate_classifier_predictions over a prediction column with KNOWN
    * confusion counts (prediction says quantity > 25, truth says > 20 →
    * rows with quantity in (20, 25] are the exact false set). */
  def evaluate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "lineitem")
      .select(
        when(col("l_quantity") > 25, "1").otherwise("0").as("pred"),
        when(col("l_quantity") > 20, "1").otherwise("0").as("truth"))
      .agg(expr("evaluate_classifier_predictions(pred, truth)").as("report"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_classifier" -> classifier,
    "ml_classifier_varchar" -> classifierVarchar,
    "ml_regressor" -> regressor,
    "ml_eval" -> evaluate)

  val oracle: Map[String, String] = Map(
    "ml_classifier" ->
      """SELECT q, CAST(CASE WHEN q > 25 THEN 1 ELSE 0 END AS BIGINT) AS pred
        |FROM (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS q FROM lineitem)
        |ORDER BY q""".stripMargin,
    "ml_classifier_varchar" ->
      """SELECT d, CASE WHEN d >= 0.05 THEN 'HI' ELSE 'LO' END AS pred
        |FROM (SELECT DISTINCT CAST(l_discount AS DOUBLE) AS d FROM lineitem)
        |ORDER BY d""".stripMargin,
    "ml_regressor" ->
      """SELECT q, d, ROUND(2 * q + 10 * d + 3, 4) AS pred
        |FROM (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS q,
        |        CAST(l_discount AS DOUBLE) AS d FROM lineitem)
        |ORDER BY q, d""".stripMargin,
    // the report string rebuilt literally: counts from the same rules;
    // percentages rounded exactly as Java's %.2f (ROUND is half-up for
    // positives, and after rounding printf cannot re-round)
    "ml_eval" ->
      """WITH c AS (
        |  SELECT
        |    SUM(CASE WHEN (l_quantity > 25) = (l_quantity > 20) THEN 1 ELSE 0 END) AS correct,
        |    COUNT(*) AS total,
        |    SUM(CASE WHEN l_quantity > 25 AND l_quantity > 20 THEN 1 ELSE 0 END) AS tp1,
        |    SUM(CASE WHEN l_quantity > 25 AND NOT l_quantity > 20 THEN 1 ELSE 0 END) AS fp1,
        |    SUM(CASE WHEN NOT l_quantity > 25 AND l_quantity > 20 THEN 1 ELSE 0 END) AS fn1,
        |    SUM(CASE WHEN NOT l_quantity > 25 AND NOT l_quantity > 20 THEN 1 ELSE 0 END) AS tp0
        |  FROM lineitem)
        |SELECT 'Accuracy: ' || correct || '/' || total || ' (' ||
        |  printf('%.2f', ROUND(100.0 * correct / total, 2)) || '%)' || chr(10) ||
        |  'Class ''0''' || chr(10) ||
        |  'Precision: ' || tp0 || '/' || (tp0 + fn1) || ' (' ||
        |  printf('%.2f', ROUND(100.0 * tp0 / (tp0 + fn1), 2)) || '%)' || chr(10) ||
        |  'Recall: ' || tp0 || '/' || (tp0 + fp1) || ' (' ||
        |  printf('%.2f', ROUND(100.0 * tp0 / (tp0 + fp1), 2)) || '%)' || chr(10) ||
        |  'Class ''1''' || chr(10) ||
        |  'Precision: ' || tp1 || '/' || (tp1 + fp1) || ' (' ||
        |  printf('%.2f', ROUND(100.0 * tp1 / (tp1 + fp1), 2)) || '%)' || chr(10) ||
        |  'Recall: ' || tp1 || '/' || (tp1 + fn1) || ' (' ||
        |  printf('%.2f', ROUND(100.0 * tp1 / (tp1 + fn1), 2)) || '%)' || chr(10)
        |  AS report
        |FROM c""".stripMargin)
}
