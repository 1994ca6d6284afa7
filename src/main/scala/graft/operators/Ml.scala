package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ML function family (reference: plugin/trino-ml/src/main/java/io/trino/
  * plugin/ml/ — learn_regressor/LearnRegressorAggregation.java, classify/
  * regress via Model, features()/FeatureVector.java, and
  * EvaluateClassifierPredictionsAggregation.java).
  *
  * The reference learners delegate to libsvm (opaque, seed-dependent); a
  * faithful *capability* rebuild on Spark uses an EXACTLY-solvable model so
  * the oracle can verify the whole pipeline: ordinary least squares via
  * normal equations. The design is the one every distributed ML system uses
  * for small feature counts (sufficient statistics, not row iteration):
  *
  *   1. ONE distributed aggregate computes the Gram matrix XᵀX and Xᵀy as
  *      exact integer sums (map-side partials, O(d²) state — at 100 TB this
  *      is a single reduce of 9 numbers);
  *   2. the 3×3 solve (Cramer) happens as COLUMN ARITHMETIC on the 1-row
  *      aggregate — no driver collect, no iteration;
  *   3. coefficients broadcast back over the data for prediction/residuals
  *      (the reference's regress(features, model)).
  *
  * Exactness discipline: features are integer-valued, so every Gram entry is
  * an exact BIGINT; determinant arithmetic runs in DECIMAL(38,0) (Spark) /
  * HUGEINT (DuckDB) — both exact — and only the final coefficient division
  * is IEEE double, which both engines round identically.
  */
object Ml {

  /** learn_linear_regressor + regress: fit y ~ b0 + b1·x1 + b2·x2 by OLS and
    * apply the model. y embeds known coefficients plus deterministic integer
    * "noise", so the fit is nontrivial and the oracle replays it exactly. */
  def q_ml_learn_regressor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    def dec38(c: Column): Column = c.cast(d38)
    val labeled = table(s, dir, "customer")
      .select($"c_custkey",
        ($"c_custkey" % 19).cast("long").as("x1"),
        (($"c_custkey" * 7) % 23).cast("long").as("x2"))
      .withColumn("y", ($"x1" * 3 - $"x2" * 2 + 5 + ($"c_custkey" * 11) % 7 - 3).cast("long"))
    val g = labeled.agg(
      count(lit(1)).as("n"), sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
      sum($"x1" * $"x1").as("sx11"), sum($"x1" * $"x2").as("sx12"),
      sum($"x2" * $"x2").as("sx22"),
      sum($"x1" * $"y").as("sx1y"), sum($"x2" * $"y").as("sx2y"))
    // Cramer's rule over A = [[n,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]],
    // rhs = [sy, sx1y, sx2y] — exact DECIMAL(38,0) arithmetic
    def det3(a: Column, b: Column, c: Column,
             d: Column, e: Column, f: Column,
             gg: Column, h: Column, i: Column): Column =
      dec38(a) * (dec38(e) * dec38(i) - dec38(f) * dec38(h)) -
      dec38(b) * (dec38(d) * dec38(i) - dec38(f) * dec38(gg)) +
      dec38(c) * (dec38(d) * dec38(h) - dec38(e) * dec38(gg))
    val model = g.select(
      (det3($"sy", $"sx1", $"sx2", $"sx1y", $"sx11", $"sx12", $"sx2y", $"sx12", $"sx22").cast("double") /
        det3($"n", $"sx1", $"sx2", $"sx1", $"sx11", $"sx12", $"sx2", $"sx12", $"sx22").cast("double")).as("b0"),
      (det3($"n", $"sy", $"sx2", $"sx1", $"sx1y", $"sx12", $"sx2", $"sx2y", $"sx22").cast("double") /
        det3($"n", $"sx1", $"sx2", $"sx1", $"sx11", $"sx12", $"sx2", $"sx12", $"sx22").cast("double")).as("b1"),
      (det3($"n", $"sx1", $"sy", $"sx1", $"sx11", $"sx1y", $"sx2", $"sx12", $"sx2y").cast("double") /
        det3($"n", $"sx1", $"sx2", $"sx1", $"sx11", $"sx12", $"sx2", $"sx12", $"sx22").cast("double")).as("b2"))
    labeled.filter($"c_custkey" <= 200)
      .crossJoin(broadcast(model))
      .select($"c_custkey", $"x1", $"x2", $"y",
        round($"b0", 9).as("b0"), round($"b1", 9).as("b1"), round($"b2", 9).as("b2"),
        round($"b0" + $"b1" * $"x1" + $"b2" * $"x2", 9).as("yhat"))
      .orderBy($"c_custkey")
  }
  val qMlLearnRegressorSql: String =
    """WITH labeled AS (
         SELECT c_custkey,
           CAST(c_custkey % 19 AS BIGINT) AS x1,
           CAST(c_custkey * 7 % 23 AS BIGINT) AS x2,
           CAST((c_custkey % 19) * 3 - (c_custkey * 7 % 23) * 2 + 5
              + (c_custkey * 11) % 7 - 3 AS BIGINT) AS y
         FROM customer),
       g AS (
         SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(x1 * x1) AS HUGEINT) AS sx11, CAST(sum(x1 * x2) AS HUGEINT) AS sx12,
           CAST(sum(x2 * x2) AS HUGEINT) AS sx22,
           CAST(sum(x1 * y) AS HUGEINT) AS sx1y, CAST(sum(x2 * y) AS HUGEINT) AS sx2y
         FROM labeled),
       model AS (
         SELECT
           CAST(sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y) AS DOUBLE)
             / CAST(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2) AS DOUBLE) AS b0,
           CAST(n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2) AS DOUBLE)
             / CAST(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2) AS DOUBLE) AS b1,
           CAST(n * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2) AS DOUBLE)
             / CAST(n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2) AS DOUBLE) AS b2
         FROM g)
       SELECT c_custkey, x1, x2, y,
         round(b0, 9) AS b0, round(b1, 9) AS b1, round(b2, 9) AS b2,
         round(b0 + b1 * x1 + b2 * x2, 9) AS yhat
       FROM labeled CROSS JOIN model
       WHERE c_custkey <= 200 ORDER BY c_custkey"""

  /** evaluate_classifier_predictions (reference
    * EvaluateClassifierPredictionsAggregation.java): exact confusion-matrix
    * aggregation — accuracy, per-class precision/recall/F1 — over a
    * deterministic predicted-vs-actual labeling. One global aggregate of
    * conditional counts; the metric arithmetic is rational double math. */
  def q_ml_evaluate_predictions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = table(s, dir, "customer")
      .select(
        (($"c_custkey" * 29 % 10) < 6).as("actual"),
        (($"c_custkey" * 13 % 10) < 7).as("predicted"))
    t.agg(
        sum(when($"actual" && $"predicted", 1L).otherwise(0L)).as("tp"),
        sum(when(!$"actual" && $"predicted", 1L).otherwise(0L)).as("fp"),
        sum(when($"actual" && !$"predicted", 1L).otherwise(0L)).as("fn"),
        sum(when(!$"actual" && !$"predicted", 1L).otherwise(0L)).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        (($"tp" + $"tn").cast("double") / ($"tp" + $"fp" + $"fn" + $"tn").cast("double")).as("accuracy"),
        ($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision_pos"),
        ($"tp".cast("double") / ($"tp" + $"fn").cast("double")).as("recall_pos"),
        (lit(2.0) * $"tp".cast("double") /
          (lit(2.0) * $"tp".cast("double") + $"fp".cast("double") + $"fn".cast("double"))).as("f1_pos"))
  }
  val qMlEvaluatePredictionsSql: String =
    """WITH t AS (
         SELECT (c_custkey * 29 % 10) < 6 AS actual,
                (c_custkey * 13 % 10) < 7 AS predicted
         FROM customer),
       c AS (
         SELECT
           CAST(sum(CASE WHEN actual AND predicted THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN NOT actual AND predicted THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN actual AND NOT predicted THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN NOT actual AND NOT predicted THEN 1 ELSE 0 END) AS BIGINT) AS tn
         FROM t)
       SELECT tp, fp, fn, tn,
         CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy,
         CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_pos,
         CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_pos,
         2.0 * CAST(tp AS DOUBLE) / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)) AS f1_pos
       FROM c"""

  /** learn_classifier + classify (reference LearnClassifierAggregation.java:28,
    * ClassifyFunction.java) — the classification half of trino-ml. The
    * reference delegates to libsvm (opaque, seed-dependent); the exactly-
    * verifiable substitute here — documented like the regressor's OLS swap —
    * is MULTINOMIAL NAIVE BAYES over small-cardinality integer features:
    *
    *   1. fit = ONE distributed aggregate family of integer counts (class
    *      priors + per-(feature, value, class) counts — O(classes ×
    *      cardinality) state, map-side combined; at 100 TB this is two tiny
    *      reduces);
    *   2. the fitted tables broadcast back over the data (the reference's
    *      classify(features, model) application step);
    *   3. classify = argmax of the Laplace-smoothed posterior, compared by
    *      CROSS-MULTIPLICATION so the decision is exact BIGINT arithmetic —
    *      no logs, no floats, no engine-dependent rounding anywhere.
    *
    * Label depends on both features plus deterministic noise, so the
    * classifier is nontrivial and its decision boundary is replayed exactly
    * by the oracle. */
  def q_ml_learn_classifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v1 = 5L; val v2 = 7L // feature cardinalities = Laplace smoothing V
    val labeled = table(s, dir, "customer")
      .select($"c_custkey",
        ($"c_custkey" % 5).cast("long").as("x1"),
        ($"c_custkey" * 3 % 7).cast("long").as("x2"))
      .withColumn("cls", (($"x1" + $"x2" * 2 + $"c_custkey" % 3) % 2).cast("long"))
    val priors = labeled.agg(
      sum(when($"cls" === 1, 1L).otherwise(0L)).as("n1"),
      sum(when($"cls" === 0, 1L).otherwise(0L)).as("n0"))
    def valueCounts(c: Column, name: String) = labeled.groupBy(c.as(name))
      .agg(sum(when($"cls" === 1, 1L).otherwise(0L)).as(s"${name}c1"),
        sum(when($"cls" === 0, 1L).otherwise(0L)).as(s"${name}c0"))
    val f1 = valueCounts($"x1", "v1k")
    val f2 = valueCounts($"x2", "v2k")
    labeled.filter($"c_custkey" <= 300)
      .join(broadcast(f1), $"x1" === $"v1k")
      .join(broadcast(f2), $"x2" === $"v2k")
      .crossJoin(broadcast(priors))
      .select($"c_custkey", $"x1", $"x2", $"cls".as("actual"),
        ($"n1" * ($"v1kc1" + 1) * ($"v2kc1" + 1) * ($"n0" + v1) * ($"n0" + v2)).as("s1"),
        ($"n0" * ($"v1kc0" + 1) * ($"v2kc0" + 1) * ($"n1" + v1) * ($"n1" + v2)).as("s0"))
      .withColumn("predicted", ($"s1" > $"s0").cast("long"))
      .orderBy($"c_custkey")
  }
  val qMlLearnClassifierSql: String =
    """WITH labeled AS (
         SELECT c_custkey,
           CAST(c_custkey % 5 AS BIGINT) AS x1,
           CAST(c_custkey * 3 % 7 AS BIGINT) AS x2,
           CAST(((c_custkey % 5) + (c_custkey * 3 % 7) * 2 + c_custkey % 3) % 2 AS BIGINT) AS cls
         FROM customer),
       priors AS (
         SELECT CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
         FROM labeled),
       f1 AS (
         SELECT x1 AS v1k,
           CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1kc1,
           CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1kc0
         FROM labeled GROUP BY x1),
       f2 AS (
         SELECT x2 AS v2k,
           CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v2kc1,
           CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2kc0
         FROM labeled GROUP BY x2)
       SELECT c_custkey, x1, x2, cls AS actual,
         n1 * (v1kc1 + 1) * (v2kc1 + 1) * (n0 + 5) * (n0 + 7) AS s1,
         n0 * (v1kc0 + 1) * (v2kc0 + 1) * (n1 + 5) * (n1 + 7) AS s0,
         CAST(n1 * (v1kc1 + 1) * (v2kc1 + 1) * (n0 + 5) * (n0 + 7)
            > n0 * (v1kc0 + 1) * (v2kc0 + 1) * (n1 + 5) * (n1 + 7) AS BIGINT) AS predicted
       FROM labeled
       JOIN f1 ON x1 = v1k
       JOIN f2 ON x2 = v2k
       CROSS JOIN priors
       WHERE c_custkey <= 300 ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_ml_learn_regressor" -> q_ml_learn_regressor _,
    "q_ml_learn_classifier" -> q_ml_learn_classifier _,
    "q_ml_evaluate_predictions" -> q_ml_evaluate_predictions _)

  val oracles: Map[String, String] = Map(
    "q_ml_learn_regressor" -> qMlLearnRegressorSql,
    "q_ml_learn_classifier" -> qMlLearnClassifierSql,
    "q_ml_evaluate_predictions" -> qMlEvaluatePredictionsSql)
}
