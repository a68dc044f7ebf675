package graft.ml

import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{Imputer, VectorAssembler}
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M1–M6 — the DiabetesSQL.ipynb modeling leg mirrored on Spark ML
  * (reference: notebooks/DiabetesSQL.ipynb:1961-3784). Feature engineering
  * (one-hot, indicators, outer-merged lipid/BMI panels) happens in the
  * relational layer; this layer owns impute→assemble→fit→evaluate.
  */
object Pipelines {

  /** M6/A7: median imputation over the given numeric columns
    * (`X.fillna(X.median())`, DiabetesSQL.ipynb:2450).
    */
  def imputeMedian(df: DataFrame, cols: Seq[String]): DataFrame =
    new Imputer()
      .setStrategy("median")
      .setInputCols(cols.toArray)
      .setOutputCols(cols.map(_ + "_imp").toArray)
      .fit(df).transform(df)

  def assemble(df: DataFrame, features: Seq[String],
      out: String = "features"): DataFrame =
    new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol(out)
      .setHandleInvalid("keep")
      .transform(df)

  /** M3/A6/SO1: stratified 70% train split with deterministic complement
    * test set (`groupby.sample(frac=.7)` + index complement,
    * DiabetesSQL.ipynb:3220-3227).
    */
  /** `maxStrata` bounds the driver-side label collect: `sampleBy` needs
    * the per-stratum fraction map on the driver, which is fine for the
    * enum-like labels stratification is FOR, and a silent OOM for an
    * unbounded-cardinality column (someone stratifying on a raw id) —
    * fail loudly instead. The limit+1 probe never scans more than the
    * bound.
    */
  def stratifiedSplit(df: DataFrame, label: String, frac: Double,
      seed: Long, maxStrata: Int = 10000): (DataFrame, DataFrame) = {
    val keyed = df.withColumn("__row_id", monotonically_increasing_id())
    val labels = keyed.select(label).distinct().limit(maxStrata + 1).collect()
    require(labels.length <= maxStrata,
      s"stratifiedSplit: label '$label' has more than $maxStrata distinct " +
        "values — stratification keys must be low-cardinality (raise " +
        "maxStrata only if the driver can hold the fraction map)")
    val strata = labels.map(r => r.get(0) -> frac).toMap
    val train = keyed.stat.sampleBy(label, strata, seed)
    val test = keyed.join(train.select("__row_id"), Seq("__row_id"), "left_anti")
    (train.drop("__row_id"), test.drop("__row_id"))
  }

  /** M1: `DecisionTreeClassifier(max_depth=5)` (DiabetesSQL.ipynb:2452). */
  def decisionTree(train: DataFrame, label: String,
      features: String = "features"): org.apache.spark.ml.classification.DecisionTreeClassificationModel =
    new DecisionTreeClassifier()
      .setMaxDepth(5).setLabelCol(label).setFeaturesCol(features)
      .fit(train)

  /** M2: the RF regressor of the final sweep configuration —
    * `n_estimators=500, max_depth=14, max_features='sqrt', seed 42`
    * (DiabetesSQL.ipynb:3253-3312). numTrees overridable for the sweep.
    */
  def randomForest(train: DataFrame, label: String, numTrees: Int = 500,
      features: String = "features"): RandomForestRegressionModel =
    new RandomForestRegressor()
      .setNumTrees(numTrees).setMaxDepth(14)
      .setFeatureSubsetStrategy("sqrt").setSeed(42)
      .setLabelCol(label).setFeaturesCol(features)
      .fit(train)

  /** M4: MAE (`mean_absolute_error`, DiabetesSQL.ipynb:3265). */
  def mae(predictions: DataFrame, label: String): Double =
    new RegressionEvaluator()
      .setMetricName("mae").setLabelCol(label).setPredictionCol("prediction")
      .evaluate(predictions)

  /** M5: permutation importance (`sklearn.inspection.permutation_importance`,
    * n_repeats, seed — DiabetesSQL.ipynb:3784): per feature, shuffle the
    * column (seeded rand ordering), re-assemble, re-score; importance =
    * mean MAE degradation.
    */
  def permutationImportance(
      model: RandomForestRegressionModel,
      test: DataFrame, featureCols: Seq[String], label: String,
      nRepeats: Int = 10, seed: Long = 42): Map[String, Double] = {
    val assembled = assemble(test, featureCols)
    val baseline = mae(model.transform(assembled), label)
    featureCols.map { f =>
      // global row_number windows are single-partition: acceptable for the
      // evaluation-sized test frame (mirrors sklearn's in-memory permute)
      val deltas = (0 until nRepeats).map { rep =>
        val shuffledVals = test.select(col(f)).withColumn("__perm_rn",
          row_number().over(Window.orderBy(rand(seed + rep))))
        val others = test.drop(f).withColumn("__perm_rn",
          row_number().over(Window.orderBy(monotonically_increasing_id())))
        val permuted = others.join(shuffledVals, Seq("__perm_rn"))
          .drop("__perm_rn")
        mae(model.transform(assemble(permuted, featureCols)), label) - baseline
      }
      f -> deltas.sum / nRepeats
    }.toMap
  }
}
