package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val features = Tables.lineitem(spark, sf())
    .select(col("l_quantity").as("qty"), col("l_discount").as("disc"),
      col("l_tax").as("tax"), col("l_extendedprice").as("price"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))
    .limit(2000).cache()

  test("M6 median imputation fills nulls with the column median") {
    val df = Seq(Some(1.0), Some(3.0), None, Some(5.0)).toDF("x")
    val imp = Pipelines.imputeMedian(df, Seq("x"))
    val filled = imp.filter(col("x").isNull).select("x_imp").as[Double].head()
    assert(filled == 3.0)
  }

  test("M3 stratified split is a partition: train+test = all, no overlap") {
    val (train, test) = Pipelines.stratifiedSplit(features, "label", 0.7, 42)
    val n = features.count()
    assert(train.count() + test.count() == n)
    val frac = train.count().toDouble / n
    assert(frac > 0.6 && frac < 0.8)
  }

  test("M3 stratified split rejects unbounded-cardinality labels loudly") {
    val e = intercept[IllegalArgumentException] {
      // every row its own stratum with a 2-row bound: the guard must fire
      // before the driver tries to hold the whole fraction map
      Pipelines.stratifiedSplit(features, "qty", 0.7, 42, maxStrata = 2)
    }
    assert(e.getMessage.contains("low-cardinality"))
  }

  test("M1 decision tree trains and scores") {
    val df = Pipelines.assemble(features, Seq("qty", "disc", "tax", "price"))
    val m = Pipelines.decisionTree(df, "label")
    assert(m.depth <= 5)
    assert(m.transform(df).count() == df.count())
  }

  test("M2/M4 random forest + MAE") {
    val df = Pipelines.assemble(features, Seq("qty", "disc", "tax"))
      .withColumn("target", col("price"))
    val m = Pipelines.randomForest(df, "target", numTrees = 10)
    assert(m.getNumTrees == 10)
    val err = Pipelines.mae(m.transform(df), "target")
    assert(err >= 0)
  }

  test("M5 permutation importance ranks the informative feature highest") {
    // y is a pure function of x; z is independent noise
    val df = spark.range(400).select(
      (col("id") % 97).cast("double").as("x"),
      (col("id") % 13).cast("double").as("z"))
      .withColumn("y", col("x") * 3.0)
    val m = Pipelines.randomForest(
      Pipelines.assemble(df, Seq("x", "z")), "y", numTrees = 10)
    val imp = Pipelines.permutationImportance(m, df, Seq("x", "z"), "y",
      nRepeats = 2)
    assert(imp("x") > imp("z"))
    assert(imp("x") > 0)
  }
}
