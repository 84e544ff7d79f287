package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, NGram, RegexTokenizer,
  VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X8: the reference's text-model surface (Milestone4 cells 14-15):
  * TF-IDF (1-2 grams, min_df-style pruning) + Ridge regression with a
  * time-ordered train/test split, evaluated out-of-sample — re-expressed
  * on MLlib (RegexTokenizer -> NGram union -> HashingTF -> IDF ->
  * LinearRegression with L2, i.e. Ridge).
  *
  * Scale: HashingTF is stateless (no vocabulary broadcast); IDF and the
  * regression are MLlib's distributed implementations. Feature dim is a
  * power of two << executor memory; training is L-BFGS over the cluster.
  */
object TextRegression {

  final case class Trained(model: org.apache.spark.ml.PipelineModel,
      trainRmse: Double, testRmse: Double, baselineRmse: Double)

  def pipeline(numFeatures: Int = 2048, regParam: Double = 0.1): Pipeline = {
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("words")
      .setPattern("\\s+")
    val bigrams = new NGram().setN(2).setInputCol("words")
      .setOutputCol("bigrams")
    val tf1 = new HashingTF().setInputCol("words").setOutputCol("tf1")
      .setNumFeatures(numFeatures)
    val tf2 = new HashingTF().setInputCol("bigrams").setOutputCol("tf2")
      .setNumFeatures(numFeatures)
    val idf1 = new IDF().setInputCol("tf1").setOutputCol("idf1").setMinDocFreq(3)
    val idf2 = new IDF().setInputCol("tf2").setOutputCol("idf2").setMinDocFreq(3)
    val asm = new VectorAssembler().setInputCols(Array("idf1", "idf2"))
      .setOutputCol("features")
    // l-bfgs: gradient passes are O(features); the "normal" solver would
    // build a features^2 Gram matrix per task (~134 MB at 4096 dims)
    val ridge = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setRegParam(regParam)
      .setElasticNetParam(0.0).setMaxIter(15).setSolver("l-bfgs")
    new Pipeline().setStages(Array(tok, bigrams, tf1, tf2, idf1, idf2, asm,
      ridge))
  }

  /** Time-ordered split on `orderCol` (the reference's TimeSeriesSplit
    * discipline — never train on the future), fit, report train/test RMSE
    * vs the predict-the-mean baseline.
    */
  def fitEval(docs: DataFrame, labelCol: String, orderCol: String,
              testFraction: Double = 0.25): Trained = {
    val cut = docs.stat.approxQuantile(orderCol, Array(1 - testFraction), 0.0)
      .head
    val withLabel = docs.withColumn("label", col(labelCol).cast("double"))
    // each pipeline stage fit re-evaluates the full upstream lineage
    // (tokenize + hash + idf per fit) — cache the split once
    val train = withLabel.filter(col(orderCol) <= cut).cache()
    val test = withLabel.filter(col(orderCol) > cut).cache()
    try {
      val model = pipeline().fit(train)
      def rmse(df: DataFrame): Double =
        model.transform(df)
          .select(sqrt(avg(pow(col("prediction") - col("label"), 2))))
          .collect().head.getDouble(0)
      val mean = train.select(avg(col("label"))).collect().head.getDouble(0)
      val baseline = test
        .select(sqrt(avg(pow(col("label") - lit(mean), 2))))
        .collect().head.getDouble(0)
      Trained(model, rmse(train), rmse(test), baseline)
    } finally { train.unpersist(); test.unpersist() }
  }
}
