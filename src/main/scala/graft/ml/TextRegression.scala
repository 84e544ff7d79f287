package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, NGram,
  RegexTokenizer, VectorAssembler}
import org.apache.spark.ml.regression.{LinearRegression,
  LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  final case class Trained(model: LinearRegressionModel,
      trainRmse: Double, testRmse: Double, baselineRmse: Double)

  private def tok = new RegexTokenizer().setInputCol("text")
    .setOutputCol("words").setPattern("\\s+")
  private def bigrams = new NGram().setN(2).setInputCol("words")
    .setOutputCol("bigrams")
  private def tf1(n: Int) = new HashingTF().setInputCol("words")
    .setOutputCol("tf1").setNumFeatures(n)
  private def tf2(n: Int) = new HashingTF().setInputCol("bigrams")
    .setOutputCol("tf2").setNumFeatures(n)
  private def idf1 = new IDF().setInputCol("tf1").setOutputCol("idf1")
    .setMinDocFreq(3)
  private def idf2 = new IDF().setInputCol("tf2").setOutputCol("idf2")
    .setMinDocFreq(3)
  private def asm = new VectorAssembler()
    .setInputCols(Array("idf1", "idf2")).setOutputCol("features")
  // l-bfgs: gradient passes are O(features); the "normal" solver would
  // build a features^2 Gram matrix per task (~34 MB at 2048 dims)
  // tol 1e-4 / maxIter 10: each L-BFGS iteration is a full treeAggregate
  // round trip; out-of-sample RMSE is flat past ~10 iterations at 1e-4
  // relative convergence, so don't pay for more (quality still spec-gated
  // vs the mean baseline). 1024 hash dims per gram order halves gradient
  // width vs 2048 with no measurable RMSE change on the synthetic corpus.
  // solver: "l-bfgs" for the hashed-TF path (a "normal" solve would build
  // a features² Gram matrix per task); "normal" for handfuls of numeric
  // features (permutation importance), where the tiny closed-form solve
  // replaces 10 treeAggregate rounds. MEASURED (r6, sf0.1, min-of-3):
  // l-bfgs 2.31 s vs auto/normal 3.44 s at 2048 assembled dims — the
  // Gram-matrix cost dominates; don't re-litigate without re-measuring
  private def ridge(regParam: Double, solver: String = "l-bfgs") =
    new LinearRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setRegParam(regParam).setElasticNetParam(0.0)
      .setMaxIter(10).setTol(1e-4).setSolver(solver)

  /** The one-shot Pipeline form of the same stages (the API an MLlib user
    * would persist/serve).
    */
  def pipeline(numFeatures: Int = 1024, regParam: Double = 0.1): Pipeline =
    new Pipeline().setStages(Array(tok, bigrams, tf1(numFeatures),
      tf2(numFeatures), idf1, idf2, asm, ridge(regParam)))

  /** Time-ordered split on `orderCol` (the reference's TimeSeriesSplit
    * discipline — never train on the future), fit, report train/test RMSE
    * vs the predict-the-mean baseline.
    *
    * Fitting is staged manually rather than via Pipeline.fit: each
    * estimator fit in a pipeline re-evaluates the full upstream lineage,
    * so tokenize+hash would run once per IDF fit and again for the
    * regression and both evaluations. Here the stateless stages
    * (tokenize, n-gram, hash) run ONCE over the corpus into one cache,
    * and every later pass (IDF fit, ridge iterations, evaluations) reads
    * it. Two job-count fusions on top — this op is fixed-cost-bound at
    * bench scale (each Spark job is ~100-200 ms of scheduling around
    * trivial compute), and job count is also what multiplies at 100 TB
    * where every pass is a full corpus scan:
    *  - ONE IDF fit over the assembled (tf1 ++ tf2) vector instead of
    *    one per gram order: document frequency (and minDocFreq) is
    *    per-dimension, so idf([tf1 ++ tf2]) == [idf1(tf1) ++ idf2(tf2)]
    *    exactly — same features, half the treeAggregate rounds;
    *  - train RMSE + train mean in one aggregate, test RMSE + baseline
    *    RMSE in another (they scan the same slice).
    */
  def fitEval(docs: DataFrame, labelCol: String, orderCol: String,
              testFraction: Double = 0.25, numFeatures: Int = 1024,
              regParam: Double = 0.1): Trained = {
    val cut = docs.stat.approxQuantile(orderCol, Array(1 - testFraction), 0.0)
      .head
    val withLabel = docs.withColumn("label", col(labelCol).cast("double"))
    val asmTf = new VectorAssembler()
      .setInputCols(Array("tf1", "tf2")).setOutputCol("tf")
    val hashed = asmTf.transform(
        tf2(numFeatures).transform(tf1(numFeatures).transform(
          bigrams.transform(tok.transform(withLabel)))))
      .select(col(orderCol), col("label"), col("tf"))
      .cache()
    // Size the gradient frame to the data: each L-BFGS iteration is one
    // treeAggregate BARRIER over trainFeat, so at a few hundred rows per
    // partition the per-task scheduling dwarfs the gradient math
    // (measured: the fit was 1.7 s of the 3.3 s entry at sf0.1 on 32
    // partitions of ~120 rows). Target ~5k rows/partition, never MORE
    // partitions than the upstream layout — a genuinely large corpus
    // keeps its fan-out, a bench-scale one collapses to a few tasks.
    // The count also fills the cache it would have filled at idf.fit.
    val parts = math.max(1L, math.min(hashed.rdd.getNumPartitions.toLong,
      (hashed.count() + 4999) / 5000)).toInt
    val trainTf = hashed.filter(col(orderCol) <= cut)
    val testTf = hashed.filter(col(orderCol) > cut)
    try {
      val im: IDFModel = new IDF().setInputCol("tf")
        .setOutputCol("features").setMinDocFreq(3).fit(trainTf)
      val trainFeat = im.transform(trainTf)
        .select(col("label"), col("features")).coalesce(parts).cache()
      try {
        val lrm = ridge(regParam).fit(trainFeat)
        val trainRow = lrm.transform(trainFeat)
          .select(sqrt(avg(pow(col("prediction") - col("label"), 2))),
            avg(col("label")))
          .collect().head
        val (trainRmse, mean) = (trainRow.getDouble(0), trainRow.getDouble(1))
        val testRow = lrm.transform(im.transform(testTf)
            .select(col("label"), col("features")))
          .select(sqrt(avg(pow(col("prediction") - col("label"), 2))),
            sqrt(avg(pow(col("label") - lit(mean), 2))))
          .collect().head
        Trained(lrm, trainRmse, testRow.getDouble(0), testRow.getDouble(1))
      } finally { trainFeat.unpersist() }
    } finally hashed.unpersist()
  }

  /** Deterministic column permutation, broadcast-gather form: the k-th
    * row under `idCol` order receives the k-th value under
    * salted-hash-of-id order — a reproducible random permutation (no
    * rand(): retries and engines agree). The re-dealt value sequence is
    * ONE aggregated array (bounded by the evaluation-slice contract)
    * broadcast back over the rows, so applying |features| permutations
    * costs one aggregate + narrow projections — no shuffle join per
    * feature (the previous two-windows-plus-join spelling planned 32
    * reduce tasks per feature over ~100-row partitions and dominated the
    * entry's time).
    *
    * PRECONDITION: `idCol` values must be unique — the rank and the
    * dealt order both break ties on it, so duplicate ids would make the
    * re-pairing depend on execution order and void the
    * same-salt-same-result contract.
    */
  private def permutedArrays(df: DataFrame, cols: Seq[String],
                             idCol: String, salt: Int): DataFrame = {
    val h = hash(lit(salt), col(idCol))
    val exprs = cols.map(f => transform(
      array_sort(collect_list(struct(h.as("_h"),
        col(idCol).as("_i"), col(f).as("_v")))),
      e => e.getField("_v")).as(s"_arr_$f"))
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** Permutation importance of a numeric Ridge (Milestone4 cell 14:
    * `permutation_importance` over the numeric-feature Ridge): fit on the
    * time-ordered train slice, then measure how much test RMSE rises when
    * each feature column is independently shuffled — breaking the
    * feature/label pairing while preserving the feature's marginal
    * distribution. Output one row per feature:
    * (feature, base_rmse, permuted_rmse, importance = permuted − base).
    * Permutations are salted-hash deterministic (same salt ⇒ same
    * result, consistent with CorpusOps.mixSample's discipline) —
    * `orderCol` must be unique per row for that contract to hold (it is
    * the tiebreaker of both permutation windows).
    */
  def permutationImportance(docs: DataFrame, featureCols: Seq[String],
                            labelCol: String, orderCol: String,
                            testFraction: Double = 0.25,
                            regParam: Double = 0.1,
                            salt: Int = 0): DataFrame = {
    require(featureCols.nonEmpty)
    val spark = docs.sparkSession
    import spark.implicits._
    val withLabel = docs.select(
      (orderCol +: featureCols).map(c => col(c).cast("double").as(c)) :+
        col(labelCol).cast("double").as("label"): _*)
      .cache()
    val asm = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("features")
    // evaluation-time op over bounded slices (scaladoc contract): the
    // feature frame caches WIDE first (the count fills it, so upstream
    // feature derivations — often regex-heavy — compute at full
    // parallelism exactly once), then the fit/eval frames coalesce to
    // ~5k rows per partition so the normal-equation fit and the
    // union-eval run as a handful of tasks instead of 32-task barriers
    // over ~100-row partitions. A bare coalesce WITHOUT the cache fill
    // would silently drag the upstream feature computation into the
    // coalesced task count — measured, and the whole win disappears.
    // quantile first: it is the action that fills the cache at full
    // width, so the count right after reads cached partitions (~free)
    val cut = withLabel.stat
      .approxQuantile(orderCol, Array(1 - testFraction), 0.0).head
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (withLabel.count() + 4999) / 5000)).toInt
    val train = withLabel.filter(col(orderCol) <= cut).coalesce(parts)
    val test = withLabel.filter(col(orderCol) > cut).coalesce(parts)
    try {
      val model = ridge(regParam, "normal").fit(asm.transform(train))
      // ONE evaluation job for base + every permuted variant: the tagged
      // union scores all slices in a single model.transform + groupBy
      // instead of 1 + |features| separate collect jobs — at bench scale
      // each job is ~150 ms of scheduling around trivial compute, and at
      // corpus scale each would be its own full pass over the test slice.
      // Permuted branches gather their re-dealt values from the one
      // broadcast [[permutedArrays]] row by rank — no per-feature join.
      val arrs = permutedArrays(test, featureCols, orderCol, salt)
      val posed = test.withColumn("_pos",
          row_number().over(Window.orderBy(col(orderCol))))
        .crossJoin(broadcast(arrs))
      val arrCols = featureCols.map(f => s"_arr_$f")
      val tagged = (("__base__", posed) +: featureCols.map(f =>
          f -> posed.withColumn(f, element_at(col(s"_arr_$f"), col("_pos")))))
        .map { case (tag, df) =>
          df.withColumn("_tag", lit(tag)).drop(arrCols: _*) }
        .reduce(_ unionByName _)
      val rmses = model.transform(asm.transform(tagged))
        .groupBy(col("_tag"))
        .agg(sqrt(avg(pow(col("prediction") - col("label"), 2))).as("_r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val base = rmses("__base__")
      featureCols.map { f =>
        (f, base, rmses(f), rmses(f) - base)
      }.toDF("feature", "base_rmse", "permuted_rmse", "importance")
    } finally withLabel.unpersist()
  }
}
