package graft.forecast

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** X5/A5/K4: per-key AR(p) trainer — the Spark-native re-expression of the
  * reference training job (analytical_module/arima.py:298-408: per-symbol
  * `auto_arima(max_p=5, max_q=5, seasonal=False)` on a 30 s resampled,
  * forward-filled series, last-30-point holdout, MAE/MAPE/MSE, serialized
  * bundle to object storage).
  *
  * Divergences (documented, SURVEY.md §7 risk 3): pmdarima's auto_arima is
  * not reproducible in-JVM, so the model family is AR(p) fit by ordinary
  * least squares on the normal equations (plus intercept), order chosen by
  * holdout MAE over p in [1, maxP]. Statistical sanity is tested (holdout
  * error), not bitwise parity.
  *
  * Scale: `groupByKey(symbol).mapGroups` — one shuffle keyed by symbol
  * (uniform unless one key dominates), state O(series length) per group
  * only inside the group iterator, model output O(p) per key. This is the
  * typed, no-RDD-drop version of the reference's
  * `grouped.rdd.map(train_row)` (arima.py:486-498).
  */
object ArTrainer {

  final case class SeriesPoint(symbol: String, bucket: Timestamp,
      value: Double)
  final case class ArModel(symbol: String, p: Int, intercept: Double,
      coeffs: Array[Double], n_train: Int, n_test: Int,
      mae: Double, mape: Double, mse: Double)

  /** Solve the symmetric linear system A x = b by Gaussian elimination
    * with partial pivoting (tiny p x p system — no library needed).
    */
  private def solve(a: Array[Array[Double]], b: Array[Double])
      : Option[Array[Double]] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(m(r)(col)))
      if (math.abs(m(piv)(col)) < 1e-12) return None
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      for (r <- col + 1 until n) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col to n) m(r)(c) -= f * m(col)(c)
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = m(r)(n)
      for (c <- r + 1 until n) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    Some(x)
  }

  /** OLS fit of x_t = c + sum_j phi_j x_{t-j}; returns (c, phi). */
  def fitAr(series: Array[Double], p: Int): Option[(Double, Array[Double])] = {
    val n = series.length - p
    if (n <= p + 1) return None
    val dim = p + 1
    val ata = Array.fill(dim, dim)(0.0)
    val atb = Array.fill(dim)(0.0)
    for (t <- p until series.length) {
      val row = 1.0 +: Array.tabulate(p)(j => series(t - 1 - j))
      for (i <- 0 until dim) {
        atb(i) += row(i) * series(t)
        for (j <- 0 until dim) ata(i)(j) += row(i) * row(j)
      }
    }
    solve(ata, atb).map(x => (x(0), x.drop(1)))
  }

  /** Multi-step recursive forecast from the last p observations. */
  def forecastAr(c: Double, phi: Array[Double], history: Array[Double],
                 steps: Int): Array[Double] = {
    val buf = history.takeRight(phi.length).reverse.toBuffer // newest first
    Array.fill(steps) {
      val next = c + phi.iterator.zipWithIndex
        .map { case (w, j) => w * buf(j) }.sum
      buf.prepend(next)
      next
    }
  }

  private def metrics(actual: Array[Double], pred: Array[Double])
      : (Double, Double, Double) = {
    val n = actual.length
    val errs = actual.zip(pred).map { case (a, p) => a - p }
    val mae = errs.map(math.abs).sum / n
    val mse = errs.map(e => e * e).sum / n
    val mape = actual.zip(pred).map { case (a, p) =>
      math.abs((a - p) / math.max(math.abs(a), 1e-8)) }.sum / n * 100
    (mae, mape, mse)
  }

  /** Train one model per symbol over a regularized (resampled+ffilled)
    * series — input from TimeSeriesOps.resampleLastFfill. Holdout = last
    * `holdout` points (reference default 30, min train 50).
    */
  def train(series: Dataset[SeriesPoint], holdout: Int = 30, maxP: Int = 3,
            minTrain: Int = 50): Dataset[ArModel] = {
    implicit val enc = Encoders.product[ArModel]
    series.groupByKey(_.symbol)(Encoders.STRING).mapGroups { (sym, it) =>
      val xs = it.toArray.sortBy(_.bucket.getTime).map(_.value)
      val (trainArr, testArr) = xs.splitAt(math.max(xs.length - holdout, 0))
      if (trainArr.length < minTrain || testArr.isEmpty)
        ArModel(sym, 0, 0.0, Array.empty, trainArr.length, testArr.length,
          Double.NaN, Double.NaN, Double.NaN)
      else {
        val candidates = (1 to maxP).flatMap { p =>
          fitAr(trainArr, p).map { case (c, phi) =>
            val pred = forecastAr(c, phi, trainArr, testArr.length)
            val (mae, mape, mse) = metrics(testArr, pred)
            ArModel(sym, p, c, phi, trainArr.length, testArr.length,
              mae, mape, mse)
          }
        }
        if (candidates.isEmpty)
          ArModel(sym, 0, 0.0, Array.empty, trainArr.length, testArr.length,
            Double.NaN, Double.NaN, Double.NaN)
        else candidates.minBy(_.mae)
      }
    }
  }

  /** K4: model bundle persistence — parquet on shared storage replaces the
    * reference's joblib-to-GCS upload (arima.py:547-553); the streaming
    * forecaster initializes per-key state from this bundle like
    * ArimaForecastFn.setup() lazily loads it (stream_join.py:355-368).
    */
  def saveBundle(models: Dataset[ArModel], path: String): Unit =
    models.write.mode("overwrite").parquet(path)

  def loadBundle(spark: SparkSession, path: String): Dataset[ArModel] = {
    implicit val enc = Encoders.product[ArModel]
    spark.read.parquet(path).as[ArModel]
  }

  /** Convenience: events-shaped DataFrame -> regularized series -> models. */
  def trainFromEvents(df: DataFrame, timeCol: String, keyCol: String,
                      valCol: String, stepSeconds: Int,
                      holdout: Int = 30): Dataset[ArModel] = {
    import graft.ops.TimeSeriesOps
    val reg = TimeSeriesOps
      .resampleLastFfill(df, timeCol, keyCol, valCol, stepSeconds)
      .select(col(keyCol).as("symbol"), col("bucket"),
        col("value_ffill").as("value"))
      .filter(col("value").isNotNull)
    implicit val enc = Encoders.product[SeriesPoint]
    train(reg.as[SeriesPoint])
  }
}
