package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.forecast.ArTrainer
import graft.ml.TextRegression
import graft.multimodal.MultimodalOps

class TrainerMlSpec extends SparkSpec {
  import spark.implicits._

  test("fitAr recovers AR(1) coefficient from synthetic series (X5)") {
    // x_t = 5 + 0.8 x_{t-1} + tiny deterministic wiggle
    val xs = Iterator.iterate((100.0, 1))(p =>
      (5 + 0.8 * p._1 + math.sin(p._2) * 0.01, p._2 + 1))
      .map(_._1).take(300).toArray
    val Some((c, phi)) = ArTrainer.fitAr(xs, 1)
    assert(math.abs(phi(0) - 0.8) < 0.05)
    assert(math.abs(c - 5.0) < 1.5)
  }

  test("trainer picks a model with sane holdout error on a trend (X5/A17)") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val pts = (0 until 200).map { i =>
      ArTrainer.SeriesPoint("K", new Timestamp(base + i * 30000L),
        100.0 + i * 0.5) // linear trend, AR(2) captures drift exactly
    }
    val models = ArTrainer.train(pts.toDS(), holdout = 30, maxP = 3)
      .collect()
    assert(models.length === 1)
    val m = models.head
    assert(m.n_train === 170 && m.n_test === 30)
    assert(m.mae < 1.0, s"holdout MAE ${m.mae} too high")
  }

  test("syntheticAr2 fixture: deterministic, stationary around the mean," +
      " and OLS recovers the generating coefficients (X5 envelope)") {
    val a = ArTrainer.syntheticAr2("click", 200, 0.5, -0.3, 2.0, 0.05)
    val b = ArTrainer.syntheticAr2("click", 200, 0.5, -0.3, 2.0, 0.05)
    assert(a === b, "pure function of (symbol, t)")
    assert(a !== ArTrainer.syntheticAr2("view", 200, 0.5, -0.3, 2.0, 0.05))
    val xs = a.map(_._2).toArray
    val mean = 2.0 / (1.0 - 0.5 - (-0.3))
    assert(xs.forall(x => math.abs(x - mean) < 0.25),
      "deviation bounded by sigma/(1-|phi1|-|phi2|)")
    // with the order GIVEN, plain OLS recovers the generating phi
    // 200 points of uniform innovations: coef se ~ 1/sqrt(n) ~ 0.07,
    // so 0.2 is a ~3-sigma recovery band, not a precision claim
    val Some((c, phi)) = ArTrainer.fitAr(xs, 2)
    assert(math.abs(phi(0) - 0.5) < 0.2, s"phi1 ${phi(0)}")
    assert(math.abs(phi(1) + 0.3) < 0.2, s"phi2 ${phi(1)}")
    assert(math.abs(c - 2.0) < 0.6, s"c $c")
  }

  test("model bundle round-trips through parquet (K4)") {
    val dir = java.nio.file.Files.createTempDirectory("bundle").toString
    val m = ArTrainer.ArModel("ETH", 2, 1, 1, 1.5, Array(0.9, 0.05),
      Array(0.4), 100, 30, 0.1, 0.2, 0.3)
    ArTrainer.saveBundle(Seq(m).toDS(), s"$dir/models")
    val loaded = ArTrainer.loadBundle(spark, s"$dir/models").collect().head
    assert(loaded === m.copy(coeffs = loaded.coeffs,
      maCoeffs = loaded.maCoeffs))
    assert(loaded.coeffs.toSeq === Seq(0.9, 0.05))
    assert(loaded.maCoeffs.toSeq === Seq(0.4))
    assert(loaded.d === 1 && loaded.q === 1)
  }

  test("Hannan-Rissanen recovers the MA coefficient of an MA(1) series") {
    // x_t = 10 + e_t + 0.8 e_{t-1}, deterministic seeded innovations
    val rnd = new scala.util.Random(42)
    val e = Array.fill(2000)(rnd.nextGaussian())
    val xs = Array.tabulate(2000)(t =>
      10.0 + e(t) + (if (t > 0) 0.8 * e(t - 1) else 0.0))
    val Some((c, _, theta, _)) = ArTrainer.fitArma(xs, 1, 1)
    assert(math.abs(theta(0) - 0.8) < 0.15,
      s"theta ${theta(0)} should be near 0.8")
    assert(math.abs(c - 10.0) < 2.0, s"intercept $c should be near 10")
  }

  test("ARMA grid beats the AR-only grid on ARMA(1,1) series (X5)") {
    // phi=0.6, theta=0.9: AR(p<=3) truncates the slowly-decaying MA tail.
    // Multi-step forecasts converge to the mean, so only the first steps
    // discriminate the models — short holdout, aggregated over 8 seeded
    // series so the comparison is statistical, not single-draw luck.
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val n = 800
    val pts = (0 until 8).flatMap { s =>
      val rnd = new scala.util.Random(100 + s)
      val e = Array.fill(n)(rnd.nextGaussian())
      val xs = new Array[Double](n)
      xs(0) = 50.0
      for (t <- 1 until n)
        xs(t) = 20.0 + 0.6 * xs(t - 1) + e(t) + 0.9 * e(t - 1)
      (0 until n).map(i => ArTrainer.SeriesPoint(s"S$s",
        new Timestamp(base + i * 30000L), xs(i)))
    }
    def models(maxQ: Int): Map[String, ArTrainer.ArModel] =
      ArTrainer.train(pts.toDS(), holdout = 3, maxP = 3,
        maxQ = maxQ, maxD = 0).collect().map(m => m.symbol -> m).toMap
    val arma = models(maxQ = 2)
    val arOnly = models(maxQ = 0)
    val armaTotal = arma.values.map(_.mae).sum
    val arTotal = arOnly.values.map(_.mae).sum
    // q>0 grid is a superset of the q=0 grid: per-symbol MAE can only
    // improve...
    arma.foreach { case (s, m) => assert(m.mae <= arOnly(s).mae, s) }
    // ...and across 8 series the MA term must actually win ground
    assert(armaTotal < arTotal,
      s"ARMA total MAE $armaTotal should beat AR-only $arTotal")
    // a 3-point holdout is noisy per symbol, so only require the MA
    // family to be selected sometimes; the aggregate-MAE assert above is
    // the real discriminator (and theta recovery is pinned directly in
    // the Hannan-Rissanen test)
    val nSelected = arma.values.count(_.q > 0)
    assert(nSelected >= 2,
      s"MA terms selected for only $nSelected/8 series")
  }

  test("permutation importance ranks the real feature above noise") {
    // label = 3*f1 (+ small f2 term); f3 is pure noise
    val df = (0 until 400).map { i =>
      val f1 = (i % 23).toDouble
      val f2 = ((i * 7) % 11).toDouble
      val f3 = ((i * 13) % 5).toDouble
      (i.toLong, f1, f2, f3, 3.0 * f1 + 0.2 * f2)
    }.toDF("doc_id", "f1", "f2", "f3", "y")
    val imp = TextRegression.permutationImportance(
        df, Seq("f1", "f2", "f3"), "y", "doc_id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("importance"))
      .toMap
    assert(imp("f1") > imp("f2"), s"f1 ${imp("f1")} vs f2 ${imp("f2")}")
    assert(imp("f1") > 10 * math.max(imp("f3"), 1e-9),
      s"noise feature importance ${imp("f3")} should be negligible")
    // deterministic: same salt reproduces identical numbers
    val imp2 = TextRegression.permutationImportance(
        df, Seq("f1", "f2", "f3"), "y", "doc_id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("importance"))
      .toMap
    assert(imp === imp2)
  }

  test("tf-idf ridge beats predict-the-mean baseline out of sample (X8)") {
    // label = 10 * count("spark") + 5: perfectly predictable from text
    val docs = (0 until 400).map { i =>
      val k = i % 5
      (i.toLong, Seq.fill(k)("spark").mkString(" ") + " filler words here",
        10.0 * k + 5)
    }.toDF("doc_id", "text", "n_chars")
    val t = TextRegression.fitEval(docs, "n_chars", "doc_id")
    assert(t.testRmse < t.baselineRmse * 0.5,
      s"test rmse ${t.testRmse} vs baseline ${t.baselineRmse}")
  }

  test("multimodal stub decode is deterministic per-partition (T6 shape)") {
    val docs = Seq((0L, "hello world", "en", "src0", 11L),
      (1L, "abc", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = MultimodalOps.mediaFromDocuments(docs)
    val f = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(0L).byte_len === 11L)
    assert(f(0L).kind === "image")
    assert(f(1L).kind === "audio")
    // deterministic: re-run gives identical features
    val f2 = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(0L) === f2(0L))
    // md5 of "hello world"
    assert(f(0L).sha_hex === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("resize plan caps the long side (multimodal metadata op)") {
    val features = Seq((0L, 100, 50), (1L, 10, 20))
      .toDF("media_id", "width", "height")
    val out = MultimodalOps.resizePlan(features, 32).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    assert(out(0L) === (32, 16))
    assert(out(1L) === (10, 20)) // never upscale
  }

  test("frame sampling slices n windows from payload binary") {
    val docs = Seq((0L, "x" * 1000, "en", "src0", 1000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = MultimodalOps.mediaFromDocuments(docs).toDF()
    val frames = MultimodalOps.sampleFrames(media, n = 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq === Seq(0, 1, 2, 3))
  }

  test("to_json round-trips a struct (F17)") {
    val df = Seq(("ETH", 123L, 1.5)).toDF("symbol", "ts", "price")
    val js = df.select(to_json(struct($"symbol", $"ts", $"price")).as("j"))
    val parsed = js.select(from_json($"j",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("symbol",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DoubleType)))).as("s"))
      .select($"s.*").collect().head
    assert(parsed.getAs[String]("symbol") === "ETH")
    assert(parsed.getAs[Long]("ts") === 123L)
    assert(parsed.getAs[Double]("price") === 1.5)
  }
}
