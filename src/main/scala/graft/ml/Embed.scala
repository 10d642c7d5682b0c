package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, NGram, RegexTokenizer, StandardScaler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PiiTypes

/** Embedding classifier (reference: embeddings.py).
  *
  * The reference encodes sanitized context windows with SBERT and fits a
  * one-vs-rest scaled LogisticRegression per PII type (embeddings.py:101-138).
  * Its tested path is OFFLINE: with no classifier, `predict_proba` returns
  * all-zero neutral probabilities (embeddings.py:76-80) — that neutral path is
  * the semantic contract and is what [[EmbedModel.neutral]] reproduces.
  *
  * The trainable path replaces SBERT with a deterministic hashed char
  * 1-5-gram featurizer (the container has no model weights; the reference's own
  * offline fallback is seeded noise, documented non-reproducible on JVM —
  * SURVEY §7.4) and MLlib StandardScaler(withMean=false) + per-type
  * LogisticRegression with balanced class weights, keeping the degenerate-
  * class constant estimators (embeddings.py:113-122).
  */
class EmbedModel(
    val classifiers: Map[String, Either[Double, (Vector, Double, Array[Double], Double)]]) {
  // Left(constProb) for degenerate classes; Right((coef, intercept, scalerStd, _)) for LR.

  def isNeutral: Boolean = classifiers.isEmpty

  /** probs per type for each context row; neutral = all zeros
    * (embeddings.py:76-80). Adds one `embed_<TYPE>` column per type.
    *
    * The LR score is a pure expression: the per-feature scale 1/std folds
    * into the coefficients at PLAN time (std(i)==0 → term is 0, matching the
    * guarded per-row division), so scoring is one codegen'd dot product per
    * type over the feature array — no UDF, no Vector boxing per row. Terms
    * accumulate in index order and zero terms add exactly 0.0, so the result
    * is numerically equivalent (within 1 ulp per term) to the former sparse
    * foreachActive fold: that computed c*(x/std) where this computes
    * x*(c/std), which can differ in the last bit of a term. */
  def predictProba(contexts: DataFrame, textCol: String): DataFrame = {
    if (isNeutral) {
      PiiTypes.ALL.foldLeft(contexts)((df, t) => df.withColumn(s"embed_$t", lit(0.0)))
    } else {
      val feats = EmbedModel.featurize(contexts, textCol)
        .withColumn("fx", org.apache.spark.ml.functions.vector_to_array(col("features")))
      PiiTypes.ALL.foldLeft(feats) { (df, t) =>
        classifiers.get(t) match {
          case Some(Left(const)) => df.withColumn(s"embed_$t", lit(const))
          case Some(Right((coef, intercept, std, _))) =>
            // Plan-time guard: zip_with would silently null out the score if
            // a persisted model's dimensionality ever diverged from featurize.
            require(coef.size == EmbedModel.NumFeatures && std.length == EmbedModel.NumFeatures,
              s"model for $t has ${coef.size} coefs / ${std.length} stds; " +
                s"featurize emits ${EmbedModel.NumFeatures}-dim vectors")
            val scaled = coef.toArray.zipWithIndex.map { case (c, i) =>
              if (std(i) == 0.0) 0.0 else c / std(i)
            }
            val z = lit(intercept) + aggregate(
              zip_with(col("fx"), array(scaled.toIndexedSeq.map(lit): _*), (x, c) => x * c),
              lit(0.0), (acc, v) => acc + v)
            df.withColumn(s"embed_$t", lit(1.0) / (lit(1.0) + exp(-z)))
          case None => df.withColumn(s"embed_$t", lit(0.0))
        }
      }.drop("features", "fx")
    }
  }
}

object EmbedModel {
  val NumFeatures = 512

  /** Neutral (offline) model: predict_proba == zeros for every type. */
  def neutral: EmbedModel = new EmbedModel(Map.empty)

  /** JSON persistence replacing the reference's joblib (embeddings.py save/
    * load); missing or corrupt file falls back to the neutral model — the
    * same contract as Calibrator.load (ensemble.py:36-42).
    * Format per type: {"const": p} or {"coef": [...], "intercept": b, "std": [...]}. */
  def save(m: EmbedModel, path: String): Unit = {
    def arr(xs: Iterable[Double]) = xs.mkString("[", ",", "]")
    val body = m.classifiers.map {
      case (t, Left(const)) => s""""$t": {"const": $const}"""
      case (t, Right((coef, intercept, std, pos))) =>
        s""""$t": {"coef": ${arr(coef.toArray)}, "intercept": $intercept, "std": ${arr(std.toIndexedSeq)}, "pos": $pos}"""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }

  def load(path: String): EmbedModel =
    try {
      val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val constRe = """"([A-Z_]+)":\s*\{"const":\s*([-0-9.eE]+)\}""".r
      val lrRe = """"([A-Z_]+)":\s*\{"coef":\s*\[([^\]]*)\],\s*"intercept":\s*([-0-9.eE]+),\s*"std":\s*\[([^\]]*)\],\s*"pos":\s*([-0-9.eE]+)\}""".r
      val consts = constRe.findAllMatchIn(s).map(m =>
        m.group(1) -> Left(m.group(2).toDouble)).toMap
      val lrs = lrRe.findAllMatchIn(s).map { m =>
        val coef = m.group(2).split(",").filter(_.nonEmpty).map(_.toDouble)
        val std = m.group(4).split(",").filter(_.nonEmpty).map(_.toDouble)
        m.group(1) -> Right((org.apache.spark.ml.linalg.Vectors.dense(coef),
          m.group(3).toDouble, std, m.group(5).toDouble))
      }.toMap
      new EmbedModel(consts ++ lrs)
    } catch { case _: Exception => neutral }

  /** Deterministic featurizer: hashed 2-5 char n-gram counts (plus the
    * unigram chars), built from lowercased non-space characters. */
  def featurize(df: DataFrame, textCol: String): DataFrame = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("toks")
      .setPattern("\\S").setGaps(false).setToLowercase(true).setMinTokenLength(1)
    val chars = tok.transform(df)
    val withGrams = (2 to 5).foldLeft(chars) { (d, n) =>
      new NGram().setN(n).setInputCol("toks").setOutputCol(s"g$n").transform(d)
    }
    val all = withGrams.withColumn("grams",
      concat(col("toks"), col("g2"), col("g3"), col("g4"), col("g5")))
    val tf = new HashingTF().setInputCol("grams").setOutputCol("features")
      .setNumFeatures(NumFeatures)
    tf.transform(all).drop("toks", "g2", "g3", "g4", "g5", "grams")
  }

  /** One-vs-rest fit with the reference's degenerate-class guards:
    * 0 positives → constant 0.0, all positives → constant 1.0
    * (embeddings.py:113-122).
    *
    * @param labeled (textCol, labelCol) rows; labelCol holds the gold type */
  def fit(labeled: DataFrame, textCol: String, labelCol: String): EmbedModel = {
    val spark = labeled.sparkSession
    val feats = featurize(labeled, textCol).cache()
    val n = feats.count()
    val scaler = new StandardScaler().setWithMean(false).setWithStd(true)
      .setInputCol("features").setOutputCol("scaled")
    val scalerModel = scaler.fit(feats)
    val std = scalerModel.std.toArray
    val classifiers = PiiTypes.ALL.flatMap { t =>
      val withY = feats.withColumn("y", when(col(labelCol) === t, 1.0).otherwise(0.0))
      val pos = withY.agg(sum("y")).head.getDouble(0)
      if (pos == 0) Some(t -> Left(0.0))
      else if (pos == n) Some(t -> Left(1.0))
      else {
        // balanced class weights (class_weight="balanced")
        val wPos = n / (2.0 * pos)
        val wNeg = n / (2.0 * (n - pos))
        val weighted = scalerModel.transform(withY)
          .withColumn("w", when(col("y") === 1.0, wPos).otherwise(wNeg))
          .select(col("scaled").as("features"), col("y").as("label"), col("w"))
        val lr = new LogisticRegression().setMaxIter(200).setWeightCol("w")
          .setRegParam(1.0 / n) // ~ liblinear C=1.0 (1/(n·C) scaled loss)
        val m = lr.fit(weighted)
        Some(t -> Right((m.coefficients, m.intercept, std, pos)))
      }
    }.toMap
    feats.unpersist()
    new EmbedModel(classifiers)
  }
}

/** Platt calibrator fit (ensemble.py:170-189): per type, a 1-feature logistic
  * regression of raw ensemble score vs (gold == type), with identity (1,0)
  * for degenerate label distributions. Solved by damped Newton on the
  * L2-regularized logistic loss (liblinear's objective, C=1). The data is 11
  * tiny driver-side series — no distribution needed (the heavy part, raw
  * score computation, IS distributed upstream). */
object CalibratorFit {

  def fit(rawScores: Seq[Map[String, Double]], labels: Seq[Option[String]]): graft.ensemble.Calibrator = {
    val models = PiiTypes.ALL.map { t =>
      val x = rawScores.map(_.getOrElse(t, 0.0)).toArray
      val y = labels.map(l => if (l.contains(t)) 1.0 else 0.0).toArray
      val pos = y.sum
      if (pos == 0 || pos == y.length) t -> (1.0, 0.0)
      else t -> newton1d(x, y)
    }.toMap
    graft.ensemble.Calibrator(models)
  }

  /** Distributed fit: same per-type Newton as [[fit]], but each iteration's
    * gradient/Hessian terms are computed as ONE `agg()` over the labeled
    * frame (5 sums per still-active type) instead of collecting the raw
    * series to the driver — the logistic loss has no finite sufficient
    * statistic, but every Newton STEP needs only these five aggregates.
    * The driver holds 11 (w,b) pairs and a one-row result per iteration;
    * nothing scales with the labeled-set size, so a 100×-larger labeled
    * corpus changes executor work only.
    *
    * `labeled` needs `rawCol: array<double>` (scores in [[PiiTypes.ALL]]
    * order, the [[graft.eval.Evaluator.calibrationLabels]] output shape)
    * and nullable string `labelCol`. Converged types drop out of the agg;
    * iteration order and update math mirror [[newton1d]] exactly (per-type
    * results match the collected fit to ~1e-12 — distributed float-sum
    * reorder is the only difference). */
  def fitDistributed(labeled: org.apache.spark.sql.DataFrame,
                     rawCol: String = "raw",
                     labelCol: String = "gold_label"): graft.ensemble.Calibrator = {
    import org.apache.spark.sql.functions._
    val types = PiiTypes.ALL
    val df = labeled.select(col(rawCol).as("__raw"), col(labelCol).as("__gold"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val posAggs = types.map(t =>
        sum(when(col("__gold") === t, 1L).otherwise(0L)).as(s"pos_$t"))
      val cnt = df.agg(count(lit(1)).as("__n"), posAggs: _*).head()
      val n = cnt.getLong(0)
      val pos = types.zipWithIndex.map { case (t, i) => t -> cnt.getLong(i + 1) }.toMap
      val params = scala.collection.mutable.Map[String, (Double, Double)](
        types.map(t => t -> (0.0, 0.0)): _*)
      // degenerate label distributions: identity, same as the driver fit
      val degenerate = types.filter(t => pos(t) == 0L || pos(t) == n).toSet
      degenerate.foreach(t => params(t) = (1.0, 0.0))
      var active = types.filterNot(degenerate)
      var iter = 0
      val C = 1.0
      while (active.nonEmpty && iter < 100) {
        val aggs = active.flatMap { t =>
          val x = element_at(col("__raw"), types.indexOf(t) + 1)
          val y = when(col("__gold") === t, 1.0).otherwise(-1.0)
          val (w, b) = params(t)
          val s = lit(1.0) / (lit(1.0) + exp(y * (x * lit(w) + lit(b)))) // σ(-z)
          val d = s * (lit(1.0) - s)
          Seq(sum(-y * x * s).as(s"g0_$t"), sum(-y * s).as(s"g1_$t"),
            sum(d * x * x).as(s"h00_$t"), sum(d * x).as(s"h01_$t"),
            sum(d).as(s"h11_$t"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        active = active.filter { t =>
          val base = active.indexOf(t) * 5
          val (w, b) = params(t)
          val g0 = w + C * row.getDouble(base)
          val g1 = b + C * row.getDouble(base + 1)
          val h00 = 1.0 + C * row.getDouble(base + 2)
          val h01 = C * row.getDouble(base + 3)
          val h11 = 1.0 + C * row.getDouble(base + 4)
          val det = h00 * h11 - h01 * h01
          val dw = (h11 * g0 - h01 * g1) / det
          val db = (h00 * g1 - h01 * g0) / det
          params(t) = (w - dw, b - db)
          math.abs(dw) + math.abs(db) >= 1e-10
        }
        iter += 1
      }
      graft.ensemble.Calibrator(params.toMap)
    } finally { df.unpersist(blocking = false); () }
  }

  /** Damped Newton for min_w,b  0.5(w²+b²) + C·Σ log(1+exp(-ŷ(wx+b))),
    * ŷ∈{-1,1}, C=1 (liblinear penalizes the intercept via augmentation). */
  private def newton1d(x: Array[Double], y01: Array[Double]): (Double, Double) = {
    val y = y01.map(v => if (v > 0.5) 1.0 else -1.0)
    var w = 0.0; var b = 0.0
    val C = 1.0
    for (_ <- 0 until 100) {
      var g0 = w; var g1 = b
      var h00 = 1.0; var h01 = 0.0; var h11 = 1.0
      var i = 0
      while (i < x.length) {
        val z = y(i) * (w * x(i) + b)
        val s = 1.0 / (1.0 + math.exp(z))       // σ(-z)
        val d = s * (1.0 - s)
        g0 += C * (-y(i) * x(i) * s)
        g1 += C * (-y(i) * s)
        h00 += C * d * x(i) * x(i)
        h01 += C * d * x(i)
        h11 += C * d
        i += 1
      }
      val det = h00 * h11 - h01 * h01
      val dw = (h11 * g0 - h01 * g1) / det
      val db = (h00 * g1 - h01 * g0) / det
      w -= dw; b -= db
      if (math.abs(dw) + math.abs(db) < 1e-10) return (w, b)
    }
    (w, b)
  }
}
