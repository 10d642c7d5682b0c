package graft.ensemble

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.PiiTypes

/** Platt calibration parameters: per-type (a, b) for sigmoid(a*x + b).
  * Identity = (1, 0) for every type. Reference: ensemble.py:20-57. */
case class Calibrator(models: Map[String, (Double, Double)]) {
  def a(t: String): Double = models.getOrElse(t, (1.0, 0.0))._1
  def b(t: String): Double = models.getOrElse(t, (1.0, 0.0))._2
  /** (a,b) arrays aligned to PiiTypes.ALL. */
  def aArray: Seq[Double] = PiiTypes.ALL.map(a)
  def bArray: Seq[Double] = PiiTypes.ALL.map(b)
}
object Calibrator {
  def identity: Calibrator = Calibrator(PiiTypes.ALL.map(t => t -> (1.0, 0.0)).toMap)

  /** JSON persistence (replaces the reference's joblib; corrupt/missing file
    * falls back to identity, ensemble.py:36-42). Format:
    * {"TYPE": [a, b], ...} */
  def save(c: Calibrator, path: String): Unit = {
    val body = PiiTypes.ALL.map(t => s""""$t": [${c.a(t)}, ${c.b(t)}]""").mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }
  def load(path: String): Calibrator =
    try {
      val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val entry = """"([A-Z_]+)":\s*\[([-0-9.eE]+),\s*([-0-9.eE]+)\]""".r
      val m = entry.findAllMatchIn(s).map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)).toMap
      if (m.isEmpty) identity else Calibrator(PiiTypes.ALL.map(t => t -> m.getOrElse(t, (1.0, 0.0))).toMap)
    } catch { case _: Exception => identity }
}

/** Ensemble signal weights. Runtime defaults follow the `Ensemble` dataclass
  * (0.6/0.2/0.4, ensemble.py:64-67); the YAML config schema carries a second
  * default set (0.4/0.3/0.3, config.py:45-47) — the dataclass wins at runtime
  * and is what the reference's tests exercise. */
case class Weights(rule: Double = 0.6, ner: Double = 0.2, embed: Double = 0.4)
object Weights {
  val runtimeDefault: Weights = Weights()
  val configDefault: Weights = Weights(0.4, 0.3, 0.3)
}

/** Weighted fusion → Platt calibration → normalization → argmax, expressed
  * entirely as Catalyst column expressions over per-candidate rows. All
  * per-type vectors are `array<double>` aligned to [[PiiTypes.ALL]] (stable
  * 11-type order). Reference: ensemble.py:90-136.
  *
  * Scale note: everything here is codegen-friendly built-in expression work on
  * an exploded candidate frame — no UDF, no shuffle, no state. At 100 TB this
  * is a pure map stage.
  */
object PiiEnsemble {
  val nTypes: Int = PiiTypes.ALL.length
  def typesCol: Column = array(PiiTypes.ALL.map(lit): _*)

  /** Numerically-fine logistic; Spark's `exp` underflows to 0 gracefully so
    * the two-branch form of the reference (ensemble.py:44-57) is unnecessary
    * for finite inputs. */
  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Per-type raw fused scores for one candidate row (ensemble.py:96-110):
    * w_rule·conf·[label=t] + 0.2·[validations[t]] + w_ner·ner[t] + w_embed·embed[t].
    *
    * @param nerSig     map<string,double> of NER context signals (may be empty/null)
    * @param embedProbs map<string,double> of embedding classifier probs (may be empty/null)
    */
  def rawScores(ruleLabel: Column, ruleConf: Column, validations: Column,
                nerSig: Column, embedProbs: Column,
                w: Weights = Weights.runtimeDefault): Column =
    transform(typesCol, t =>
      lit(w.rule) * ruleConf * when(ruleLabel === t, lit(1.0)).otherwise(lit(0.0)) +
      when(coalesce(element_at(validations, t), lit(false)), lit(0.2)).otherwise(lit(0.0)) +
      lit(w.ner) * coalesce(element_at(nerSig, t), lit(0.0)) +
      lit(w.embed) * coalesce(element_at(embedProbs, t), lit(0.0)))

  /** Offline-mode raw scores: NER context signals and embedding probs are
    * deterministically absent (ner.py:245-249 with no model; embeddings.py:76-80
    * with no classifier → zeros), so only rule prior + validation boost remain. */
  def rawScoresOffline(ruleLabel: Column, ruleConf: Column, validations: Column,
                       w: Weights = Weights.runtimeDefault): Column =
    transform(typesCol, t =>
      lit(w.rule) * ruleConf * when(ruleLabel === t, lit(1.0)).otherwise(lit(0.0)) +
      when(coalesce(element_at(validations, t), lit(false)), lit(0.2)).otherwise(lit(0.0)))

  /** sigmoid(a_t·s_t + b_t) per type (ensemble.py:112-113). */
  def calibrate(scores: Column, calib: Calibrator): Column = {
    val as = array(calib.aArray.map(lit): _*)
    val bs = array(calib.bArray.map(lit): _*)
    zip_with(scores, as, (s, a) => s * a) // a*s
      .pipe(z => zip_with(z, bs, (za, b) => sigmoid(za + b)))
  }
  private implicit class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  /** Normalize probs to sum 1 (zero-sum guard `or 1.0`, ensemble.py:115) and
    * pick argmax with first-in-type-order tie-break (Python `max` semantics,
    * ensemble.py:117). Returns struct(probs array, label, score). */
  def normalizeArgmax(probs: Column): Column = {
    val ssum0 = aggregate(probs, lit(0.0), (acc, x) => acc + x)
    val ssum = when(ssum0 === 0.0, lit(1.0)).otherwise(ssum0)
    val norm = transform(probs, p => p / ssum)
    // struct max compares fields in order: prob, then -idx (earlier type wins ties)
    val best = array_max(zip_with(norm, sequence(lit(0), lit(nTypes - 1)),
      (p, i) => struct(p.as("p"), (-i).as("ni"))))
    struct(
      norm.as("probs"),
      element_at(typesCol, -best.getField("ni") + 1).as("label"),
      best.getField("p").as("score"))
  }

  /** Full offline prediction columns for an exploded candidate frame:
    * struct(probs, label, score).
    *
    * NOTE: this single-Column form splices the whole chain into one
    * expression tree; higher-order functions are interpreted (no codegen CSE)
    * so shared stages get re-evaluated per reference. Fine for CLI-sized
    * inputs; for datasets use [[withPredictionOffline]], which materializes
    * each stage as a column (CollapseProject keeps non-cheap multi-referenced
    * projections as separate stages, so each stage evaluates once per row). */
  def predictOffline(ruleLabel: Column, ruleConf: Column, validations: Column,
                     calib: Calibrator = Calibrator.identity,
                     w: Weights = Weights.runtimeDefault): Column =
    normalizeArgmax(calibrate(rawScoresOffline(ruleLabel, ruleConf, validations, w), calib))

  /** Staged offline prediction over a DataFrame — the scale path. Adds
    * `out` = struct(probs, label, score). */
  def withPredictionOffline(df: org.apache.spark.sql.DataFrame,
                            ruleLabel: Column, ruleConf: Column, validations: Column,
                            calib: Calibrator = Calibrator.identity,
                            w: Weights = Weights.runtimeDefault,
                            out: String = "pred"): org.apache.spark.sql.DataFrame = {
    val withStages = df
      .withColumn("__scores", rawScoresOffline(ruleLabel, ruleConf, validations, w))
      .withColumn("__praw", calibrate(col("__scores"), calib))
      .withColumn("__ssum0", aggregate(col("__praw"), lit(0.0), (acc, x) => acc + x))
      .withColumn("__ssum", when(col("__ssum0") === 0.0, lit(1.0)).otherwise(col("__ssum0")))
      .withColumn("__probs", transform(col("__praw"), p => p / col("__ssum")))
      .withColumn("__best", array_max(zip_with(col("__probs"), sequence(lit(0), lit(nTypes - 1)),
        (p, i) => struct(p.as("p"), (-i).as("ni")))))
    withStages
      .withColumn(out, struct(
        col("__probs").as("probs"),
        element_at(typesCol, -col("__best").getField("ni") + 1).as("label"),
        col("__best").getField("p").as("score")))
      .drop("__scores", "__praw", "__ssum0", "__ssum", "__probs", "__best")
  }

  /** Full prediction with live NER/embed signal maps. */
  def predict(ruleLabel: Column, ruleConf: Column, validations: Column,
              nerSig: Column, embedProbs: Column,
              calib: Calibrator = Calibrator.identity,
              w: Weights = Weights.runtimeDefault): Column =
    normalizeArgmax(calibrate(rawScores(ruleLabel, ruleConf, validations, nerSig, embedProbs, w), calib))

  /** Staged full-signal prediction over a DataFrame (the scale path, like
    * [[withPredictionOffline]] but with live NER/embed maps). */
  def withPrediction(df: org.apache.spark.sql.DataFrame,
                     ruleLabel: Column, ruleConf: Column, validations: Column,
                     nerSig: Column, embedProbs: Column,
                     calib: Calibrator = Calibrator.identity,
                     w: Weights = Weights.runtimeDefault,
                     out: String = "pred"): org.apache.spark.sql.DataFrame = {
    val withStages = df
      .withColumn("__scores", rawScores(ruleLabel, ruleConf, validations, nerSig, embedProbs, w))
      .withColumn("__praw", calibrate(col("__scores"), calib))
      .withColumn("__ssum0", aggregate(col("__praw"), lit(0.0), (acc, x) => acc + x))
      .withColumn("__ssum", when(col("__ssum0") === 0.0, lit(1.0)).otherwise(col("__ssum0")))
      .withColumn("__probs", transform(col("__praw"), p => p / col("__ssum")))
      .withColumn("__best", array_max(zip_with(col("__probs"), sequence(lit(0), lit(nTypes - 1)),
        (p, i) => struct(p.as("p"), (-i).as("ni")))))
    withStages
      .withColumn(out, struct(
        col("__probs").as("probs"),
        element_at(typesCol, -col("__best").getField("ni") + 1).as("label"),
        col("__best").getField("p").as("score")))
      .drop("__scores", "__praw", "__ssum0", "__ssum", "__probs", "__best")
  }

  /** Raw per-type score array → named map column aligned to PiiTypes.ALL. */
  def scoresToMap(scores: Column): Column = map_from_arrays(typesCol, scores)
}
