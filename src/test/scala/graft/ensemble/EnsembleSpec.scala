package graft.ensemble

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.PiiTypes
import graft.functions.pii_candidates

/** Ensemble invariants from tests/test_ensemble.py:8-21, exercised through
  * real Spark plans. */
class EnsembleSpec extends SparkSpec {

  private lazy val preds = {
    import spark.implicits._
    Seq("Call me at (415) 555-1212 or email john.doe@example.com").toDF("text")
      .select(posexplode(pii_candidates(col("text"))).as(Seq("idx", "c")))
      .withColumn("pred", PiiEnsemble.predictOffline(
        col("c.rule_label"), col("c.rule_confidence"), col("c.validations")))
      .select(col("c.rule_label").as("rule_label"), col("pred.probs").as("probs"),
        col("pred.label").as("label"), col("pred.score").as("score"))
      .collect()
  }

  test("probs cover all 11 types and sum to 1 (±1e-6)") {
    assert(preds.nonEmpty)
    for (r <- preds) {
      val probs = r.getSeq[Double](r.fieldIndex("probs"))
      assert(probs.length == PiiTypes.ALL.length)
      assert(math.abs(probs.sum - 1.0) < 1e-6)
    }
  }

  test("offline argmax equals the rule label") {
    for (r <- preds)
      assert(r.getString(r.fieldIndex("label")) == r.getString(r.fieldIndex("rule_label")))
  }

  test("score equals the argmax probability") {
    for (r <- preds) {
      val probs = r.getSeq[Double](r.fieldIndex("probs"))
      assert(r.getDouble(r.fieldIndex("score")) == probs.max)
    }
  }

  test("validation boost raises the validated type (Luhn CC)") {
    import spark.implicits._
    val rows = Seq("Card 4111 1111 1111 1111 and card-shaped 9 digits 123456789")
      .toDF("text")
      .select(posexplode(pii_candidates(col("text"))).as(Seq("idx", "c")))
      .withColumn("pred", PiiEnsemble.predictOffline(
        col("c.rule_label"), col("c.rule_confidence"), col("c.validations")))
      .select(col("pred.score")).as[Double].collect()
    // sigmoid(0.6*0.9 + 0.2) / (sigmoid(...) + 5.0)
    val p = 1.0 / (1.0 + math.exp(-(0.6 * 0.9 + 0.2)))
    assert(math.abs(rows.head - p / (p + 5.0)) < 1e-12)
  }

  test("calibrator json roundtrip and identity fallback") {
    val c = Calibrator(PiiTypes.ALL.map(t => t -> (1.5, -0.25)).toMap)
    val f = java.io.File.createTempFile("calib", ".json")
    Calibrator.save(c, f.getAbsolutePath)
    val back = Calibrator.load(f.getAbsolutePath)
    assert(back.models == c.models)
    assert(Calibrator.load("/nonexistent/path.json") == Calibrator.identity)
  }

  test("weights defaults: runtime dataclass wins (0.6/0.2/0.4)") {
    assert(Weights.runtimeDefault == Weights(0.6, 0.2, 0.4))
    assert(Weights.configDefault == Weights(0.4, 0.3, 0.3))
  }
}
