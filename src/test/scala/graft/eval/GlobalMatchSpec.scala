package graft.eval

import graft.SparkSpec

/** matchOutcomesGlobal must reproduce the reference's cross-example pooling:
  * spans from DIFFERENT examples can claim each other's golds when their raw
  * char offsets overlap (eval.py:63-67 + 20-50). */
class GlobalMatchSpec extends SparkSpec {
  test("global pooling lets a pred from doc A match a gold from doc B") {
    import spark.implicits._
    // doc 1 pred overlaps doc 2 gold at raw offsets; no gold in doc 1
    val preds = Seq((1L, 0L, 0, 5, "EMAIL")).toDF("doc_id", "pred_idx", "start", "end", "label")
    val gold = Seq((2L, 0L, 3, 8, "EMAIL")).toDF("doc_id", "gold_idx", "start", "end", "type")
    // doc-scoped: no match -> fp + fn
    val scoped = Evaluator.matchOutcomes(preds, gold).collect().map(_.getString(1)).sorted
    assert(scoped.toSeq == Seq("fn", "fp"))
    // global: matches -> tp only (reference parity)
    val global = Evaluator.matchOutcomesGlobal(preds, gold).collect().map(_.getString(1))
    assert(global.toSeq == Seq("tp"))
    // and the global form agrees with the reference-exact local matcher
    val (tp, fp, fn, _) = Evaluator.greedyMatchLocal(Seq((0, 5, "EMAIL")), Seq((3, 8, "EMAIL")))
    assert((tp, fp, fn) == ((1, 0, 0)))
  }
}
