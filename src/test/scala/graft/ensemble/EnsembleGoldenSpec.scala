package graft.ensemble

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.PiiTypes
import graft.functions.pii_candidates

/** Differential parity of the FULL offline prediction pipeline against
  * goldens produced by running the reference's `Ensemble.predict` with
  * CPS_OFFLINE=1 (identity calibrator, neutral embeddings, no NER model) over
  * the 219-text fuzz corpus: per candidate, label, score, and all 11
  * normalized probabilities must agree to 1e-9 (the fusion/sigmoid/normalize
  * math is the same IEEE arithmetic; only libm exp can differ by ulps). */
class EnsembleGoldenSpec extends SparkSpec {

  test("labels, scores, and probs match the reference ensemble (513 predictions)") {
    import spark.implicits._
    val lines = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/golden_predictions.jsonl"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    }
    // cheap JSONL field extraction (flat schema, known key order)
    val textRe = """"text": (".*?(?<!\\)")""".r
    case class GoldPred(start: Int, end: Int, label: String, score: Double, probs: Map[String, Double])
    val predRe = ("""\{"start": (\d+), "end": (\d+), "label": "([A-Z_]+)", "score": ([-0-9.e]+), """ +
      """"probs": \{([^}]*)\}\}""").r
    val pairRe = """"([A-Z_]+)": ([-0-9.e]+)""".r

    var total = 0
    for (line <- lines) {
      val textJson = textRe.findFirstMatchIn(line).get.group(1)
      val text = upickleLiteString(textJson)
      val exp = predRe.findAllMatchIn(line).map { m =>
        GoldPred(m.group(1).toInt, m.group(2).toInt, m.group(3), m.group(4).toDouble,
          pairRe.findAllMatchIn(m.group(5)).map(p => p.group(1) -> p.group(2).toDouble).toMap)
      }.toVector

      val got = PiiEnsemble.withPredictionOffline(
          Seq(text).toDF("text")
            .select(posexplode(pii_candidates(col("text"))).as(Seq("idx", "c"))),
          col("c.rule_label"), col("c.rule_confidence"), col("c.validations"))
        .select(col("idx"), col("c.start"), col("c.end"),
          col("pred.label"), col("pred.score"), col("pred.probs"))
        .collect().sortBy(_.getInt(0))

      assert(got.length == exp.length, s"prediction count for: $text")
      for ((g, e) <- got.zip(exp)) {
        assert(g.getInt(1) == e.start && g.getInt(2) == e.end, s"span in: $text")
        assert(g.getString(3) == e.label, s"label in: $text")
        assert(math.abs(g.getDouble(4) - e.score) < 1e-9, s"score in: $text")
        val probs = PiiTypes.ALL.zip(g.getSeq[Double](5)).toMap
        for (t <- PiiTypes.ALL)
          assert(math.abs(probs(t) - e.probs(t)) < 1e-9, s"prob $t in: $text")
        total += 1
      }
    }
    assert(total == 513)
  }

  /** Unescape a JSON string literal (covers the escapes json.dumps emits). */
  private def upickleLiteString(lit: String): String = {
    val s = lit.substring(1, lit.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'b' => sb += '\b'; case 'f' => sb += '\f'
          case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
          case other => sb += other
        }
      } else sb += c
      i += 1
    }
    sb.toString
  }
}
