package graft.detect

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.PiiTypes

/** NER provider contract (reference: ner.py:47-199).
  *
  * A provider turns a batch of texts into labeled spans; the engine applies
  * the confidence gate and the per-type max-merge with the rules layer.
  * Model-backed providers (spaCy, Presidio) plug in as `mapPartitions`
  * batches — one model instance per partition, iterator-in/iterator-out (the
  * Spark analogue of `nlp.pipe`); this container ships none, so the default
  * is the deterministic offline provider (EMAIL 0.99 / PHONE 0.90 regex,
  * ner.py:61-81 — the path the reference's CI asserts).
  */
case class NerSpan(start: Int, end: Int, value: String, label: String, score: Double)

trait NerProvider extends Serializable {
  def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]]
}

/** Offline fallback provider (ner.py:61-81). */
object OfflineProvider extends NerProvider {
  override def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]] =
    texts.map { t =>
      Rules.findRegex(t, Rules.EMAIL_RE).map(s =>
        NerSpan(s.start, s.end, s.text, PiiTypes.EMAIL, 0.99)) ++
      Rules.findRegex(t, Rules.PHONE_US_RE).map(s =>
        NerSpan(s.start, s.end, s.text, PiiTypes.PHONE_NUMBER, 0.90))
    }
}

/** Model-less Presidio stand-in: empty results (ner.py:137-139 offline). */
object EmptyProvider extends NerProvider {
  override def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]] =
    texts.map(_ => Seq.empty)
}

object Ner {

  /** detect_ner_spans (ner.py:170-199): run the provider per partition and
    * apply the global confidence gate (default 0.60, config.py:17).
    * Input (id, text) frame; output (id, start, end, value, label, score). */
  def detectNerSpans(df: DataFrame, idCol: String, textCol: String,
                     provider: NerProvider = OfflineProvider,
                     confidenceMin: Double = 0.60): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    typed.mapPartitions { it =>
      val (ids, texts) = it.toVector.unzip
      ids.iterator.zip(provider.analyzeBatch(texts.iterator))
        .flatMap { case (id, spans) => spans.map(s => (id, s.start, s.end, s.value, s.label, s.score)) }
    }.toDF(idCol, "start", "end", "value", "label", "score")
      .filter(col("score") >= confidenceMin)
  }

  /** merge_with_rules (ner.py:202-228, A1): per (id, type), max of gated NER
    * scores and rule confidences. */
  def mergeWithRules(nerSpans: DataFrame, ruleCandidates: DataFrame, idCol: String): DataFrame =
    nerSpans.select(col(idCol), col("label"), col("score"))
      .unionByName(ruleCandidates.select(col(idCol), col("rule_label").as("label"),
        col("rule_confidence").as("score")))
      .groupBy(idCol, "label").agg(max("score").as("score"))
}
