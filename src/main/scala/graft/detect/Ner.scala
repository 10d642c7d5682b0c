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

/** Model-backed provider skeleton — the M4 spaCy/ONNX runtime slot,
  * exercising the real `mapPartitions` model plumbing end-to-end:
  *
  *  - the session is created LAZILY, ONCE PER EXECUTOR JVM (the expensive
  *    part of a real ONNX Runtime / JNI model load) and shared across that
  *    executor's partitions — the `@transient lazy val` survives closure
  *    serialization as a marker, re-initializing remotely on first use;
  *  - texts run through the session in fixed-size batches (the `nlp.pipe`
  *    shape, ner.py:104-117) rather than row-at-a-time.
  *
  * The container ships no NLP runtime, so [[ModelNerProvider.ToySession]]
  * is a deterministic JVM stand-in (honorific + capitalized-word PERSON
  * tagger); swapping it for an ONNX `InferenceSession` changes nothing on
  * the Spark side. */
class ModelNerProvider(batchSize: Int = 32) extends NerProvider {
  @transient private lazy val session = ModelNerProvider.acquireSession()
  override def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]] =
    texts.grouped(batchSize).flatMap(session.run)
}

object ModelNerProvider {
  /** The model runtime boundary: batch of texts in, spans per text out. */
  trait Session { def run(batch: Seq[String]): Seq[Seq[NerSpan]] }

  @volatile private var inits = 0
  /** Sessions created in this JVM — the plumbing spec asserts exactly 1. */
  def initCount: Int = inits

  private lazy val shared: Session = synchronized { inits += 1; new ToySession }
  def acquireSession(): Session = shared

  /** Deterministic toy model: a capitalized word directly following an
    * honorific (Mr/Ms/Mrs/Dr, with or without '.') is a PERSON at 0.85. */
  class ToySession extends Session {
    private val re = java.util.regex.Pattern.compile(
      """\b(?:Mr|Ms|Mrs|Dr)\.?\s+([A-Z][a-z]+)""")
    override def run(batch: Seq[String]): Seq[Seq[NerSpan]] =
      batch.map { t =>
        val m = re.matcher(t)
        val out = Seq.newBuilder[NerSpan]
        while (m.find())
          out += NerSpan(m.start(1), m.end(1), m.group(1), graft.core.PiiTypes.PERSON, 0.85)
        out.result()
      }
  }
}

object Ner {

  /** Provider selection mirroring the reference's offline gate
    * (ner.py:128-139): CPS_OFFLINE forces the deterministic fallback, the
    * CI-asserted path; otherwise the configured model-backed provider. */
  def providerFor(provider: String, offline: Boolean): NerProvider =
    if (offline) OfflineProvider
    else provider match {
      case "model" | "onnx" => new ModelNerProvider()
      case "presidio" => EmptyProvider // runtime absent; empty-offline parity
      case _ => OfflineProvider
    }

  /** detect_ner_spans (ner.py:170-199): run the provider per partition and
    * apply the global confidence gate (default 0.60, config.py:17).
    * Input (id, text) frame; output (id, start, end, value, label, score).
    *
    * Iterator-in/iterator-out: only `groupRows` (id, text) pairs are
    * resident at once, so a partition of long documents never fully
    * materializes in executor memory. The provider's own model batch size
    * (e.g. [[ModelNerProvider]]'s 32) still applies within each group. */
  def detectNerSpans(df: DataFrame, idCol: String, textCol: String,
                     provider: NerProvider = OfflineProvider,
                     confidenceMin: Double = 0.60,
                     groupRows: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    typed.mapPartitions { it =>
      it.grouped(groupRows).flatMap { chunk =>
        chunk.iterator.map(_._1).zip(provider.analyzeBatch(chunk.iterator.map(_._2)))
          .flatMap { case (id, spans) => spans.map(s => (id, s.start, s.end, s.value, s.label, s.score)) }
      }
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
