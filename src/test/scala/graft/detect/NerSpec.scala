package graft.detect

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.PiiTypes

/** Provider contract tests mirroring tests/test_ner.py:22-65 (fake provider
  * injection, threshold gating, max-merge arithmetic). */
class NerSpec extends SparkSpec {

  /** Fake provider like the reference tests inject. */
  object FakeProvider extends NerProvider {
    override def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]] =
      texts.map { t =>
        Seq(
          NerSpan(0, 4, t.take(4), PiiTypes.PERSON, 0.95),
          NerSpan(5, 9, "weak", PiiTypes.PERSON, 0.30)) // below the 0.60 gate
      }
  }

  test("confidence gate filters provider spans (ner.py:195-199)") {
    import spark.implicits._
    val df = Seq((1L, "John says hello")).toDF("id", "text")
    val got = Ner.detectNerSpans(df, "id", "text", FakeProvider).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(5) == 0.95)
  }

  test("model-backed provider runs end-to-end: one session per JVM, batched") {
    import spark.implicits._
    // More rows than the batch size across several partitions: proves the
    // grouped-batch path and the executor-wide lazy session sharing.
    val rows = (0L until 100L).map(i =>
      (i, if (i % 3 == 0) s"Contact Dr. Smith$i at desk $i" else s"row $i has no names"))
    val df = rows.toDF("id", "text").repartition(8)
    val got = Ner.detectNerSpans(df, "id", "text", new ModelNerProvider(batchSize = 16))
      .collect()
    assert(got.length == rows.count(_._2.contains("Dr.")))
    val r = got.minBy(_.getLong(0))
    // score is the model's sigmoid output (σ(5+5−8.265399) ≈ 0.85), not a
    // hardcoded constant — a real inference ran
    assert(r.getString(4) == PiiTypes.PERSON && math.abs(r.getDouble(5) - 0.85) < 1e-5)
    // offsets point at the capitalized name, not the honorific
    val sample = rows.find(_._1 == r.getLong(0)).get._2
    assert(sample.substring(r.getInt(1), r.getInt(2)) == r.getString(3))
    assert(ModelNerProvider.initCount == 1,
      s"expected one shared session per JVM, got ${ModelNerProvider.initCount}")
    // ONNX-shaped runtime assertions: ONE OrtEnvironment in the JVM, real
    // forward passes through the session, every tensor batch bounded by
    // the provider's batchSize
    assert(graft.ml.OnnxLike.OrtEnvironment.envCount == 1)
    val ort = ModelNerProvider.sessionForSpec.get.ort
    assert(ort.runCount >= 7, // 100 rows / 8 partitions / batch 16 => >=8 chunks
      s"expected one forward pass per chunk, got ${ort.runCount}")
    assert(ort.maxBatch <= 16, s"tensor batch dim ${ort.maxBatch} exceeds batchSize")
    // providerFor honors the offline gate (ner.py:128-139)
    assert(Ner.providerFor("model", offline = true) == OfflineProvider)
    assert(Ner.providerFor("model", offline = false).isInstanceOf[ModelNerProvider])
  }

  test("partition streams in bounded groups — never fully materialized") {
    import spark.implicits._
    // Provider that reports how many texts it was handed at once (it fully
    // drains its iterator, so the count is the chunk the engine built).
    object ChunkSizeProvider extends NerProvider {
      override def analyzeBatch(texts: Iterator[String]): Iterator[Seq[NerSpan]] = {
        val v = texts.toVector
        v.iterator.map(_ => Seq(NerSpan(v.size, v.size + 1, "n", PiiTypes.PERSON, 0.9)))
      }
    }
    val df = (0L until 100L).map(i => (i, s"text $i")).toDF("id", "text").coalesce(1)
    val starts = Ner.detectNerSpans(df, "id", "text", ChunkSizeProvider, groupRows = 8)
      .collect().map(_.getInt(1))
    assert(starts.length == 100)
    assert(starts.max <= 8, s"a chunk of ${starts.max} rows was materialized (cap 8)")
  }

  test("offline provider emits EMAIL 0.99 / PHONE 0.90 via regex (ner.py:61-81)") {
    import spark.implicits._
    val df = Seq((7L, "mail a@b.co or (415) 555-1212 now")).toDF("id", "text")
    val got = Ner.detectNerSpans(df, "id", "text").collect()
      .map(r => (r.getString(4), r.getDouble(5))).toSet
    assert(got == Set((PiiTypes.EMAIL, 0.99), (PiiTypes.PHONE_NUMBER, 0.90)))
  }

  test("empty provider yields nothing (offline Presidio parity)") {
    import spark.implicits._
    val df = Seq((1L, "mail a@b.co")).toDF("id", "text")
    assert(Ner.detectNerSpans(df, "id", "text", EmptyProvider).count() == 0)
  }

  test("max-merge with rules takes the per-type maximum (ner.py:202-228)") {
    import spark.implicits._
    val ner = Seq((1L, 0, 7, "a@b.com", PiiTypes.EMAIL, 0.99))
      .toDF("id", "start", "end", "value", "label", "score")
    val rules = Seq((1L, PiiTypes.EMAIL, 0.95), (1L, PiiTypes.SSN, 0.9))
      .toDF("id", "rule_label", "rule_confidence")
    val merged = Ner.mergeWithRules(ner, rules, "id").collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(merged(PiiTypes.EMAIL) == 0.99) // NER wins over the 0.95 rule prior
    assert(merged(PiiTypes.SSN) == 0.9)    // rules-only type passes through
  }
}
