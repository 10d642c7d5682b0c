package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.{shims => ExpressionUtils}

import graft.detect._

/** Column-level entry points for the engine's custom expressions, mirroring
  * `org.apache.spark.sql.functions`. Also registers SQL names so the same
  * operators are reachable from `spark.sql(...)`. */
object functions {
  private def col1(f: org.apache.spark.sql.catalyst.expressions.Expression =>
      org.apache.spark.sql.catalyst.expressions.Expression)(c: Column): Column =
    ExpressionUtils.column(f(ExpressionUtils.expression(c)))

  /** Full rule-layer candidate pipeline: array of candidates in reference
    * detector order. */
  def pii_candidates(text: Column): Column = col1(PiiCandidatesExpr)(text)

  /** Generator form: one (candidate_idx, c) row per candidate — use instead
    * of `posexplode(pii_candidates(text))` when the array itself isn't
    * needed (see [[graft.detect.PiiCandidatesGenerator]]). */
  def pii_candidates_rows(text: Column): Column = col1(PiiCandidatesGenerator)(text)

  /** Offline NER provider spans (EMAIL/PHONE regex fallback). */
  def ner_spans(text: Column): Column = col1(NerSpansExpr)(text)

  /** Shape-preserving mask. */
  def mask_token(s: Column): Column = col1(MaskTokenExpr)(s)

  /** Redact candidate spans out of the text (length-preserving). */
  def redact_spans(text: Column, spans: Column): Column =
    ExpressionUtils.column(
      RedactSpansExpr(ExpressionUtils.expression(text), ExpressionUtils.expression(spans)))

  def luhn(s: Column): Column = col1(LuhnExpr)(s)
  def verhoeff(s: Column): Column = col1(VerhoeffExpr)(s)

  /** Unicode NFC normalization (canonical composition). */
  def nfc_normalize(s: Column): Column =
    graft.ops.NfcNormalizeExpr.nfc_normalize(s)

  /** Control characters to strip during cleaning: the Cc block MINUS the
    * whitespace controls \t \n \r, which must survive to the whitespace
    * pass so "line1\nline2" collapses to "line1 line2" instead of
    * concatenating. Written as an explicit range class (not
    * `[\p{Cc}&&[^\t\n\r]]`) because DuckDB's RE2 has no class
    * intersection — this exact class runs verbatim in both engines.
    * NOTE: \x0B (VT) and \x0C (FF) stay in the STRIP set even though Java
    * counts them as `\s`: RE2's `\s` is `[\t\n\f\r ]` (no VT), so leaving
    * VT for the collapse pass would diverge between engines. */
  val ControlStripClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  /** Full corpus text cleaning: NFC normalize, strip non-whitespace control
    * characters, collapse whitespace runs to single spaces, trim. Mirrors
    * the DuckDB chain `trim(regexp_replace(regexp_replace(nfc_normalize(s),
    * '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g'), '\s+', ' ', 'g'))`
    * exactly — step order matters (NFC first: composition never produces
    * controls or whitespace; strip keeps \t\n\r so line breaks become word
    * separators, not concatenations). */
  def clean_text(s: Column): Column = {
    import org.apache.spark.sql.functions.{regexp_replace, trim}
    trim(regexp_replace(regexp_replace(nfc_normalize(s), ControlStripClass, ""), "\\s+", " "))
  }

  /** MinHash signature from a pre-shingled array. */
  def minhash_sig(shingles: Column, k: Int): Column =
    graft.ops.MinHashSigExpr.minhash_sig(shingles, k)

  /** MinHash signature with word n-gram shingles fused into the digest loop. */
  def minhash_from_tokens(tokens: Column, k: Int, shingleLen: Int = 3): Column =
    graft.ops.MinHashFromTokensExpr.minhash_from_tokens(tokens, k, shingleLen)

  /** 32-bit SimHash fingerprint of a token array. */
  def simhash32(tokens: Column): Column = graft.ops.SimHash32Expr.simhash32(tokens)

  /** Hamming distance between two bit strings. */
  def hamming_bits(a: Column, b: Column): Column =
    graft.ops.HammingBitsExpr.hamming_bits(a, b)

  /** Random-hyperplane LSH bucket (sign-bit string). */
  def lsh_bucket(vec: Column, planes: Int = 8, dims: Int = 64): Column =
    graft.ops.LshBucketExpr.lsh_bucket(vec, planes, dims)

  /** One-pass cosine similarity of two numeric arrays. */
  def cosine_sim(a: Column, b: Column): Column =
    graft.ops.CosineSimExpr.cosine_sim(a, b)

  /** Exact int64 squared distance of two int-code arrays (one-loop kernel). */
  def int8_dist2(a: Column, b: Column): Column =
    graft.ops.Int8Dist2Expr.int8_dist2(a, b)

  /** Exact int64 dot product of two int-code arrays (one-loop kernel). */
  def int8_dot(a: Column, b: Column): Column =
    graft.ops.Int8DotExpr.int8_dot(a, b)

  /** Register all custom functions for SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("pii_candidates", es => PiiCandidatesExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("ner_spans", es => NerSpansExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("mask_token", es => MaskTokenExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("redact_spans", es => RedactSpansExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("luhn", es => LuhnExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("verhoeff", es => VerhoeffExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig", es =>
      graft.ops.MinHashSigExpr(es.head, es(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_from_tokens", es =>
      graft.ops.MinHashFromTokensExpr(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        if (es.size > 2) es(2).eval().asInstanceOf[Number].intValue() else 3), "scala_udf")
    reg.createOrReplaceTempFunction("simhash32", es => graft.ops.SimHash32Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_bits", es =>
      graft.ops.HammingBitsExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_bucket", es =>
      graft.ops.LshBucketExpr(es.head,
        if (es.size > 1) es(1).eval().asInstanceOf[Number].intValue() else 8,
        if (es.size > 2) es(2).eval().asInstanceOf[Number].intValue() else 64), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es =>
      graft.ops.CosineSimExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("int8_dist2", es =>
      graft.ops.Int8Dist2Expr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("int8_dot", es =>
      graft.ops.Int8DotExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", es =>
      graft.ops.NfcNormalizeExpr(es.head), "scala_udf")
    // generator: SELECT pii_candidates_rows(text) or LATERAL VIEW
    reg.createOrReplaceTempFunction("pii_candidates_rows", es =>
      PiiCandidatesGenerator(es.head), "scala_udf")
    // aggregate: the analyzer wraps the bare AggregateFunction
    reg.createOrReplaceTempFunction("topk_min", es =>
      graft.ops.TopKMinExpr(es.head,
        es(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_fps", es =>
      graft.ops.RollingFpExpr(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }
}
