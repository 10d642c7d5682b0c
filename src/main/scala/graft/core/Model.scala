package graft.core

/** Character-offset span into a source string.
  * Reference: src/catalog_pii_scanner/pii_types.py:37-41. */
case class Span(start: Int, end: Int, text: String)

/** A rule-layer detection candidate.
  * Reference: pii_types.py:44-52. `validations` carries per-type checksum
  * flags (Luhn for CREDIT_CARD, Verhoeff for AADHAAR). */
case class Candidate(
    start: Int,
    end: Int,
    value: String,
    ruleLabel: String,
    ruleConfidence: Double,
    validations: Map[String, Boolean] = Map.empty)

/** Ensemble output for one candidate. Reference: pii_types.py:55-64. */
case class Prediction(
    start: Int,
    end: Int,
    value: String,
    probs: Map[String, Double],
    label: String,
    score: Double)

/** One row of a labeled (golden) dataset. Reference: datasets.py:11-14. */
case class GoldLabel(start: Int, end: Int, `type`: String, text: String)
case class LabeledExample(text: String, labels: Seq[GoldLabel])

/** Unified catalog column across Glue/Unity/HMS connector flavors.
  * Reference: connectors/glue.py:54-65, unity.py:15-27, hms.py:17-28. */
case class CatalogColumn(
    source: String,          // "glue" | "unity" | "hms"
    catalog: String,         // unity catalog name, else ""
    schema: String,          // database / schema
    table: String,
    column: String,
    dataType: String,
    comment: String,
    properties: Map[String, String]) {
  /** URI-style ref, e.g. glue://db/tbl/col (glue.py:63-65). */
  def ref: String = source match {
    case "unity" => s"unity://$catalog/$schema/$table/$column"
    case s       => s"$s://$schema/$table/$column"
  }
}

/** A persisted finding. Reference: db.py:110-125. */
case class Finding(
    columnRef: String,
    types: Seq[String],
    confidence: Double,
    hitRate: Double,
    modelVersion: String,
    scannedAt: java.sql.Timestamp,
    source: String)
