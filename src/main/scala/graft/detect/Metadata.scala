package graft.detect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed metadata keyword heuristics (rules.py:213-241).
  *
  * The reference nest-loops every (field, value) pair against every
  * (type, keyword-tuple); Spark-first this is a broadcast nested-loop join of
  * the metadata frame against the tiny keyword table, followed by a window
  * picking the FIRST keyword (tuple order, not text position) per
  * (row, field, type) — the `break` in rules.py:236-240.
  *
  * At 100 TB of catalog metadata this stays shuffle-light: the keyword table
  * broadcasts (<1 KB) and the only wide operation is the per-(doc,field,type)
  * window, whose key cardinality is bounded by rows × 11 types.
  */
object Metadata {

  /** Default keyword table as a DataFrame (label, type_rank, kw, kw_rank). */
  def keywordTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Rules.KEYWORDS.zipWithIndex.flatMap { case ((t, kws), tr) =>
      kws.zipWithIndex.map { case (k, kr) => (t, tr, k, kr) }
    }.toDF("label", "type_rank", "kw", "kw_rank")
  }

  /** @param meta columns (doc_id, field, value)
    * @param kw   broadcastable keyword table (label, type_rank, kw, kw_rank)
    * @return (doc_id, field, rule_label, start, value, rule_confidence) */
  def keywordCandidates(meta: DataFrame, kw: DataFrame): DataFrame = {
    val joined = meta
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .join(broadcast(kw), instr(lower(col("value")), col("kw")) > 0)
      .withColumn("start", instr(lower(col("value")), col("kw")) - 1)
    val w = Window.partitionBy("doc_id", "field", "label").orderBy("kw_rank")
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("field"), col("label").as("rule_label"),
        col("start").cast("int").as("start"),
        expr("substring(value, start + 1, length(kw))").as("value"),
        lit(0.6).as("rule_confidence"))
  }
}
