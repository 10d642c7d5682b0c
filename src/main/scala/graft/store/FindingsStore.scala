package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Findings persistence + export (reference: db.py, cli.py:403-482).
  *
  * The reference's normalized Catalog→Schema→Table→Column→Finding SQLite
  * hierarchy (db.py:43-125) flattens to one findings table: the hierarchy
  * becomes groupBy dimensions; `column_ref` stays denormalized exactly as the
  * reference stores it (db.py:103-107). Sinks: parquet (analytic), JDBC
  * (operational), JSON/CSV export with the reference's fixed 8-column layout
  * and comma-joined types (S13).
  */
object FindingsStore {

  val ExportColumns = Seq("id", "column_ref", "types", "confidence", "hit_rate",
    "model_version", "scanned_at", "source")

  /** Build finding rows from per-(column_ref, label) detection output. */
  def toFindings(detections: DataFrame, modelVersion: String, source: String): DataFrame =
    detections
      .groupBy("column_ref")
      .agg(
        sort_array(collect_set(col("label"))).as("types"),
        round(max(col("score")), 6).as("confidence"),
        round(avg(when(col("label").isNotNull, 1.0).otherwise(0.0)), 6).as("hit_rate"))
      .withColumn("model_version", lit(modelVersion))
      .withColumn("scanned_at", current_timestamp())
      .withColumn("source", lit(source))

  def writeParquet(findings: DataFrame, path: String): Unit =
    findings.write.mode(SaveMode.Append).parquet(path)

  /** CSV export: types joined by "," (cli.py:455-456), stable column order,
    * row id assigned like the autoincrement PK. */
  def exportCsv(findings: DataFrame, path: String): Unit =
    findings
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("column_ref")))
      .withColumn("types", array_join(col("types"), ","))
      .select(ExportColumns.map(col): _*)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON export (pretty array in the reference; JSONL here — the analytic
    * equivalent; cli.py:441-452). */
  def exportJson(findings: DataFrame, path: String): Unit =
    findings
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("column_ref")))
      .select(ExportColumns.map(col): _*)
      .write.mode(SaveMode.Overwrite).json(path)
}
