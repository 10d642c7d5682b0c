package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution upsert for the catalog-column dimension (J4,
  * reference: db.py:157-214 `upsert_column`): get-or-create by the natural
  * key (catalog, schema, table, column); incoming NON-NULL `data_type` /
  * `description` update the stored row, null fields leave it untouched;
  * unseen keys insert.
  *
  * The reference's row-at-a-time SQLAlchemy flush becomes one set-oriented
  * merge: full outer join on the natural key + coalesce per field. Without a
  * table format carrying a transaction log, MERGE is merge-and-swap — read
  * the current store, merge, write to a staging dir, atomically rename over
  * the old data. That is exactly what Delta/Iceberg `MERGE INTO` does with
  * finer granularity (rewrite only matched files); on a real lake swap this
  * implementation for the format's MERGE and keep [[mergeColumns]] as the
  * semantics. The store is a dimension table (one row per catalog column —
  * metadata-scale, not data-scale), so the full rewrite stays cheap even
  * when the scanned data is 100 TB. */
object ColumnStore {

  val Key = Seq("catalog", "schema", "table", "column")
  private val Fields = Seq("data_type", "description")

  /** Set-oriented upsert_column semantics. Incoming rows are deduplicated on
    * the natural key first (last-writer-wins within a batch is meaningless
    * for a set; the max non-null value per field is deterministic). */
  def mergeColumns(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val aggs = Fields.map(f => max(f).as(f))
    val in = incoming
      .groupBy(Key.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val ex = existing.select((Key ++ Fields).map(col): _*)
    ex.as("e").join(in.as("i"), Key, "full_outer")
      .select(Key.map(col) ++ Fields.map(f =>
        coalesce(col(s"i.$f"), col(s"e.$f")).as(f)): _*)
  }

  /** Read-merge-swap against a parquet store path. Creating, re-running with
    * identical input, and null-field inputs are all idempotent. */
  def upsertParquet(spark: SparkSession, path: String, incoming: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val merged =
      if (fs.exists(target)) mergeColumns(spark.read.parquet(path), incoming)
      else mergeColumns(incoming.limit(0), incoming)
    val staging = new Path(path + ".staging")
    // merged still lazily reads `path`; materialize before replacing it
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"atomic swap failed: $staging -> $target")
  }
}
