package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage backend for the entity-resolution upsert (J4, db.py:157-214):
  * one implementation per place a column-dimension store can live. The
  * SEMANTICS are fixed by [[ColumnStore.mergeColumns]] — get-or-create on
  * the natural key, non-null incoming fields win, within-batch duplicates
  * collapse deterministically first — and each backend is only a transport
  * for them. */
trait MergeBackend {
  def upsert(spark: SparkSession, incoming: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
}

/** The container-native backend: [[ColumnStore.upsertParquet]]'s
  * merge-and-swap with crash recovery and snapshot-isolated readers. */
final case class ParquetSwapBackend(path: String) extends MergeBackend {
  override def upsert(spark: SparkSession, incoming: DataFrame): Unit =
    ColumnStore.upsertParquet(spark, path, incoming)
  override def read(spark: SparkSession): DataFrame =
    ColumnStore.readStore(spark, path)
}

/** Lake-format backend: the same upsert as ONE transactional `MERGE INTO`
  * against a table whose catalog supports row-level operations (Delta,
  * Iceberg — their MERGE syntax is this ANSI form verbatim).
  *
  * This container ships no table-format jar, so the statement cannot
  * commit here; what IS pinned in-environment:
  *
  *  - the generated SQL (golden-tested) encodes mergeColumns exactly:
  *    the source is the within-batch dedup (max per field over the key
  *    group), matched rows UPDATE each field to
  *    `coalesce(source.f, target.f)` (non-null incoming wins, null leaves
  *    the stored value), unmatched keys INSERT;
  *  - Spark's parser accepts the statement (the spec drives it to the
  *    analyzer and asserts the failure is the missing row-level-operation
  *    CAPABILITY of the plain-parquet table, never a syntax error), so
  *    with a format jar on the classpath the identical call commits.
  *
  * Readers need no swap/retry machinery — snapshot isolation is the
  * format's transaction log, which is the whole point of swapping this in
  * over [[ParquetSwapBackend]] on a real lake. */
final case class LakeMergeBackend(table: String) extends MergeBackend {

  /** The MERGE statement against a source view of the deduplicated batch. */
  def mergeSql(sourceView: String): String = {
    val onClause = ColumnStore.Key
      .map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
    val setClause = ColumnStore.MergedFields
      .map(f => s"t.`$f` = coalesce(s.`$f`, t.`$f`)").mkString(", ")
    val cols = (ColumnStore.Key ++ ColumnStore.MergedFields)
    s"""MERGE INTO $table t
       |USING $sourceView s
       |ON $onClause
       |WHEN MATCHED THEN UPDATE SET $setClause
       |WHEN NOT MATCHED THEN INSERT (${cols.map(c => s"`$c`").mkString(", ")})
       |VALUES (${cols.map(c => s"s.`$c`").mkString(", ")})""".stripMargin
  }

  override def upsert(spark: SparkSession, incoming: DataFrame): Unit = {
    // same within-batch dedup as mergeColumns: max non-null per field —
    // MERGE requires a source with at most one match per target row
    val aggs = ColumnStore.MergedFields.map(f => max(f).as(f))
    val view = "__merge_src_" + java.util.UUID.randomUUID().toString.replace("-", "")
    incoming.groupBy(ColumnStore.Key.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .createOrReplaceTempView(view)
    try { spark.sql(mergeSql(view)); () }
    finally { spark.catalog.dropTempView(view); () }
  }

  override def read(spark: SparkSession): DataFrame = spark.table(table)
}
