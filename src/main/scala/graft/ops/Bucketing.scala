package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling both sides of a recurring join key
  * into the same bucket layout removes the per-query shuffle entirely — the
  * join planner sees compatible hash-distributions and plans a zero-Exchange
  * sort-merge. This is the 100 TB answer for fact-to-fact joins repeated
  * across a workload (broadcast covers dims; AQE covers one-offs).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Number of shuffle exchanges in the executed plan of `df` — 0 for a
    * correctly co-bucketed join. */
  def countShuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
