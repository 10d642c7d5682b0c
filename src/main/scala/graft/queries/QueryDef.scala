package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation over a testdata dir plus an
  * optional DuckDB oracle over the same parquet tables (bare table names). */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Read one testdata table. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table with its TIMESTAMP(NANOS) column normalized to a Spark
    * timestamp (micros). Requires spark.sql.legacy.parquet.nanosAsLong=true
    * (set by Verify/Bench/GraftSession): Spark has no nanos timestamp type,
    * so the column arrives as a long and is floor-divided to micros — exact
    * integer arithmetic, matching DuckDB's native TIMESTAMP_NS reads at
    * micro/second granularity. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
}
