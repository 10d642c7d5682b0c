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

  /** Tables whose scans feed compute-heavy per-row pipelines (regex
    * detection, minhash/simhash, cosine kernels) — there the single-row-group
    * scan serializes seconds of CPU and a tiny shuffle unlocks every core.
    * Scan-dominated tables (lineitem/orders/events aggregates) are NOT
    * rebalanced: their per-row work is trivial, so an extra exchange only
    * adds a stage. Dimension tables stay put — they get broadcast. */
  private val RebalancedTables = Set("customer", "documents", "embeddings")

  /** Read one testdata table.
    *
    * Scan-parallelism note: every testdata parquet file is a SINGLE row
    * group, and Spark assigns a row group to exactly one scan partition —
    * so a plain scan of even the 600k-row lineitem runs on one core and
    * serializes the whole downstream pipeline. A production lake yields
    * thousands of row groups/files and never hits this; locally we restore
    * the parallelism that layout would give with one explicit round-robin
    * repartition (AQE does not re-coalesce user-specified repartitioning).
    * Shuffling these MB-scale tables costs ms; the single-core pipeline it
    * replaces costs seconds.
    *
    * The rebalance is gated on `graft.scan.rebalance` (default true for the
    * local single-row-group layout). On a real lake — where scans already
    * yield one partition per file/row-group — set it to false so no query
    * pays a full shuffle of these tables just to read them. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    val rebalance = spark.conf.getOption("graft.scan.rebalance") match {
      case None => true
      case Some(v) => v.trim.toLowerCase match {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"graft.scan.rebalance must be 'true' or 'false', got '$other'")
      }
    }
    if (rebalance && RebalancedTables.contains(name) && target > 1) df.repartition(target)
    else df
  }

  /** Normalize an events `ts` column to a Spark TIMESTAMP, adapting to how
    * the parquet writer encoded it — the physical type of the driver-supplied
    * testdata has changed across rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)),
    * and hard-coding one encoding silently breaks when the data regenerates:
    *
    *  - LONG: a TIMESTAMP(NANOS) column surfaced as nanos-as-long via
    *    spark.sql.legacy.parquet.nanosAsLong=true (Spark has no nanos type).
    *    Floor-divide to micros — exact integer arithmetic, matching DuckDB's
    *    native TIMESTAMP_NS reads at micro/second granularity.
    *  - TIMESTAMP_NTZ: a TIMESTAMP(MICROS, isAdjustedToUTC=false) column.
    *    Cast to TIMESTAMP: with the session TZ pinned UTC (Verify/Bench/specs
    *    all set it) the wall-clock value is preserved and epoch()/date_trunc
    *    match DuckDB's naive-timestamp reads of the same file.
    *  - TIMESTAMP: already normalized; pass through. */
  def normalizedTs(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType => col("ts")
      case other => throw new IllegalArgumentException(
        s"events.ts: expected LONG (nanos-as-long), TIMESTAMP_NTZ or TIMESTAMP, got $other")
    }
  }

  /** The events table with its `ts` column normalized to a Spark timestamp
    * regardless of the parquet encoding (see [[normalizedTs]]). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "events")
    df.withColumn("ts", normalizedTs(df.schema("ts").dataType))
  }
}
