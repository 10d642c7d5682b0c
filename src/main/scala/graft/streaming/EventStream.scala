package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental scan over the events changelog via Structured Streaming.
  *
  * The reference only *names* watchers ("Poll, EventBridge, HMS Listener",
  * README.md:41) — no streaming code exists (SURVEY §2.10). This module is the
  * Spark-native realization: `readStream` over the events table, watermarked
  * tumbling-window aggregation, and `foreachBatch` for idempotent catalog
  * write-back.
  *
  * Scale notes: state is bounded by the watermark (late data beyond 10 min is
  * dropped); the aggregation is a streaming partial-agg over (window,
  * event_type) — cardinality ≈ windows × types, far below input rate; sink
  * batches arrive pre-aggregated so write-back is driver-cheap.
  */
object EventStream {

  /** Streaming schema mirrors the batch events table, with the driver's
    * TIMESTAMP(NANOS) parquet read as long (nanosAsLong) and normalized. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource takes a directory; select the events file by glob.
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Watermarked tumbling aggregation: count + sum(value cents) per
    * (1-hour window, event_type) — the streaming twin of q10_events_tumbling. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Run the streaming pipeline to completion over the (finite) events dir —
    * the local-smoke form: memory sink + AvailableNow. Returns the running
    * query; read results from `session.table(queryName)`.
    *
    * `statePartitions` sizes the stateful-agg shuffle: state cardinality is
    * windows × event types (thousands), so the session default (one state
    * store per shuffle partition, each with its own checkpoint files) is
    * waste — the override runs in a child session so concurrent batch
    * queries on the parent session are untouched. */
  def runOnce(spark: SparkSession, dir: String, queryName: String = "events_agg",
              statePartitions: Option[Int] = None): StreamingQuery = {
    val session = statePartitions match {
      case Some(n) =>
        val s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", n.toString)
        s
      case None => spark
    }
    tumblingAgg(readEvents(session, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** foreachBatch sink: idempotent parquet append keyed by batch — the
    * write-back pattern for catalog tagging from a stream. */
  def toParquetBatches(agg: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    agg.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
