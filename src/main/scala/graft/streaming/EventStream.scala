package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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

  /** Streaming sessionization with CUSTOM state (flatMapGroupsWithState):
    * per-user session/event counting with a `gapSeconds` inactivity split —
    * the stateful-stream twin of the batch q11 lag-window form.
    *
    * State per user = (last event second, session count, event count). Each
    * micro-batch sorts its user's new events by (second, event_id) — the same
    * order the batch window uses — folds them into the state, and emits the
    * running totals (Update mode). State is one tuple per user: bounded by
    * user cardinality, not event volume. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), unix_timestamp(col("ts")).as("sec"),
      col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[(Long, Long, Long)]) =>
          val evs = rows.map(r => (r._2, r._3)).toVector.sorted
          if (evs.isEmpty) Iterator.empty
          else {
            var (last, nSess, nEv) = state.getOption.getOrElse((Long.MinValue, 1L, 0L))
            for ((sec, _) <- evs) {
              if (last != Long.MinValue && sec - last > gapSeconds) nSess += 1
              last = sec; nEv += 1
            }
            state.update((last, nSess, nEv))
            Iterator((user, nSess, nEv))
          }
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Run the sessionization stream to completion over the (finite) events
    * dir: memory sink (update mode), AvailableNow. See [[runOnce]] for the
    * statePartitions rationale. */
  def runSessionize(spark: SparkSession, dir: String, queryName: String = "events_sessions",
                    statePartitions: Option[Int] = None): StreamingQuery = {
    val session = statePartitions match {
      case Some(n) =>
        val s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", n.toString)
        s
      case None => spark
    }
    sessionize(readEvents(session, dir))
      .writeStream.outputMode("update")
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
