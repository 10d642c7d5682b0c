package graft.streaming

import graft.SparkSpec
import graft.queries.QueryDef

/** Structured Streaming over the events table: the streaming tumbling agg
  * must converge to the batch twin (q10_events_tumbling). */
class EventStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling agg over the finite events dir matches batch") {
    val q = EventStream.runOnce(spark, sf, "events_agg_test")
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    val streamed = spark.table("events_agg_test").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.SparkEntry.queries("q10_events_tumbling")(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization stream matches the batch lag-window form") {
    val q = EventStream.runSessionize(spark, sf, "sessions_test", statePartitions = Some(4))
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    val streamed = EventStream.sessionTotals(q.sparkSession, "sessions_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.SparkEntry.queries("q11_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("sessionization is correct across multiple out-of-order micro-batches") {
    // Split the events table into 3 files by event_id % 3 — each file holds a
    // time-interleaved slice, so with maxFilesPerTrigger=1 every micro-batch
    // delivers events out of order relative to previous batches. The
    // interval-merge state must still converge to the batch oracle.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("stream_multibatch").toString
    val raw = spark.read.parquet(s"$sf/events.parquet") // ts stays raw nanos-long
    for (i <- 0 until 3) {
      val sub = s"$tmp/split_$i"
      raw.filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.lit(3)) === i)
        .coalesce(1).write.parquet(sub)
      val part = new java.io.File(sub).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$tmp/events_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val q = EventStream.runSessionize(spark, tmp, "sessions_multibatch",
      statePartitions = Some(4), glob = "events_*.parquet", maxFilesPerTrigger = Some(1))
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected multiple data micro-batches")
    val streamed = EventStream.sessionTotals(q.sparkSession, "sessions_multibatch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.SparkEntry.queries("q11_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("foreachBatch parquet sink writes the aggregate") {
    val tmp = java.nio.file.Files.createTempDirectory("stream").toString
    val q = EventStream.toParquetBatches(
      EventStream.tumblingAgg(EventStream.readEvents(spark, sf)),
      s"$tmp/out", s"$tmp/ckpt")
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() > 0)
    assert(out.columns.contains("batch_id"))
  }
}
