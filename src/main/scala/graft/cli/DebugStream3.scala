package graft.cli

import org.apache.spark.sql.SparkSession

/** Phase-level timing for the s02 shape: stream replay vs sink read-back vs
  * noop write, to explain the Bench-vs-DebugStream2 gap. */
object DebugStream3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (i <- 0 until 3) {
      val name = s"s02_dbg$i"
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStream.runSessionize(spark, dir, name, statePartitions = Some(4))
      q.awaitTermination(300000)
      if (q.isActive) q.stop()
      val t1 = System.nanoTime()
      val sink = q.sparkSession.table(name)
      val nRows = sink.count()
      val t2a = System.nanoTime()
      val totals = graft.streaming.EventStream.sessionTotals(q.sparkSession, name)
      totals.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      // re-run the identical totals plan to split compile-vs-execute
      graft.streaming.EventStream.sessionTotals(q.sparkSession, name)
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"== run$i stream=${(t1 - t0) / 1e9}%.2fs sinkCount($nRows)=${(t2a - t1) / 1e9}%.2fs " +
        f"totals1=${(t2 - t2a) / 1e9}%.2fs totals2=${(t3 - t2) / 1e9}%.2fs")
      q.recentProgress.foreach(p => println(s"   batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}"))
    }
    spark.stop()
  }
}
