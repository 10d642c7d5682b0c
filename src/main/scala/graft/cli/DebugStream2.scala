package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics for the round-7 streaming fixed-cost work: run each s-suite
  * shape twice (cold, warm) and dump per-batch durationMs breakdowns, to
  * locate where the 1.5-2.3 s per query actually goes. */
object DebugStream2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(tag: String)(run: Int => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      for (i <- 0 until 2) {
        val t0 = System.nanoTime()
        val q = run(i)
        q.awaitTermination(300000)
        if (q.isActive) q.stop()
        val dt = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        println(f"== $tag run$i total=$dt%.2fs batches=${prog.length}")
        prog.foreach { p =>
          println(s"   batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}")
          p.stateOperators.foreach { so =>
            println(s"     state: rows=${so.numRowsTotal} commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}")
          }
        }
      }
    }

    var n = 0
    def nm(p: String): String = { n += 1; s"${p}_dbg$n" }

    for (sp <- Seq(2, 4, 8)) {
      timeIt(s"s01_tumbling_sp$sp")(i => graft.streaming.EventStream.runOnce(spark, dir, nm("s01"), statePartitions = Some(sp)))
      timeIt(s"s04_dedup_sp$sp")(i => graft.streaming.EventStream.runDistinctUsers(spark, dir, nm("s04"), statePartitions = Some(sp)))
      timeIt(s"s07_interval_sp$sp")(i => graft.streaming.EventStream.runAttribution(spark, dir, nm("s07"), statePartitions = Some(sp)))
      timeIt(s"s02_sessionize_sp$sp")(i => graft.streaming.EventStream.runSessionize(spark, dir, nm("s02"), statePartitions = Some(sp)))
    }
    spark.stop()
  }
}
