package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics: replay one streaming gate and dump its per-micro-batch
  * progress (rows, durations) — the decomposition evidence a stress-ratio
  * claim needs (VERDICT r13 #1: s17's 10x number was quoted without one).
  * Usage: runMain graft.cli.DiagStream <s17|s25|s26> [sfDir] */
object DiagStream {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val q = which match {
        case "s17" => graft.streaming.EventStream.runDecontamGate(spark, dir, s"diag_${which}_$round")
        case "s25" => graft.streaming.EventStream.runLshAdmission(
          spark, dir, s"diag_${which}_$round", graft.ops.OpsQueries.stagedBands)
        case other => sys.error(s"unknown gate $other")
      }
      graft.streaming.EventStream.awaitDone(q)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"DIAG $which round$round total=$total%.2fs batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${d.get("triggerExecution")} addBatchMs=${d.get("addBatch")} " +
          s"queryPlanningMs=${d.get("queryPlanning")} getBatchMs=${d.get("getBatch")}")
      }
    }
    spark.stop()
  }
}
