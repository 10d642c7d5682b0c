package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics: time one query with ALL cross-query shared stages built and
  * PINNED (the full-suite warm-pass memory state) vs the clean-JVM number
  * BenchOne gives — isolates "the plan is slow" from "the suite's pinned
  * storage is starving it" (r14: s17 read 82 s in-suite at 10x vs 6 s
  * isolated, with the spin probe flat — box load ruled out).
  * Usage: runMain graft.cli.DiagPinned <query> [sfDir] */
object DiagPinned {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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
    val stages = graft.ops.OpsQueries.stageBuilders ++
      graft.ops.ClusterQueries.stageBuilders ++ graft.ops.PqQueries.stageBuilders
    stages.foreach { case (n, b) =>
      val t0 = System.nanoTime()
      b(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"STAGE $n: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val fn = graft.SparkEntry.queries(name)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME(pinned) $name round$round: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.util.PersistScope.releaseAll()
      System.gc()
    }
    spark.stop()
  }
}
