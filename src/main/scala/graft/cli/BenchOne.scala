package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics: time (and optionally explain) a single SparkEntry query.
  * Usage: runMain graft.cli.BenchOne <query> [sfDir] [explain] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    // keepstages: keep SharedStages cached across rounds so rounds 2-3 time
    // ONLY the query's own work on warm shared indexes — the in-suite shape
    // (Bench pays stage builds under their own timers in the stage pass).
    // Default (release) times query + full stage rebuild, which drowns a
    // query-level plan change for stage-heavy queries (kmeans/pq/int8).
    val keepStages = args.contains("keepstages")
    // Same core-count contract as Bench (default 32, the box width): lets
    // the 8-vs-32-core scaling gap be reproduced per query.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // match Bench: data-size-derived partitions (util.BenchConf)
      .config("spark.sql.shuffle.partitions",
        graft.util.BenchConf.shufflePartitions(dir, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // match Bench: sort-based shuffle writer (one file per map task, not
      // one per reduce partition) — see the Bench.scala comment
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      // match Bench: codegen classes must survive across rounds (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, dir).explain("formatted")
    for (round <- 1 to 3) {
      spark.sparkContext.setJobDescription(s"benchone:$name:round$round")
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $name round$round: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      // Release BOTH scopes between rounds: rounds 2-3 must measure a warm
      // JIT recomputing the data, not reads of round 1's persisted blocks
      // (Spark's cache manager matches canonicalized plans, so even a fresh
      // builder call would silently hit the old cache).
      graft.util.PersistScope.releaseAll()
      if (!keepStages) graft.util.SharedStages.releaseAll()
    }
    spark.stop()
  }
}
