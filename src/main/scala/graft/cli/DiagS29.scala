package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics: the s29 gate's stored-side A/B (r15 verdict #1) in ONE
  * JVM/window — fresh in-session label derivation vs the persisted
  * [[graft.ops.Dedup.substringLabelArtifact]]. Prints per-round times for
  * both forms plus the one-time artifact build cost, so the pairing's
  * claim ("the gate's cost was dominated by the per-invocation stored-side
  * rebuild") is measured, not inferred.
  * Usage: runMain graft.cli.DiagS29 [sfDir] */
object DiagS29 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gate(tag: String, path: Option[String]): Unit = {
      val name = s"diag_s29_${tag}_${System.nanoTime}"
      val q = graft.streaming.EventStream.runSubstringGate(spark, dir, name,
        storedLabelsPath = path)
      graft.streaming.EventStream.awaitDone(q)
      // The suite's read-back fold, so both forms time the full query shape.
      import org.apache.spark.sql.functions._
      q.sparkSession.table(name)
        .groupBy("doc_id")
        .agg(max(col("n_windows")).as("n_windows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit_classes"))
        .write.format("noop").mode("overwrite").save()
    }
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIME $label: $s%.2fs")
      graft.util.PersistScope.releaseAll()
      s
    }
    timed("jvm_warm_fresh_round0")(gate("w", None)) // JIT/codegen warmup
    val tBuild = timed("artifact_build") {
      graft.ops.Dedup.substringLabelArtifact(spark, dir)
    }
    val art = graft.ops.Dedup.substringLabelArtifact(spark, dir)
    for (r <- 1 to 3) timed(s"fresh_round$r")(gate("f", None))
    for (r <- 1 to 3) timed(s"stored_round$r")(gate("s", Some(art)))
    println(f"artifact one-time build: $tBuild%.2fs (amortized across gate starts)")
    spark.stop()
  }
}
