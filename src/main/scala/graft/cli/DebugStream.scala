package graft.cli

import org.apache.spark.sql.SparkSession

/** Diagnostics: time the s01 streaming query phase by phase and dump
  * per-batch progress JSON, to locate the fixed overhead. */
object DebugStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants = Seq(
      ("default", Map[String, String]()),
      ("sp8", Map("spark.sql.shuffle.partitions" -> "8")),
      ("sp8_nodata_off", Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")),
      ("sp4_nodata_off", Map("spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")))
    for (((name, confs), round) <- variants.zipWithIndex) {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStream.runOnce(spark, dir, s"dbg_$round")
      q.awaitTermination(300000)
      if (q.isActive) q.stop()
      val t2 = System.nanoTime()
      val n = spark.table(s"dbg_$round").count()
      println(f"VARIANT $name: total=${(t2 - t0) / 1e9}%.2fs rows=$n batches=${q.recentProgress.length}")
      saved.foreach { case (k, vOpt) => vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    spark.stop()
  }
}
