package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics: where do s06's ~2 s go — stream machinery, the detect
  * expression (single-file partitioning?), the sink write, or the
  * read-back? */
object DebugS06 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.PiiInputs
    import graft.streaming.{Ckpt, EventStream, ExactlyOnceSink}

    for (round <- 0 until 2) {
      val t0 = System.nanoTime()
      val sess = spark.newSession()
      sess.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val schema = sess.read.parquet(s"$d/customer.parquet").schema
      val detected = PiiInputs.fromCustomer(
          sess.readStream.schema(schema).option("pathGlobFilter", "customer.parquet").parquet(d))
        .repartition(16)
        .select(col("doc_id"),
          posexplode(graft.functions.pii_candidates(col("text"))).as(Seq("candidate_idx", "c")))
        .select(col("doc_id"), col("candidate_idx"),
          col("c.value").as("value"), col("c.rule_label").as("rule_label"),
          col("c.rule_confidence").as("rule_confidence"))
      val tmp = java.nio.file.Files.createTempDirectory("s06_dbg").toString
      val t1 = System.nanoTime()
      val q = EventStream.toParquetBatches(detected, s"$tmp/out", Ckpt.fresh("s06dbg"))
      q.awaitTermination(300000)
      if (q.isActive) q.stop()
      val t2 = System.nanoTime()
      ExactlyOnceSink.readCommitted(spark, s"$tmp/out")
        .select("doc_id", "candidate_idx", "value", "rule_label", "rule_confidence")
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"== s06 round$round setup=${(t1 - t0) / 1e9}%.2f stream=${(t2 - t1) / 1e9}%.2f readback=${(t3 - t2) / 1e9}%.2f")
      q.recentProgress.foreach(p => println(s"   batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}"))
    }
    spark.stop()
  }
}
