package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics: x82's three stages timed separately at a given SF — the
  * pair generation (banded MinHash over the augmented corpus), the
  * iterative connected components, and the regex flag map + cluster
  * window. x82 read bimodally at 10x (11-94 s across runs); this split
  * the variance by stage and fingered the private corpus MinHash pass
  * (~6 s/round + the recompute-under-eviction tail), which r14 then
  * replaced with the shared-stage union (see PipelineQueries x82). This
  * diag deliberately keeps the OLD self-contained shape as the
  * comparison baseline. Usage: runMain graft.cli.DiagX82 [sfDir] */
object DiagX82 {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    import graft.functions.pii_candidates
    for (round <- 1 to 3) {
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"X82STAGE round$round $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text")).repartition(32)
      val off = docs.agg((max("doc_id") + lit(1)).as("o"))
      val planted = docs
        .filter(col("doc_id") < 20 && size(split(col("text"), " ")) >= 40)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("o")).as("doc_id"),
          concat(col("text"), lit(" 4111 1111 1111 1111")).as("text"))
      val corpus = docs.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("corpus-materialize") { corpus.write.format("noop").mode("overwrite").save() }
      val edges = graft.ops.Dedup.nearDuplicatePairs(corpus, "doc_id", "text", 0.8)
        .select(col("id1"), col("id2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("pairs") { edges.write.format("noop").mode("overwrite").save() }
      val lab = time("components") {
        val l = graft.ops.Dedup.connectedComponents(edges)
        l.write.format("noop").mode("overwrite").save(); l
      }
      time("flags+window") {
        val flags = corpus.select(col("doc_id"),
          when(size(pii_candidates(col("text"))) > 0, 1).otherwise(0).as("pii"))
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("cid")
        corpus.select("doc_id")
          .join(lab.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("cid", coalesce(col("cluster_id"), col("doc_id")))
          .join(flags, Seq("doc_id"))
          .select(col("doc_id"), count(lit(1)).over(wc).as("cs"),
            sum("pii").over(wc).as("np"))
          .write.format("noop").mode("overwrite").save()
      }
      corpus.unpersist(true); edges.unpersist(true)
      graft.util.PersistScope.releaseAll()
      System.gc()
    }
    spark.stop()
  }
}
