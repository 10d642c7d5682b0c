package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Microbench: window row_number vs TopKMinExpr over the same persisted
  * scored frame, isolating the top-k stage from the tf/df build. */
object DebugTopK {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n").cast("double") / col("df")))
      .select("doc_id", "token", "tfidf")
      .persist()
    println("scored rows: " + scored.count())

    def time(tag: String)(f: => Unit): Unit = {
      for (r <- 1 to 6) {
        val t0 = System.nanoTime()
        f
        println(f"  $tag round$r: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    time("window") {
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("topk_min") {
      scored.groupBy("doc_id")
        .agg(graft.ops.TopK.topk_min(struct((-col("tfidf")).as("neg"), col("token")), 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "e")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
