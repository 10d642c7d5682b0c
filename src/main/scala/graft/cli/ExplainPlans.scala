package graft.cli

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the executed physical plan of the named
  * queries (or a hot-path default set) at sf0.001 — used to keep pushdown,
  * broadcast choice, and codegen spans honest as queries evolve. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_top_revenue_orders", "q04_revenue_by_nation",
        "q09_topk_orders", "p02_pii_scan", "x02_minhash_bands", "x07_ann_lsh",
        "x28_dup_ngram_fraction", "x32_kmeans", "x34_passage_dedup")
    for (n <- names) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
