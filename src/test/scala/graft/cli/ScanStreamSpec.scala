package graft.cli

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.ExactlyOnceSink

/** The incremental scan CLI core: exactly-once findings equal the batch
  * detection, and a second run over the same checkpoint is a no-op. */
class ScanStreamSpec extends SparkSpec {

  test("incremental scan equals batch detection and re-runs commit nothing new") {
    val tmp = java.nio.file.Files.createTempDirectory("scanstream_spec").toString
    val inputs = graft.queries.PiiInputs.df(spark, "/root/testdata/sf0.001")
    inputs.write.parquet(s"$tmp/in")
    val n1 = ScanStream.run(spark, s"$tmp/in", s"$tmp/out")
    val batch = inputs
      .select(col("doc_id"), posexplode(graft.functions.pii_candidates(col("text")))
        .as(Seq("candidate_idx", "c")))
      .select(col("doc_id"), col("candidate_idx"), col("c.value").as("value"))
      .collect().map(_.mkString("|")).sorted
    val streamed = ExactlyOnceSink.readCommitted(spark, s"$tmp/out")
      .select("doc_id", "candidate_idx", "value")
      .collect().map(_.mkString("|")).sorted
    assert(n1 == batch.length)
    assert(streamed.sameElements(batch))
    // same checkpoint, no new files: nothing recommitted, count unchanged
    val n2 = ScanStream.run(spark, s"$tmp/in", s"$tmp/out")
    assert(n2 == n1)
    // a new drop is picked up incrementally on the next run
    inputs.limit(7)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .write.mode("append").parquet(s"$tmp/in")
    val n3 = ScanStream.run(spark, s"$tmp/in", s"$tmp/out")
    assert(n3 > n1, s"new drop must add findings: $n3 vs $n1")
  }
}
