package graft.detect

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PiiCandidatesGenerator (the Generate-node form) against
  * posexplode(pii_candidates(text)) — identical rows, indices, and order,
  * including zero-candidate docs emitting nothing and null texts. */
class GeneratorParitySpec extends SparkSpec {
  import spark.implicits._

  test("generator == posexplode(array) on mixed fixtures, plan has Generate") {
    val texts = Seq(
      Some("Contact John Doe at john.doe@example.com or (415) 555-1212. " +
        "Card 4111 1111 1111 1111 and SSN 123-45-6789."),
      Some("no pii here at all"),
      Some(""),
      None,
      Some("Aadhaar 2341 2341 2341 and DOB 1990-01-02; IP 10.1.2.3"))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.orNull) }
      .toDF("doc_id", "text").repartition(3)

    def norm(d: org.apache.spark.sql.DataFrame) = d.select(
        col("doc_id"), col("candidate_idx"), col("c.start"), col("c.end"),
        col("c.value"), col("c.rule_label"), col("c.rule_confidence"))
      .collect().map(_.toSeq).toSeq.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int]))

    val viaArray = norm(df.select(col("doc_id"),
      posexplode(graft.functions.pii_candidates(col("text"))).as(Seq("candidate_idx", "c"))))
    val viaGen = norm(df.select(col("doc_id"),
      graft.functions.pii_candidates_rows(col("text")).as(Seq("candidate_idx", "c"))))
    assert(viaGen == viaArray)
    assert(viaGen.nonEmpty)

    // the plan is a single Generate over the child — no intermediate array
    val plan = df.select(col("doc_id"),
        graft.functions.pii_candidates_rows(col("text")).as(Seq("candidate_idx", "c")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate pii_candidates_rows"), plan.take(500))
  }
}
