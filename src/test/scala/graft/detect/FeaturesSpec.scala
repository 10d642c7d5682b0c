package graft.detect

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.pii_candidates

class FeaturesSpec extends SparkSpec {
  test("feature vector matches the reference feature table (rules.py:169-180)") {
    import spark.implicits._
    val row = Seq("mail john.doe@example.com here").toDF("text")
      .select(posexplode(pii_candidates(col("text"))).as(Seq("i", "c")))
      .select(Features.featureVector(col("c.value"), col("c.rule_label"),
        col("c.rule_confidence"), col("c.validations")).as("fv"))
      .select("fv.*").collect().head
    assert(row.getAs[Int]("len") == 20)
    assert(row.getAs[Boolean]("has_at"))
    assert(row.getAs[Boolean]("has_dot"))
    assert(!row.getAs[Boolean]("has_digits"))
    assert(row.getAs[Double]("digits_ratio") == 0.0)
    assert(row.getAs[Double]("rule_conf") == 0.95)
    assert(row.getAs[Int]("rule_is_EMAIL") == 1)
    assert(row.getAs[Int]("rule_is_SSN") == 0)
    assert(!row.getAs[Boolean]("val_CREDIT_CARD"))
  }
}

class LogScrubberSpec extends AnyFunSuite {
  test("every span text is masked across nested payloads, deduped (logging_utils.py:149-186)") {
    val spans = Seq("john@x.com", "john@x.com", "123-45-6789")
    assert(LogScrubber.scrub("sent to john@x.com ssn 123-45-6789", spans) ==
      "sent to xxxx@x.xxx ssn 000-00-0000")
    val nested = Map("msg" -> "hi john@x.com", "items" -> Seq("123-45-6789", 42))
    val out = LogScrubber.scrubAny(nested, spans).asInstanceOf[Map[String, Any]]
    assert(out("msg") == "hi xxxx@x.xxx")
    assert(out("items").asInstanceOf[Seq[Any]] == Seq("000-00-0000", 42))
  }
}
