package graft.data

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{GoldLabel, LabeledExample, PiiTypes}

/** Seeded synthetic labeled-data generator (reference: datasets.py:17-120).
  *
  * Same 5 templates, value families, and Luhn-valid card construction; spans
  * are found by first-occurrence like the reference (`text.find(value)`).
  * JVM `Random` produces a different stream than CPython `random.Random`, so
  * outputs are deterministic per (seed, n) but not byte-equal to the
  * reference (documented deviation, SURVEY §7.4 #4 — the reference's own
  * tests assert invariants, not bytes; ours do too).
  *
  * Distributed: `spark.range(n)` partitioned; each row derives its own RNG as
  * seed+index, so the output is independent of partitioning (unlike a naive
  * per-partition RNG).
  */
object Synth {

  private val users = Seq("john.doe", "jane_smith", "a.brown", "user123")
  private val domains = Seq("example.com", "sample.org", "test.net")
  private val firsts = Seq("John", "Jane", "Alice", "Bob", "Carlos", "Emily")
  private val lasts = Seq("Doe", "Smith", "Brown", "Johnson", "Davis", "Miller")
  private val templates = Seq(
    "Contact {name} via email {email} or phone {phone}.",
    "Visa card {cc} expires on {date}.",
    "SSN for {name} is {ssn}.",
    "Server IP {ip} logged a request from {name} on {date}.",
    "Primary contact: {email}. Secondary: {phone}.")

  private def luhnify(digits0: Seq[Int], rnd: scala.util.Random): String = {
    val digits = digits0 ++ Seq.fill(math.max(0, 15 - digits0.size))(rnd.nextInt(10))
    val parity = (digits.size + 1) % 2
    val s = digits.zipWithIndex.map { case (d, i) =>
      if (i % 2 == parity) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    digits.mkString + ((10 - (s % 10)) % 10).toString
  }

  /** One example for a given RNG (datasets.py:86-119). */
  def example(rnd: scala.util.Random): LabeledExample = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    val values: Seq[(String, String, String)] = Seq(
      ("name", s"${pick(firsts)} ${pick(lasts)}", PiiTypes.PERSON),
      ("email", s"${pick(users)}@${pick(domains)}", PiiTypes.EMAIL),
      ("phone", f"(${200 + rnd.nextInt(800)}) ${200 + rnd.nextInt(800)}%03d-${rnd.nextInt(10000)}%04d", PiiTypes.PHONE_NUMBER),
      ("cc", luhnify(pick(Seq("4", "51", "52", "53", "54", "55")).map(_ - '0') ++ Seq.fill(14)(0), rnd), PiiTypes.CREDIT_CARD),
      ("ssn", f"${100 + rnd.nextInt(900)}-${10 + rnd.nextInt(90)}%02d-${1000 + rnd.nextInt(9000)}%04d", PiiTypes.SSN),
      ("ip", Seq.fill(4)(1 + rnd.nextInt(254)).mkString("."), PiiTypes.IP_ADDRESS),
      ("date", f"${1990 + rnd.nextInt(35)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d", PiiTypes.DATE))
    val t = pick(templates)
    val text = values.foldLeft(t) { case (acc, (k, v, _)) => acc.replace(s"{$k}", v) }
    val labels = values.flatMap { case (_, v, tp) =>
      val start = text.indexOf(v)
      if (start == -1) None else Some(GoldLabel(start, start + v.length, tp, v))
    }
    LabeledExample(text, labels)
  }

  /** Distributed generation: row i uses RNG(seed + i). */
  def generate(spark: SparkSession, n: Long, seed: Long = 1234L): Dataset[LabeledExample] = {
    import spark.implicits._
    spark.range(n).map(i => example(new scala.util.Random(seed + i)))
  }

  /** JSONL roundtrip with the reference's schema (datasets.py:123-148). */
  def saveJsonl(ds: Dataset[LabeledExample], path: String): Unit =
    ds.toDF().write.mode("overwrite").json(path)

  def loadJsonl(spark: SparkSession, path: String): Dataset[LabeledExample] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("text", StringType),
      StructField("labels", ArrayType(StructType(Seq(
        StructField("start", IntegerType), StructField("end", IntegerType),
        StructField("type", StringType), StructField("text", StringType)))))))
    spark.read.schema(schema).json(path)
      .selectExpr("text", "transform(labels, l -> struct(l.start as start, l.end as end, l.type as type, l.text as text)) as labels")
      .as[LabeledExample]
  }
}
