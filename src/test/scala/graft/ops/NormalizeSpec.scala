package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The Unicode cases x46 ASCII corpus cannot exercise: NFC composition,
  * control stripping, whitespace collapse - through the DataFrame path so
  * the codegen expression (not just the interpreted eval) runs. All
  * non-ASCII / control fixtures are escape sequences: the source stays
  * pure ASCII. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301" // e + combining acute
  private val Composed = "caf\u00e9"    // precomposed e-acute

  private def clean(ss: String*): Seq[String] =
    ss.toDF("s").select(graft.functions.clean_text(col("s"))).as[String].collect().toSeq

  test("NFC composes decomposed accents; already-NFC text is unchanged") {
    assert(clean(Decomposed) == Seq(Composed))
    assert(clean(Composed) == Seq(Composed))
    // the dedup motivation: byte-variants fingerprint identically after
    assert(clean(Decomposed) == clean(Composed))
  }

  test("control characters are stripped, whitespace runs collapse, ends trim") {
    assert(clean("a\u0000b\u0007c") == Seq("abc"))
    assert(clean("  a \t\n b\r\n  c  ") == Seq("a b c"))
    // vertical tab is a control char: stripped by the Cc pass before the
    // whitespace pass could have turned it into a space
    assert(clean("a\u000bb") == Seq("ab"))
  }

  test("nulls and empties pass through") {
    val got = Seq(Some("x"), None, Some("")).toDF("s")
      .select(graft.functions.nfc_normalize(col("s"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("x"), None, Some("")))
  }

  test("SQL registration: nfc_normalize callable from spark.sql") {
    graft.functions.register(spark)
    val r = spark.sql("SELECT nfc_normalize('cafe\u0301') AS s").as[String].head()
    assert(r == Composed)
  }
}
