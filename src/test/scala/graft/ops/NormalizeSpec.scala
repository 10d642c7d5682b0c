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
    // \t \n \r are NOT in the strip class: words separated only by a
    // line break must stay separated (the old strip-everything-Cc-first
    // order concatenated them into "line1line2")
    assert(clean("line1\nline2") == Seq("line1 line2"))
    assert(clean("col1\tcol2") == Seq("col1 col2"))
    // vertical tab IS stripped (not collapsed to a space): Java counts VT
    // as \s but RE2 does not, so the only engine-identical treatment is
    // to strip it with the other non-\t\n\r controls
    assert(clean("a\u000bb") == Seq("ab"))
    // C1 controls (e.g. NEL U+0085) are stripped too
    assert(clean("a\u0085b") == Seq("ab"))
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
