package graft

/** The whole custom-expression surface must be reachable from plain SQL. */
class FunctionsSqlSpec extends SparkSpec {
  test("registered functions work through spark.sql") {
    functions.register(spark)
    val r = spark.sql(
      """SELECT
           size(pii_candidates('a@b.co and 4111 1111 1111 1111')) AS n_cands,
           luhn('4111 1111 1111 1111') AS l,
           verhoeff('1234 5678 9012') AS v,
           mask_token('Ab1-x') AS m,
           redact_spans('mail a@b.co x', pii_candidates('mail a@b.co x')) AS red,
           size(ner_spans('mail a@b.co')) AS ner,
           minhash_from_tokens(split('a b c d e', ' '), 4) AS mh,
           simhash32(split('a b c', ' ')) AS sh""").collect().head
    assert(r.getInt(0) >= 2)     // email + luhn-valid card (+phone-in-card)
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getString(3) == "Xx0-x")
    assert(r.getString(4) == "mail x@x.xx x")
    assert(r.getInt(5) == 1)
    assert(r.getSeq[String](6).length == 4)
    assert(r.getString(7).length == 32 && r.getString(7).forall("01".contains(_)))
  }
}
