package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused one-pass hash expressions must be bit-identical to their
  * composable built-in forms (which are what the DuckDB oracles mirror). */
class HashExprSpec extends SparkSpec {

  private def toks = split(col("text"), " ")
  private def shingles = transform(sequence(lit(1), greatest(size(toks) - 2, lit(0))),
    i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)

  test("minhash_from_tokens == composable minhash over shingles == MinHashSigExpr") {
    val composable = transform(sequence(lit(0), lit(7)),
      j => array_min(transform(shingles, x => md5(concat(j.cast("string"), lit("|"), x)))))
    val rows = docs
      .withColumn("fused", MinHashFromTokensExpr.minhash_from_tokens(toks, 8))
      .withColumn("viaShingles", MinHashSigExpr.minhash_sig(shingles, 8))
      .withColumn("hof", composable)
      .select("doc_id", "fused", "viaShingles", "hof").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getSeq[String](1) == r.getSeq[String](3), s"fused != hof for doc ${r.getLong(0)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"expr != hof for doc ${r.getLong(0)}")
    }
  }

  test("simhash32 == composable bit-count form") {
    val tokh = transform(toks, tk => md5(tk))
    val composable = concat_ws("", transform(sequence(lit(1), lit(32)), b =>
      when(aggregate(tokh, lit(0),
        (acc, h) => acc + when(h.substr(b, lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
        >= 0, "1").otherwise("0")))
    val rows = docs
      .withColumn("fused", SimHash32Expr.simhash32(toks))
      .withColumn("hof", composable)
      .select("doc_id", "fused", "hof").collect()
    for (r <- rows) assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)}")
  }
}
