package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing deduplication operations over a text corpus.
  *
  * Scale shape (the whole point): signatures are a map stage (fused one-pass
  * MinHash expression); candidate pairs come from an equi-join on LSH band
  * buckets (shuffle ∝ 4 rows/doc, join output ∝ near-duplicate pairs — never
  * O(n²)); exact Jaccard verifies only the candidates; survivors are an
  * anti-join. Representative choice is "smallest id among LSH-similar
  * neighbors": a doc is dropped iff some verified neighbor has a smaller id —
  * single pass, no iterative connected components. On chains (a~b~c without
  * a~c) this drops the whole chain except its minimum, the standard greedy
  * behavior for near-dup corpus pruning.
  */
object Dedup {

  val NumHashes = 8
  val BandSize = 2 // 4 bands x 2 rows

  /** Word tokens (single-space splitting, matching the query suite). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles of a token array (composable form). Docs with
    * fewer than 3 tokens yield an empty array — `sequence(1, 0)` counts DOWN
    * on Spark and `element_at(toks, 0)` then throws, so guard explicitly. */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** (id, band, band_hash) rows: the LSH bucket keys. `idCol`/`textCol` name
    * columns of `docs`. */
  def bands(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0)
      .withColumn("__sig", MinHashFromTokensExpr.minhash_from_tokens(tokens(col(textCol)), NumHashes))
      .filter(size(col("__sig")) > 0 && col("__sig").getItem(0).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), lit(NumHashes / BandSize - 1)),
          b => md5(concat_ws(",", slice(col("__sig"), b * BandSize + 1, lit(BandSize))))))
          .as(Seq("band", "band_hash")))

  /** Verified near-duplicate pairs (id1 < id2, jaccard ≥ threshold). */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double): DataFrame = {
    val b = bands(docs, idCol, textCol)
    val candidates = b.as("a").join(b.as("b"),
      col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)))).as("s"))
    candidates
      .join(sh.as("s1"), col("id1") === col("s1.id"))
      .join(sh.as("s2"), col("id2") === col("s2.id"))
      .withColumn("jaccard",
        size(array_intersect(col("s1.s"), col("s2.s"))).cast("double")
          / greatest(size(array_union(col("s1.s"), col("s2.s"))), lit(1)))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** The corpus with near-duplicates removed: every doc that has a verified
    * neighbor with a smaller id is dropped. */
  def dropNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8): DataFrame = {
    val doomed = nearDuplicatePairs(docs, idCol, textCol, threshold)
      .select(col("id2").as(idCol)).distinct()
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** Exact dedup: one representative (min id) per identical text. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = docs.groupBy(md5(col(textCol)).as("__fp")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(reps, Seq(idCol), "left_semi")
  }
}
