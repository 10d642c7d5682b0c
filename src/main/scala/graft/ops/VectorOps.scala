package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector kernels for the similarity / dedup operators.
  *
  * Everything is expression-level (codegen-able HOFs, no UDFs) and
  * cross-engine deterministic: doubles accumulated in element order, and the
  * pseudo-random hyperplanes derive from md5 so Spark and the DuckDB oracle
  * agree bit-for-bit.
  */
object VectorOps {

  /** Cosine similarity of two numeric-array columns, accumulated in double in
    * element order (deterministic IEEE on both engines). One-pass custom
    * expression ([[CosineSimExpr]]) — the former three interpreted HOF folds
    * ran once per candidate PAIR in the LSH/IVF verify joins, the hottest
    * kernel of x16. */
  def cosine(a: Column, b: Column): Column = CosineSimExpr.cosine_sim(a, b)

  /** Random-hyperplane LSH bucket: component (p, i) of plane p is ±1 from the
    * top bit of md5("p_i"); the bucket is the sign-bit string of the `planes`
    * projections. Deterministic, model-free, and identical in SQL (the
    * DuckDB twin recomputes the md5 signs inline — `LshBucketSql`).
    *
    * Now a one-pass custom expression ([[LshBucketExpr]]): the former
    * composable form paid `planes` interpreted zip_with/aggregate folds per
    * row (HOF lambdas don't codegen), which made the bucket stage the x07/
    * x16 hot spot. Signs are md5-derived once at plan time; the expression
    * reproduces the fold's double arithmetic and degenerate cases exactly. */
  def lshBucket(vec: Column, planes: Int = 8, dims: Int = 64): Column =
    LshBucketExpr.lsh_bucket(vec, planes, dims)

  /** Hamming distance between two equal-length bit-string columns
    * (codegen'd single-pass expression). A length mismatch counts the
    * unmatched tail into the distance. */
  def hammingBits(a: Column, b: Column): Column =
    HammingBitsExpr.hamming_bits(a, b)
}
