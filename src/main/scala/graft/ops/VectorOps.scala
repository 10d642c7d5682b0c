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
    * element order (deterministic IEEE on both engines). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Random-hyperplane LSH bucket: component (p, i) of plane p is ±1 from the
    * top bit of md5("p_i"); the bucket is the sign-bit string of the `planes`
    * projections. Deterministic, model-free, and identical in SQL. */
  def lshBucket(vec: Column, planes: Int = 8, dims: Int = 64): Column =
    concat_ws("", transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(zip_with(vec, sequence(lit(0), lit(dims - 1)), (v, i) =>
        v.cast("double") * when(substring(md5(concat(p.cast("string"), lit("_"), i.cast("string"))), 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v) >= 0, "1").otherwise("0")))

  /** Hamming distance between two equal-length bit-string columns. */
  def hammingBits(a: Column, b: Column, nBits: Int): Column =
    aggregate(transform(sequence(lit(1), lit(nBits)),
      i => when(a.substr(i, lit(1)) =!= b.substr(i, lit(1)), 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
}
