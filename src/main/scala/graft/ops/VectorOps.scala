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
    * projections. Deterministic, model-free, and identical in SQL.
    *
    * The hyperplane signs depend only on (p, i), so they are computed ONCE at
    * plan time and embedded as literals — the naive inline form re-hashed
    * planes×dims md5s per ROW (512/row at the defaults), which dominated the
    * bucket stage. */
  def lshBucket(vec: Column, planes: Int = 8, dims: Int = 64): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, i: Int): Double = {
      val dig = md.digest(s"${p}_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // top hex digit in ('8'..'f') == high nibble of byte 0 >= 8
      if (((dig(0) & 0xff) >> 4) >= 8) 1.0 else -1.0
    }
    concat_ws("", (0 until planes).map { p =>
      val plane = array((0 until dims).map(i => lit(sign(p, i))): _*)
      when(aggregate(zip_with(vec, plane, (v, h) => v.cast("double") * h),
        lit(0.0), (acc, v) => acc + v) >= 0, "1").otherwise("0")
    }: _*)
  }

  /** Hamming distance between two equal-length bit-string columns
    * (codegen'd single-pass expression). A length mismatch counts the
    * unmatched tail into the distance. */
  def hammingBits(a: Column, b: Column): Column =
    HammingBitsExpr.hamming_bits(a, b)
}
