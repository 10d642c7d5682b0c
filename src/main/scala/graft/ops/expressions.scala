package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(shingles, k)` → array<string>: per seed j in [0,k), the
  * lexicographic minimum of md5(s"$j|$shingle") hex over the shingle array.
  *
  * Semantically identical to the composable form
  * `transform(sequence(0,k-1), j -> array_min(transform(sh, x -> md5(j||'|'||x))))`
  * (and to its DuckDB oracle twin), but one-pass with a reused MessageDigest:
  * higher-order functions are interpreted with no common-subexpression
  * elimination, which made the composable form the benchmark hot spot.
  * Byte-wise unsigned comparison == hex-string comparison (hex encoding is
  * order-preserving), so the min runs on raw digests and only the winners are
  * hex-encoded. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(shingles: Any): Any = {
    val arr = shingles.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill[Array[Byte]](numHashes)(null)
    var j = 0
    while (j < numHashes) {
      val prefix = (j.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          md.reset()
          md.update(prefix)
          md.update(arr.getUTF8String(i).getBytes)
          val dig = md.digest()
          if (mins(j) == null || unsignedLt(dig, mins(j))) mins(j) = dig
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map { m =>
      if (m == null) null
      else UTF8String.fromString(m.map("%02x".format(_)).mkString)
    }.toArray[Any])
  }

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {
  def minhash_sig(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.shims.column(
      MinHashSigExpr(org.apache.spark.sql.graftshim.shims.expression(shingles), k))
}
