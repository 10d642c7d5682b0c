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

/** `minhash_from_tokens(tokens, k, n)` → the same signature as
  * `minhash_sig(shingles(tokens), k)` with word n-gram shingles built on the
  * fly (shingle string = tokens i..i+n-1 joined by one space), skipping the
  * materialization of the shingle array entirely — one digest buffer, zero
  * intermediate UTF8String allocation per shingle per seed. */
case class MinHashFromTokensExpr(child: Expression, numHashes: Int, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val nSh = math.max(nTok - (shingleLen - 1), 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    // pre-fetch token bytes once
    val toks = Array.tabulate(nTok)(i => if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
    val space = " ".getBytes
    val mins = Array.fill[Array[Byte]](numHashes)(null)
    var j = 0
    while (j < numHashes) {
      val prefix = (j.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < nSh) {
        md.reset()
        md.update(prefix)
        var t = 0
        while (t < shingleLen) {
          if (t > 0) md.update(space)
          md.update(toks(i + t))
          t += 1
        }
        val dig = md.digest()
        if (mins(j) == null || MinHashFromTokensExpr.unsignedLt(dig, mins(j))) mins(j) = dig
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map { m =>
      if (m == null) null
      else UTF8String.fromString(m.map("%02x".format(_)).mkString)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): MinHashFromTokensExpr = copy(child = c)
  override def prettyName: String = "minhash_from_tokens"
}

object MinHashFromTokensExpr {
  private[ops] def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  def minhash_from_tokens(tokens: Column, k: Int, shingleLen: Int = 3): Column =
    org.apache.spark.sql.graftshim.shims.column(
      MinHashFromTokensExpr(org.apache.spark.sql.graftshim.shims.expression(tokens), k, shingleLen))
}

/** `simhash32(tokens)` → 32-char '0'/'1' string: bit b is 1 iff the sum over
  * tokens of ±1 (sign = top bit of the b-th md5 hex digit of the token) is
  * >= 0. Semantically identical to the HOF form over pre-hashed tokens (and
  * its DuckDB oracle), one digest per token. */
case class SimHash32Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        // hex digit b (1-based in the HOF form) = high/low nibble of byte b/2;
        // its "top bit" (8..f) is nibble >= 8.
        var b = 0
        while (b < 32) {
          val byte = dig(b >> 1) & 0xff
          val nibble = if ((b & 1) == 0) byte >> 4 else byte & 0x0f
          counts(b) += (if (nibble >= 8) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    var b = 0
    while (b < 32) { sb.append(if (counts(b) >= 0) '1' else '0'); b += 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): SimHash32Expr = copy(c)
  override def prettyName: String = "simhash32"
}

object SimHash32Expr {
  def simhash32(tokens: Column): Column =
    org.apache.spark.sql.graftshim.shims.column(
      SimHash32Expr(org.apache.spark.sql.graftshim.shims.expression(tokens)))
}

/** `hamming_bits(a, b)`: Hamming distance between two equal-length bit
  * strings, fully codegen'd (static call) — this sits inside join conditions
  * of the near-dup verifiers where an interpreted HOF form was the hot spot
  * (Catalyst pushes the verify filter into the join and re-evaluates it in
  * the output projection, so per-pair cost is paid twice). */
case class HammingBitsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    HammingBitsExpr.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.HammingBitsExpr.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingBitsExpr =
    copy(l, r)
  override def prettyName: String = "hamming_bits"
}

object HammingBitsExpr {
  /** Bytewise compare is correct for '0'/'1' ASCII strings. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes; val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var d = math.abs(ab.length - bb.length)
    var i = 0
    while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
    d
  }

  def hamming_bits(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.shims.column(
      HammingBitsExpr(org.apache.spark.sql.graftshim.shims.expression(a),
        org.apache.spark.sql.graftshim.shims.expression(b)))
}
