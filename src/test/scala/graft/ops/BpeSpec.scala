package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the left-to-right greedy semantics of [[Bpe.applyMerge]] on the edge
  * shapes the x62 oracle corpus never exercises (repeated-symbol runs,
  * cross-symbol-boundary false matches, multi-char symbols). */
class BpeSpec extends SparkSpec {

  private def merged(seg: String, a: String, b: String): String = {
    import spark.implicits._
    Seq(seg).toDF("seg")
      .select(Bpe.applyMerge(col("seg"), lit(a), lit(b)).as("m"))
      .head().getString(0)
  }

  test("run of identical symbols merges alternately (canonical BPE)") {
    assert(merged("a a a a", "a", "a") === "aa aa")
    assert(merged("a a a", "a", "a") === "aa a")
    assert(merged("a a a a a", "a", "a") === "aa aa a")
  }

  test("consecutive occurrences all merge") {
    assert(merged("a b a b", "a", "b") === "ab ab")
    assert(merged("x a b a b y", "a", "b") === "x ab ab y")
  }

  test("symbol-boundary exactness: suffix/prefix of longer symbols never match") {
    assert(merged("xa b", "a", "b") === "xa b")   // 'a' is the tail of 'xa'
    assert(merged("a bx", "a", "b") === "a bx")   // 'b' is the head of 'bx'
    assert(merged("a ab b", "a", "b") === "a ab b") // middle symbol is neither
  }

  test("multi-char symbol pairs merge") {
    assert(merged("ab c d", "ab", "c") === "abc d")
    assert(merged("x er y er", "er", "y") === "x ery er")
  }

  test("a just-merged symbol does not re-match its own left part") {
    // after merging the first (a,b), the new symbol 'ab' must not serve as
    // the 'a' of a following (a,b) match
    assert(merged("a b b", "a", "b") === "ab b")
  }

  test("single-symbol and no-match segmentations pass through") {
    assert(merged("a", "a", "a") === "a")
    assert(merged("q r s", "a", "b") === "q r s")
  }
}
