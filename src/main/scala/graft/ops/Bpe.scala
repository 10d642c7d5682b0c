package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE merge application (Sennrich et al. 2016) over a space-joined symbol
  * segmentation — the in-row kernel of the x62 tokenizer-induction query.
  *
  * Left-to-right greedy: fold the symbol list, merging when the accumulated
  * string's LAST symbol equals `ma` and the incoming symbol equals `mb`.
  * The space-boundary checks make symbol identity exact (a trailing 'a' of
  * symbol 'xa' never matches pair a|b), and a just-merged symbol cannot
  * re-match its own left part — so a run 'a a a a' under pair (a,a) becomes
  * 'aa aa', canonical BPE. (A naive string replace of "a b" gets runs wrong:
  * its match consumes the separator, so 'a a a a' would yield 'aa a a'.)
  *
  * Pure column expression: no UDF, no shuffle — the whole merge is one
  * `aggregate` fold per row, vocab-sized frames throughout.
  */
object Bpe {

  /** Apply one merge (ma, mb) to a space-joined segmentation column. */
  def applyMerge(seg: Column, ma: Column, mb: Column): Column = {
    val syms = split(seg, " ")
    aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      element_at(syms, 1),
      (acc, x) => when(
        x === mb && (acc === ma || acc.endsWith(concat(lit(" "), ma))),
        when(acc === ma, concat(ma, mb))
          .otherwise(concat(acc.substr(lit(1), length(acc) - length(ma)), ma, mb)))
        .otherwise(concat(acc, lit(" "), x)))
  }
}
