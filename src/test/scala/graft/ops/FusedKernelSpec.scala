package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r16 fused kernels must be bit-identical to the composable chains
  * they replaced: WinnowFpsExpr vs the shingle→md5→windowed-array_min HOF
  * chain (the pre-r16 winnowFingerprints body), and VecAgg's one-pass
  * moment sums vs the posexplode/groupBy forms (the pre-r16 x132 body). */
class FusedKernelSpec extends SparkSpec {
  import spark.implicits._

  /** Pre-r16 winnowFingerprints: the composable HOF chain. */
  private def chainFps(docs: org.apache.spark.sql.DataFrame, window: Int) = {
    val toks = split(col("text"), " ")
    val sh = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val hs = col("__hs")
    val nw = greatest(size(hs) - (window - 1), lit(1))
    val fps = array_distinct(transform(sequence(lit(1), nw),
      j => array_min(slice(hs, j, lit(window)))))
    docs.select(col("doc_id"), transform(sh, g => md5(g)).as("__hs"))
      .select(col("doc_id"), explode_outer(when(size(hs) >= 1, fps)).as("fp"))
      .filter(col("fp").isNotNull)
  }

  private val docs = Seq(
    (1L, ""),
    (2L, "one"),
    (3L, "one two"),
    (4L, "one two three"),                       // exactly 1 shingle
    (5L, "a b c d"),                             // 2 shingles < window
    (6L, "a b c d e f"),                         // 4 shingles = window
    (7L, "a b c d e f g h i j k l m n o p"),     // many windows
    (8L, "x x x x x x x x"),                     // all-identical shingles
    (9L, "a b c a b c a b c a b c"),             // repeating pattern
    (10L, "the quick brown fox jumps over the lazy dog the quick brown fox"))

  test("winnow_fps matches the composable HOF chain row-for-row") {
    for (w <- Seq(1, 2, 4, 7)) {
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.winnowFingerprints(df, "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val expect = chainFps(df, w)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq == expect.toSeq, s"window=$w")
    }
  }

  test("winnow_fps distinct order matches array_distinct first-occurrence") {
    val df = Seq((9L, "a b c a b c a b c a b c")).toDF("doc_id", "text")
    val got = df.select(WinnowFpsExpr.winnow_fps(split(col("text"), " "), 4))
      .collect()(0).getSeq[String](0)
    assert(got.distinct.toSeq == got.toSeq)
    assert(got.nonEmpty)
  }

  test("vec_sum / outer_sum match the posexplode forms exactly") {
    val rows = Seq(
      Array(1L, -2L, 3L), Array(0L, 0L, 0L), Array(-5L, 7L, 11L),
      Array(1000L, -1000L, 999L), Array(2L, 2L, 2L))
    val df = rows.map(Tuple1(_)).toDF("q")
    val n = rows.length
    val d = 3
    val one = df.agg(VecAgg.vec_sum(col("q")).as("sxv"),
      VecAgg.outer_sum(col("q")).as("xyv")).collect()(0)
    val sxv = one.getSeq[Long](0)
    val xyv = one.getSeq[Long](1)
    val expSx = (0 until d).map(i => rows.map(_(i)).sum)
    val expXy = for (i <- 0 until d; j <- 0 until d)
      yield rows.map(r => r(i) * r(j)).sum
    assert(sxv.toSeq == expSx)
    assert(xyv.toSeq == expXy)
    assert(xyv.length == d * d)
    val _ = n
  }

  test("vec_sum / outer_sum on an empty frame yield empty arrays") {
    val df = Seq.empty[Tuple1[Array[Long]]].toDF("q")
    val one = df.agg(VecAgg.vec_sum(col("q")).as("sxv"),
      VecAgg.outer_sum(col("q")).as("xyv")).collect()(0)
    assert(one.getSeq[Long](0).isEmpty && one.getSeq[Long](1).isEmpty)
  }

  test("outer_sum repartitioned (forced merge path) equals single-partition") {
    val rows = (1 to 97).map(i => Array(i.toLong, (i % 7).toLong - 3, 2L * i))
    val a = rows.map(Tuple1(_)).toDF("q").repartition(8)
      .agg(VecAgg.outer_sum(col("q"))).collect()(0).getSeq[Long](0)
    val b = rows.map(Tuple1(_)).toDF("q").coalesce(1)
      .agg(VecAgg.outer_sum(col("q"))).collect()(0).getSeq[Long](0)
    assert(a.toSeq == b.toSeq)
  }
}
