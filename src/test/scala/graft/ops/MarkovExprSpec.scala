package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MarkovStationaryExpr must reproduce the row-frame unrolling it replaced
  * in x133 — same masses AND the same surviving-state row set. The
  * reference implementation here is the pre-r16 DataFrame form (moved ∪
  * held, grouped per step), run over the same edge list. */
class MarkovExprSpec extends SparkSpec {
  import spark.implicits._

  /** Pre-r16 x133 row-frame iteration over an (f, t, n) edge frame. */
  private def rowFrameStationary(m: org.apache.spark.sql.DataFrame, iters: Int) = {
    val tot = m.groupBy("f").agg(sum("n").as("tn"))
    val m2 = m.join(tot, "f")
    val st = m.select(col("f").as("state"))
      .unionByName(m.select(col("t").as("state"))).distinct()
    val k = st.agg(count(lit(1)).as("k"))
    val i0 = st.crossJoin(broadcast(k))
      .select(col("state"), expr("1000000 div k").as("p"))
    def step(pi: org.apache.spark.sql.DataFrame) = {
      val moved = pi.join(m2, pi("state") === m2("f"))
        .select(col("t").as("state"), expr("(p * n) div tn").as("p"))
      val held = pi.join(tot, pi("state") === tot("f"), "left_anti")
      moved.unionByName(held).groupBy("state").agg(sum("p").as("p"))
    }
    val iN = (1 to iters).foldLeft(i0)((r, _) => step(r))
    iN.join(broadcast(tot.select(col("f").as("state"), col("tn"))), Seq("state"), "left")
      .select(col("state"), coalesce(col("tn"), lit(0L)).as("n_out"), col("p"))
  }

  private def exprStationary(m: org.apache.spark.sql.DataFrame, iters: Int) =
    m.agg(collect_list(struct(col("f"), col("t"), col("n"))).as("es"))
      .select(explode(MarkovStationaryExpr.markov_stationary(col("es"), iters)).as("x"))
      .select(col("x.state").as("state"), col("x.n_out").as("n_out"), col("x.p").as("p"))

  private def check(edges: Seq[(String, String, Long)], iters: Int = 3): Unit = {
    val m = edges.toDF("f", "t", "n")
    val expect = rowFrameStationary(m, iters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val got = exprStationary(m, iters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
  }

  test("source-only state drops out; its downstream survives only via other edges") {
    // A has no in-edges (source-only): present in π0, gone from π1 on.
    // B's only in-edge is from A, but B has out-edges (not held): B gets
    // A's mass in step 1, then drops in step 2 once A is gone. C is a sink
    // (held forever). D↔E keep each other alive.
    check(Seq(
      ("A", "B", 3L), ("B", "C", 2L), ("D", "E", 1L), ("E", "D", 4L),
      ("D", "C", 1L)))
  }

  test("pure sink chain: mass accumulates in held states") {
    check(Seq(("A", "B", 1L), ("B", "C", 1L)))
  }

  test("self-loop state holds its own mass through the matrix") {
    check(Seq(("A", "A", 5L), ("A", "B", 5L)))
  }

  test("two-cycle is stable and exact") {
    check(Seq(("X", "Y", 7L), ("Y", "X", 7L)))
  }

  test("empty edge list yields zero rows") {
    val m = Seq.empty[(String, String, Long)].toDF("f", "t", "n")
    assert(exprStationary(m, 3).collect().isEmpty)
  }

  test("div truncation matches the row-frame arithmetic on uneven masses") {
    check(Seq(("A", "B", 1L), ("A", "C", 2L), ("C", "A", 3L), ("B", "A", 1L),
      ("C", "B", 5L)))
  }
}
