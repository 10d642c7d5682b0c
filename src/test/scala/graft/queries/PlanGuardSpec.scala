package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec

/** Plan-regression guard over EVERY batch query: the static anti-patterns
  * that turn a correct plan into a 100-TB disaster must never reappear —
  * a future edit that drops a broadcast hint, loses an equi-join key, or
  * splits an orderBy+limit pair should fail CI here, not surface as a
  * mystery regression in the bench.
  *
  * Checks, per query at sf0.001 (plans, not results — the oracle gate owns
  * values):
  *  1. No CartesianProductExec anywhere in the physical plan.
  *  2. Every NO-CONDITION logical join (cross or degenerate inner) must
  *     have at least one side that is either provably tiny to Catalyst
  *     (`maxRows` ≤ 64: scalar aggregates, literal config relations,
  *     bounded limits) or carries an EXPLICIT broadcast hint — the
  *     author's signed assertion that the side is dims/centroids-sized
  *     (x15's k=8 centroid frame is 8 rows by construction but opaque to
  *     static analysis). An unhinted, unbounded no-condition join is a
  *     corpus-scale cartesian regardless of today's row counts.
  *  3. No SortExec feeding a bare GlobalLimit (through projections/limits/
  *     exchanges): orderBy+limit must plan as TakeOrderedAndProject — a
  *     full global sort for a top-k is the classic scale killer.
  *
  * Streaming queries (s01–s27) are excluded HERE: their runners execute
  * micro-batch plans that never pass through a DataFrame's queryExecution
  * — [[StreamPlanGuardSpec]] walks one captured micro-batch execution per
  * runner with the same shared rules (PlanGuards). */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Author-signed exceptions to the broadcast-lineage check, each with
    * its boundedness argument. Keep this SHORT: every other bounded
    * broadcast side carries an explicit limit(k) that makes its bound
    * machine-visible (maxRows / a GlobalLimit lineage cut) — including the
    * window-rank-bounded winner frames (x113/x116), whose rank filters
    * static analysis can't prove but whose no-op limits it can. */
  private val BroadcastWhitelist: Map[String, Int] = Map(
    // Benchmark shingle/gram sets (doc_id < 10): EVAL-sized by contract —
    // the benchmark suite is a fixed external artifact that does not grow
    // with the corpus. No honest limit(k) exists because gram counts scale
    // with benchmark doc LENGTH (not corpus size); both Scaladocs document
    // the hint-free gram-keyed equi-join fallback for oversized benchmarks.
    "x54_contamination_pairs" -> 1,
    "x95_span_contamination" -> 1)

  /** Empty-partition-spec WindowExec sites whose frames are genuinely
    * bounded (value-distinct or strata/bucket counts, argued in each
    * query's Scaladoc). Everything else must partition its windows. */
  private val WindowWhitelist: Map[String, Int] = Map(
    // bucket-offset prefix over norm-range buckets (≤ max_norm·1e6/2^20)
    "x85_norm_outliers" -> 1,
    // distinct integer token lengths (doc-length horizon, not corpus)
    "x89_curriculum_phases" -> 1,
    // r_days / f_cnt / m_cents distinct-value frames (activity horizon,
    // per-user order counts, price-point grid — all value domains)
    "x104_rfm_segments" -> 3,
    // session duration s / session size distinct-value frames ×{p50,p90}
    // (session horizon and burst length bound both)
    "x105_session_stats" -> 4,
    // bucket-offset prefix over score-range buckets (dims·1000/2048)
    "x107_score_auc" -> 1,
    // bucket-offset prefix over doc-length-range buckets (len_range/2^16)
    "x130_source_ks_drift" -> 1,
    // fixed decile grid (10 rows)
    "x109_vocab_growth" -> 1,
    // distinct sensitive-value frame (attribute domain, not corpus)
    "x114_t_closeness" -> 1,
    // largest-remainder row_number over the strata frame (|sources| rows)
    "x121_neyman_allocation" -> 1,
    // rank over the fixed 1025-row top-k frame + lag over the 11-row
    // octave frame (both fixed-size by construction)
    "x127_zipf_octaves" -> 2)

  @annotation.tailrec
  private def stripToSort(p: SparkPlan): SparkPlan = p match {
    case e: Exchange => stripToSort(e.child)
    case l: LocalLimitExec => stripToSort(l.child)
    case pr: ProjectExec => stripToSort(pr.child)
    case other => other
  }

  test("every batch plan: no cartesian, no unbounded cross join, no sort-then-limit") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val batch = graft.SparkEntry.all.filterNot(_.name.matches("s\\d.*"))
    assert(batch.length >= 120, s"guard should cover the batch suite, saw ${batch.length}")
    for (q <- batch) {
      try {
        val qe = q.fn(spark, sf).queryExecution
        var broadcastHits = 0
        val broadcastDetail = scala.collection.mutable.ArrayBuffer[String]()
        qe.optimizedPlan.foreach {
          case j: Join =>
            if (j.condition.isEmpty) {
              val bounded = j.left.maxRows.exists(_ <= 64) || j.right.maxRows.exists(_ <= 64)
              val hinted = Seq(j.hint.leftHint, j.hint.rightHint)
                .flatten.flatMap(_.strategy)
                .contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
              if (!bounded && !hinted)
                failures += s"${q.name}: no-condition join, both sides unbounded, no broadcast hint " +
                  s"(${j.left.nodeName} x ${j.right.nodeName})"
            }
          case _ =>
        }
        // A broadcast HINT on a frame whose lineage reaches a corpus table
        // without a machine-visible bound (scalar aggregate / limit) is a
        // deferred OOM: it passes every sf-scale test and dies on the
        // cluster (the r10 pagerankScores class). Scanned on the ANALYZED
        // plan, where ResolvedHint nodes and full lineage are still
        // visible — the optimized plan hides hints inside persisted stages
        // behind InMemoryRelation (the r11 blind spot: x90's hot-bucket
        // hints sat inside a cached subtree and were never seen).
        PlanGuards.corpusBroadcastHints(qe.analyzed).foreach { side =>
          broadcastHits += 1
          broadcastDetail += s"  ${q.name} hinted side: " +
            side.treeString.linesIterator.take(6).mkString(" | ").take(400)
        }
        if (broadcastHits > BroadcastWhitelist.getOrElse(q.name, 0))
          failures += s"${q.name}: $broadcastHits broadcast hint(s) over unreduced corpus lineage " +
            s"(whitelisted: ${BroadcastWhitelist.getOrElse(q.name, 0)})\n" +
            broadcastDetail.mkString("\n")
        // The optimizedPlan join walk above has the SAME cached-subtree
        // blind spot the hint scan had until r11: a join built inside a
        // persisted SharedStages frame hides behind InMemoryRelation once
        // the cache substitutes in. Re-run the no-condition-join check on
        // the ANALYZED plan, where lineage is still whole (the shared
        // rule also enforces the r13 two-sided-filter exemption — see
        // PlanGuards.analyzedJoinFailures).
        PlanGuards.analyzedJoinFailures(qe.analyzed)
          .foreach(m => failures += s"${q.name}: $m")
        var windowHits = 0
        qe.sparkPlan.foreach {
          case _: CartesianProductExec => failures += s"${q.name}: CartesianProductExec"
          case g: GlobalLimitExec =>
            if (stripToSort(g.child).isInstanceOf[SortExec])
              failures += s"${q.name}: SortExec feeding a bare GlobalLimit " +
                "(should be TakeOrderedAndProject)"
          // An empty partition spec funnels the whole frame into ONE task;
          // legitimate only when the frame's cardinality is bounded by a
          // value domain, never by the corpus (r10: x107/x85 ran global
          // cumulative windows over effectively-per-row distinct values).
          case w: WindowExec if w.partitionSpec.isEmpty => windowHits += 1
          case _ =>
        }
        if (windowHits > WindowWhitelist.getOrElse(q.name, 0))
          failures += s"${q.name}: $windowHits empty-partition WindowExec node(s) " +
            s"(whitelisted: ${WindowWhitelist.getOrElse(q.name, 0)})"
      } catch {
        case e: Throwable => failures += s"${q.name}: plan construction failed: ${e.getMessage}"
      } finally {
        graft.util.PersistScope.releaseAll()
      }
    }
    graft.util.SharedStages.releaseAll()
    assert(failures.isEmpty, s"${failures.length} plan regressions:\n" + failures.mkString("\n"))
  }
}
