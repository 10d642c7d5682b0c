package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.CartesianProductExec

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
  * Streaming queries (s01–s16) are excluded: their runners execute a
  * micro-batch query with its own stateful plan shape; the batch plans
  * here are the 100-TB surface. */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

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
        qe.optimizedPlan.foreach {
          case j: Join if j.condition.isEmpty =>
            val bounded = j.left.maxRows.exists(_ <= 64) || j.right.maxRows.exists(_ <= 64)
            val hinted = Seq(j.hint.leftHint, j.hint.rightHint)
              .flatten.flatMap(_.strategy)
              .contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
            if (!bounded && !hinted)
              failures += s"${q.name}: no-condition join, both sides unbounded, no broadcast hint " +
                s"(${j.left.nodeName} x ${j.right.nodeName})"
          case _ =>
        }
        qe.sparkPlan.foreach {
          case _: CartesianProductExec => failures += s"${q.name}: CartesianProductExec"
          case g: GlobalLimitExec =>
            if (stripToSort(g.child).isInstanceOf[SortExec])
              failures += s"${q.name}: SortExec feeding a bare GlobalLimit " +
                "(should be TakeOrderedAndProject)"
          case _ =>
        }
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
