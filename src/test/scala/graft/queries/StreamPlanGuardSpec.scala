package graft.queries

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.SparkSpec

/** Plan-regression guard for the STREAMING runners (s01–s27): each runner's
  * foreachBatch / replay builds real batch plans (s17's broadcast gram row,
  * s26's explode) that no DataFrame.queryExecution ever exposes — until
  * r14 they were the one unguarded plan surface (r13 verdict #5). Every
  * streaming query in the suite is replayed once at sf0.001; the LAST
  * micro-batch execution is captured through the [[graft.streaming
  * .EventStream.awaitDone]] seam and walked with the SAME shared rules as
  * the batch guard ([[PlanGuards]]):
  *
  *  1. No CartesianProductExec in the executed micro-batch plan.
  *  2. No condition-less analyzed join with both sides unbounded, unhinted,
  *     and not conditioned by a two-sided Filter above.
  *  3. No broadcast hint over unreduced corpus lineage — with the SAME
  *     whitelist shape as the batch spec: s17's benchmark gram row is the
  *     streaming twin of x54/x95's entry (eval-sized by contract, no
  *     honest limit(k) exists — gram counts scale with benchmark doc
  *     length, not corpus size).
  *
  * The wrapped StreamExecution is private[sql], so the capture goes
  * through reflection (streamingQuery → lastExecution) — test-only code,
  * no production surface touched. */
class StreamPlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Streaming twin of PlanGuardSpec.BroadcastWhitelist. */
  private val BroadcastWhitelist: Map[String, Int] = Map(
    // Benchmark gram-set row (doc_id < 10): eval-sized by contract — the
    // benchmark suite is a fixed external artifact that does not grow with
    // the corpus (same argument as batch x54/x95).
    "s17_stream_decontam_gate" -> 1)

  private def lastExecutionOf(q: org.apache.spark.sql.streaming.StreamingQuery): Option[QueryExecution] = {
    val se = q.getClass.getMethod("streamingQuery").invoke(q)
    Option(se.getClass.getMethod("lastExecution").invoke(se))
      .map(_.asInstanceOf[QueryExecution])
  }

  test("every streaming micro-batch plan: no cartesian, no unbounded cross join, no corpus broadcast") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val streams = graft.SparkEntry.all.filter(_.name.matches("s\\d.*"))
    assert(streams.length >= 27, s"guard should cover the stream suite, saw ${streams.length}")
    for (q <- streams) {
      graft.streaming.EventStream.replayed.clear()
      try {
        // Force the runner: the replay happens inside fn; the returned
        // read-back frame itself is already guarded by the batch rules.
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable => failures += s"${q.name}: runner failed: ${e.getMessage}"
      } finally graft.util.PersistScope.releaseAll()
      val captured = Iterator.continually(graft.streaming.EventStream.replayed.poll())
        .takeWhile(_ != null).toSeq
      if (captured.isEmpty)
        failures += s"${q.name}: no streaming replay captured through awaitDone"
      for (sq <- captured) {
        lastExecutionOf(sq) match {
          case None =>
            failures += s"${q.name}: replay '${sq.name}' ran zero micro-batches"
          case Some(le) =>
            le.executedPlan.foreach {
              case _: CartesianProductExec =>
                failures += s"${q.name}: CartesianProductExec in micro-batch plan"
              case _ =>
            }
            PlanGuards.analyzedJoinFailures(le.analyzed)
              .foreach(m => failures += s"${q.name}: $m")
            val hints = PlanGuards.corpusBroadcastHints(le.analyzed)
            if (hints.length > BroadcastWhitelist.getOrElse(q.name, 0))
              failures += s"${q.name}: ${hints.length} broadcast hint(s) over unreduced " +
                s"corpus lineage (whitelisted: ${BroadcastWhitelist.getOrElse(q.name, 0)})\n" +
                hints.map(h => "  " + h.treeString.linesIterator.take(6)
                  .mkString(" | ").take(400)).mkString("\n")
        }
      }
      graft.util.SharedStages.releaseAll()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
