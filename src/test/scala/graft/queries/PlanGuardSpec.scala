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
  * Streaming queries (s01–s16) are excluded: their runners execute a
  * micro-batch query with its own stateful plan shape; the batch plans
  * here are the 100-TB surface. */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Corpus-scaling base tables: a broadcast of anything derived from these
    * without a bounded-key reduction is the "fine at sf0.1, OOM at 100×"
    * class (r10: pagerankScores broadcast two rep-sized frames). */
  private val CorpusTables = Seq("documents", "embeddings", "events",
    "customer", "lineitem", "orders", "supplier", "part")

  /** Grouping keys that scale WITH the corpus: an Aggregate keyed by one of
    * these earns no boundedness credit (groupBy(doc_id)/rep/pair-ids is
    * still corpus-sized). Value-domain keys (buckets, bins, fixed-point
    * metrics, cluster ids) pass — the author asserts a bounded domain. */
  private val IdLikeKey =
    ("(?i)((^|_)(doc|vec|event|user|sess|row)_?id$)|((^|_)(order|cust|part|supp|nation|region)_?key$)" +
      "|^(rep|d1|d2|src|dst|id|doc1|doc2|a_id|b_id)$").r

  private def isCorpusLeaf(p: LogicalPlan): Boolean = p match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.exists(rp =>
            CorpusTables.exists(t => rp.toString.contains(t + ".parquet")))
        case _ => false
      }
    // Cached shared stages must not launder corpus lineage: an
    // InMemoryRelation whose cached plan has an UNCUT path to a corpus
    // scan is still corpus-sized. Walk its physical plan with the same
    // bounded-reduction rule (value-keyed aggregates and global limits cut).
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      unboundedCorpusPhysical(imr.cachedPlan)
    case _ => false
  }

  /** The physical-plan twin of [[unboundedCorpusLineage]], for walking
    * inside cached stages (their logical lineage is gone by cache time). */
  private def unboundedCorpusPhysical(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      val keyRefs = a.groupingExpressions.flatMap(_.references.toSeq.map(_.name)).distinct
      if (keyRefs.isEmpty) false
      else if (keyRefs.exists(k => IdLikeKey.findFirstIn(k).isDefined))
        a.children.exists(unboundedCorpusPhysical)
      else false
    case _: GlobalLimitExec => false
    case adaptive: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      unboundedCorpusPhysical(adaptive.executedPlan)
    case scan: org.apache.spark.sql.execution.FileSourceScanExec =>
      scan.relation.location.rootPaths.exists(rp =>
        CorpusTables.exists(t => rp.toString.contains(t + ".parquet")))
    case ims: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      unboundedCorpusPhysical(ims.relation.cachedPlan)
    case other => other.children.exists(unboundedCorpusPhysical)
  }

  /** True when `p` can reach a corpus-table leaf without passing through a
    * bounded-key Aggregate (scalar aggregates and value-domain-keyed
    * aggregates cut the path; id-keyed aggregates don't). */
  private def unboundedCorpusLineage(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      val keyRefs = a.groupingExpressions.flatMap(_.references.toSeq.map(_.name)).distinct
      if (keyRefs.isEmpty) false // scalar aggregate: 1 row
      else if (keyRefs.exists(k => IdLikeKey.findFirstIn(k).isDefined))
        a.children.exists(unboundedCorpusLineage) // id-keyed: no credit
      else false // value-domain keys: author-asserted bounded
    case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => false
    case leaf if leaf.children.isEmpty => isCorpusLeaf(leaf)
    case other => other.children.exists(unboundedCorpusLineage)
  }

  /** Author-signed exceptions to the broadcast-lineage check. EMPTY by
    * design and keep it that way: every bounded broadcast side either
    * aggregates to a value domain or carries an explicit limit(k) that
    * makes its bound machine-visible (maxRows) — including the
    * window-rank-bounded winner frames (x113/x116), whose rank filters
    * static analysis can't prove but whose no-op limits it can. */
  private val BroadcastWhitelist: Map[String, Int] = Map.empty

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
            // A broadcast HINT on a frame whose lineage reaches a corpus
            // table without a bounded-key reduction is a deferred OOM: it
            // passes every sf-scale test and dies on the cluster (the r10
            // pagerankScores class). Scalar/limit sides are exempt.
            val sides = Seq((j.hint.leftHint, j.left), (j.hint.rightHint, j.right))
            for ((h, side) <- sides) {
              val isB = h.flatMap(_.strategy)
                .contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
              if (isB && !side.maxRows.exists(_ <= 4096) && unboundedCorpusLineage(side))
                broadcastHits += 1
            }
          case _ =>
        }
        if (broadcastHits > BroadcastWhitelist.getOrElse(q.name, 0))
          failures += s"${q.name}: $broadcastHits broadcast hint(s) over unreduced corpus lineage " +
            s"(whitelisted: ${BroadcastWhitelist.getOrElse(q.name, 0)})"
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
