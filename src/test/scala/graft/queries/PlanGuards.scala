package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan}

/** Lineage analysis shared by the batch [[PlanGuardSpec]] and the streaming
  * [[StreamPlanGuardSpec]]: whether a plan can reach a corpus-table scan
  * without passing a machine-visible bound. One definition — the streaming
  * guard must not drift from the batch rule it mirrors. */
object PlanGuards {

  /** Corpus-scaling base tables: a broadcast of anything derived from these
    * without a bounded-key reduction is the "fine at sf0.1, OOM at 100×"
    * class (r10: pagerankScores broadcast two rep-sized frames). */
  val CorpusTables: Seq[String] = Seq("documents", "embeddings", "events",
    "customer", "lineitem", "orders", "supplier", "part")

  def isCorpusLeaf(p: LogicalPlan): Boolean = p match {
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
  def unboundedCorpusPhysical(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      // Scalar aggregate (1 row) cuts; ANY keyed aggregate gets no credit —
      // key cardinality is invisible to static analysis (PlanGuardSpec
      // header note).
      if (a.groupingExpressions.isEmpty) false
      else a.children.exists(unboundedCorpusPhysical)
    case _: GlobalLimitExec => false
    // A persisted frame whose plan ENDS in limit(k) plans that root-level
    // limit as CollectLimitExec (GlobalLimitExec only appears mid-plan) —
    // both are the same machine-visible k-bound. TakeOrdered is top-k.
    case _: org.apache.spark.sql.execution.CollectLimitExec => false
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => false
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
    * scalar Aggregate or a GlobalLimit. Keyed aggregates do NOT cut —
    * whether a grouping key's domain is bounded is a human argument, and
    * humans sign it via limit(k) or the whitelist, never a key-name regex. */
  def unboundedCorpusLineage(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      if (a.groupingExpressions.isEmpty) false // scalar aggregate: 1 row
      else a.children.exists(unboundedCorpusLineage) // keyed: no credit
    case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => false
    case leaf if leaf.children.isEmpty => isCorpusLeaf(leaf)
    case other => other.children.exists(unboundedCorpusLineage)
  }

  /** Broadcast-hinted sides with unreduced corpus lineage, on an ANALYZED
    * plan (where ResolvedHint nodes and full lineage survive caching). */
  def corpusBroadcastHints(root: LogicalPlan): Seq[LogicalPlan] = root.collect {
    case rh: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if rh.hints.strategy
          .contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST) &&
          !rh.child.maxRows.exists(_ <= 4096) &&
          unboundedCorpusLineage(rh.child) => rh.child
  }

  /** No-condition-join violations on an ANALYZED plan — one message per
    * join with both sides unbounded, no broadcast hint, and no Filter
    * above whose condition references attributes from BOTH children (a
    * one-sided predicate above a crossJoin leaves the cartesian intact;
    * filters are alias-resolved through Projects so a predicate on a
    * derived column still credits the sides its inputs came from). */
  def analyzedJoinFailures(root: LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Deduplicate, Distinct, Filter, Generate, Join, Project, Window => LWindow}
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def scan(p: LogicalPlan, filtersAbove: Seq[Expression]): Unit = p match {
      case f: Filter => scan(f.child, filtersAbove :+ f.condition)
      case pr: Project =>
        val aliasMap = pr.projectList.collect {
          case a: Alias => a.toAttribute.exprId -> a.child
        }.toMap
        scan(pr.child, filtersAbove.map(_.transform {
          case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
            aliasMap(ar.exprId)
        }))
      // Filter credit stops where Filter pushdown stops (r14 ADVICE): a
      // two-sided predicate ABOVE an Aggregate/Window/Distinct does not
      // reduce a join BELOW it — the cartesian fully materializes to feed
      // the aggregate before the filter ever runs. Mirroring the
      // optimizer (which only pushes through these nodes in special cases
      // we don't want to credit), drop accumulated filters and keep
      // scanning the subtree fresh.
      case a: Aggregate => a.children.foreach(scan(_, Nil))
      case w: LWindow => w.children.foreach(scan(_, Nil))
      // Generate is NOT a pushdown barrier for predicates that only
      // reference the CHILD's attributes: the optimizer
      // (PushPredicateThroughNonJoin) pushes exactly those through, so a
      // join under an explode conditioned by such a filter is genuinely
      // reduced — keep their credit; drop only filters touching the
      // generated output, which cannot exist below the Generate
      // (r15 ADVICE: clearing unconditionally false-flagged legitimately
      // filtered joins under explodes).
      case g: Generate =>
        val genOut = org.apache.spark.sql.catalyst.expressions.AttributeSet(g.generatorOutput)
        scan(g.child, filtersAbove.filter(_.references.intersect(genOut).isEmpty))
      case d: Distinct => d.children.foreach(scan(_, Nil))
      case d: Deduplicate => d.children.foreach(scan(_, Nil))
      case j: Join =>
        val conditioned = filtersAbove.exists { c =>
          c.references.intersect(j.left.outputSet).nonEmpty &&
            c.references.intersect(j.right.outputSet).nonEmpty
        }
        if (j.condition.isEmpty && !conditioned) {
          val bounded = j.left.maxRows.exists(_ <= 64) || j.right.maxRows.exists(_ <= 64)
          val hinted = Seq(j.left, j.right).exists(_.exists {
            case rh: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
              rh.hints.strategy
                .contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
            case _ => false
          })
          if (!bounded && !hinted)
            out += "no-condition join in ANALYZED plan, both sides unbounded, " +
              s"no broadcast hint (${j.left.nodeName} x ${j.right.nodeName})"
        }
        j.children.foreach(scan(_, Nil))
      case other => other.children.foreach(scan(_, filtersAbove))
    }
    scan(root, Nil)
    out.toSeq
  }
}
