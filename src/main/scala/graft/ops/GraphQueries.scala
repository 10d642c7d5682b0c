package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef.t

/** Graph analytics over the near-duplicate candidate graph — the layer on
  * top of the pair family (x03/x111) and the component family (x21/x35):
  * PageRank as the AUTHORITY score for canonical-document selection. When
  * a dup cluster must keep one representative, "the doc most linked into
  * the near-dup neighborhood" is a better canonical than min-id (it's the
  * version the most variants derive from) — the same reasoning search
  * engines apply to mirror clusters.
  *
  * Determinism posture: scores live entirely in int64 fixed point (1e12
  * scale); per-edge shares use truncating integer division (identical in
  * both engines on non-negatives), so no float ever crosses rows and the
  * three unrolled power iterations are bitwise reproducible anywhere.
  * Dangling-mass redistribution is deliberately omitted (isolated docs
  * keep teleport mass only) — the standard sparse-graph simplification;
  * scores are a RANKING signal, not a probability distribution.
  *
  * Scale shape: edges come from the shared band frame (band-keyed
  * equi-join — never all-pairs); each iteration is one (src-keyed share
  * map) + one (dst-keyed sum) shuffle over edge rows, with map-side
  * combine on the sum; the node frame joins by doc_id throughout. Three
  * iterations = the fixed-depth unrolling a ranking signal needs (full
  * convergence buys nothing for canonical selection).
  */
object GraphQueries {

  private val S = 1000000000000L // 1e12 fixed-point score scale
  private val Iters = 3

  /** Clone-collapsed PageRank scores (doc_id, degree, pr_fp) — the x115
    * computation as a reusable stage (x120 composes it with the dup
    * components for canonical selection). See x115's Scaladoc for the
    * exactness argument; the doc-space oracle is the bitwise proof. */
  private[ops] def pagerankScores(s: SparkSession, d: String): DataFrame = {
    val rm = OpsQueries.sharedRepMapFor(s, d) // (doc_id, rep)
    val mult = rm.groupBy("rep").agg(count(lit(1)).as("m"))
    // Shared rep-level band-collision pairs (one band self-join per pass,
    // shared with x03/x64 and the edge consumers).
    val rcand = OpsQueries.sharedRepCandsFor(s, d)
    // Rep-level symmetric edges, read once per iteration (3×) + degrees.
    val redges = graft.util.PersistScope.track(
      rcand.select(col("d1").as("src"), col("d2").as("dst"))
        .unionByName(rcand.select(col("d2").as("src"), col("d1").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hasBands = OpsQueries.sharedBandsFor(s, d).select("doc_id").distinct()
      .join(rm.filter(col("doc_id") === col("rep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("rep"), lit(1).as("hb"))
    val cross = redges
      .join(mult.select(col("rep").as("src"), col("m").as("ms")), "src")
      .groupBy(col("dst").as("rep")).agg(sum("ms").as("cd"))
    // `cross` and `hasBands` are rep-count-sized (≈ the deduped corpus) —
    // never broadcast them; a plain shuffle join on `rep` is the scale-safe
    // shape (round-10 verdict: a rep-sized broadcast OOMs at 100×).
    val nodes = graft.util.PersistScope.track(mult
      .join(cross, Seq("rep"), "left")
      .join(hasBands, Seq("rep"), "left")
      .select(col("rep"), col("m"),
        (coalesce(col("cd"), lit(0L)) +
          when(col("hb").isNotNull, col("m") - 1).otherwise(lit(0L))).as("deg"),
        when(col("hb").isNotNull, col("m") - 1).otherwise(lit(0L)).as("sd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nRow = t(s, d, "documents").agg(count(lit(1)).as("n"))
    def step(r: DataFrame): DataFrame = {
      val shares = r.select(col("rep"), col("m"), col("deg"), col("sd"),
        when(col("deg") > 0, expr("r div deg")).otherwise(lit(0L)).as("share"))
      val contrib = redges
        .join(shares.select(col("rep").as("src"), col("m").as("ms"),
          col("share").as("sshare")), "src")
        .select(col("dst").as("rep"), (col("ms") * col("sshare")).as("w"))
        .groupBy("rep").agg(sum("w").as("cin"))
      shares
        .join(contrib, Seq("rep"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("rep"), col("m"), col("deg"), col("sd"),
          expr(s"(15 * ($S div n)) div 100" +
            " + (85 * (coalesce(cin, CAST(0 AS BIGINT)) + sd * share)) div 100")
            .as("r"))
    }
    val r0 = nodes.crossJoin(broadcast(nRow))
      .select(col("rep"), col("m"), col("deg"), col("sd"), expr(s"$S div n").as("r"))
    val rF = (1 to Iters).foldLeft(r0)((r, _) => step(r))
    rm.join(rF.select("rep", "deg", "r"), "rep")
      .select(col("doc_id"), col("deg").cast("long").as("degree"),
        col("r").cast("long").as("pr_fp"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Near-dup-graph PageRank (x115). Output: every doc's degree and its
    // exact fixed-point score after 3 damped (d=0.85) power iterations.
    QueryDef("x115_dedup_pagerank",
      s"""WITH bands AS (
            SELECT doc_id, band, md5(array_to_string(
                sig[band*${OpsQueries.BandSize}+1 : band*${OpsQueries.BandSize}+${OpsQueries.BandSize}], ',')) AS band_hash
            FROM (SELECT doc_id, ${OpsQueries.MinhashSigSql} AS sig FROM documents WHERE length(text) > 0),
                 (SELECT unnest(generate_series(0, ${OpsQueries.NumHashes / OpsQueries.BandSize - 1})) AS band)
            WHERE len(sig) > 0 AND sig[1] IS NOT NULL),
          cand AS (
            SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
          edges AS (SELECT d1 AS src, d2 AS dst FROM cand
                    UNION ALL SELECT d2, d1 FROM cand),
          deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
          nodes AS (SELECT d.doc_id, coalesce(g.deg, 0) AS deg
                    FROM documents d LEFT JOIN deg g ON g.src = d.doc_id),
          c AS (SELECT count(*) AS n FROM documents),
          r0 AS (SELECT doc_id, deg, $S // (SELECT n FROM c) AS r FROM nodes),
          i1 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM c))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM r0 n LEFT JOIN edges e ON e.dst = n.doc_id
             LEFT JOIN r0 p ON p.doc_id = e.src
             GROUP BY 1, 2),
          i2 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM c))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM i1 n LEFT JOIN edges e ON e.dst = n.doc_id
             LEFT JOIN i1 p ON p.doc_id = e.src
             GROUP BY 1, 2),
          i3 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM c))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM i2 n LEFT JOIN edges e ON e.dst = n.doc_id
             LEFT JOIN i2 p ON p.doc_id = e.src
             GROUP BY 1, 2)
          SELECT doc_id, CAST(deg AS BIGINT) AS degree, CAST(r AS BIGINT) AS pr_fp
          FROM i3""") { (s, d) =>
      // CLONE-COLLAPSED computation of the doc-space semantics above (the
      // x90 rep-collapse pattern): identical texts have identical bands,
      // hence identical neighborhoods, hence identical scores — so the
      // whole iteration runs on exact-text REPRESENTATIVES with integer
      // multiplicities, immune to dup density (the 10× dense-skew stress
      // measured the doc-space form at 6-13×: clone groups grow the edge
      // set quadratically in multiplicity). The UNCHANGED doc-space
      // oracle is the bitwise proof. Shared with x120 — see
      // [[pagerankScores]].
      pagerankScores(s, d)
    },

    // Canonical-document selection (x120) — the composition the dedup
    // pipeline actually ships: per near-dup CLUSTER (the x21 verified
    // components), keep the member with the highest PageRank authority
    // (x115) — "the version the most variants derive from" — with a
    // deterministic (score desc, doc_id) tie-break. Min-id selection
    // (x53's representative rule) keeps an arbitrary member; this keeps
    // the hub. Output: one row per cluster with its size, the canonical
    // doc, and its score. Scale: both inputs are shared/rep-collapsed
    // stages; the selection itself is one window over cluster-sized
    // groups of the (doc, score) join.
    QueryDef("x120_canonical_docs",
      s"""WITH RECURSIVE ${OpsQueries.componentsCteOver("documents")},
          psym AS (SELECT d1 AS src, d2 AS dst FROM cand
                   UNION ALL SELECT d2, d1 FROM cand),
          pdeg AS (SELECT src, count(*) AS deg FROM psym GROUP BY 1),
          pnodes AS (SELECT d.doc_id, coalesce(g.deg, 0) AS deg
                     FROM documents d LEFT JOIN pdeg g ON g.src = d.doc_id),
          pc AS (SELECT count(*) AS n FROM documents),
          pr0 AS (SELECT doc_id, deg, $S // (SELECT n FROM pc) AS r FROM pnodes),
          pi1 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM pc))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM pr0 n LEFT JOIN psym e ON e.dst = n.doc_id
             LEFT JOIN pr0 p ON p.doc_id = e.src
             GROUP BY 1, 2),
          pi2 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM pc))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM pi1 n LEFT JOIN psym e ON e.dst = n.doc_id
             LEFT JOIN pi1 p ON p.doc_id = e.src
             GROUP BY 1, 2),
          pi3 AS (SELECT n.doc_id, n.deg,
               (15 * ($S // (SELECT n FROM pc))) // 100
                 + (85 * coalesce(sum(p.r // p.deg), 0)) // 100 AS r
             FROM pi2 n LEFT JOIN psym e ON e.dst = n.doc_id
             LEFT JOIN pi2 p ON p.doc_id = e.src
             GROUP BY 1, 2),
          sized AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1),
          scored AS (SELECT l.cluster_id, l.doc_id, p.r FROM lab l
               JOIN pi3 p USING (doc_id)),
          rep AS (SELECT cluster_id, doc_id AS canonical_doc_id, r AS canonical_pr_fp
             FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                 ORDER BY r DESC, doc_id) AS rn FROM scored) WHERE rn = 1)
          SELECT r.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size,
            r.canonical_doc_id, CAST(r.canonical_pr_fp AS BIGINT) AS canonical_pr_fp
          FROM rep r JOIN sized s USING (cluster_id)""") { (s, d) =>
      val lab = OpsQueries.sharedComponents(s, d)
        .select(col("id").as("doc_id"), col("cluster_id"))
      val scored = lab.join(pagerankScores(s, d).select("doc_id", "pr_fp"), "doc_id")
      val rw = Window.partitionBy("cluster_id")
        .orderBy(col("pr_fp").desc, col("doc_id"))
      val rep = scored.withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
      val sized = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      rep.join(sized, "cluster_id")
        .select(col("cluster_id"), col("cluster_size").cast("long").as("cluster_size"),
          col("doc_id").as("canonical_doc_id"),
          col("pr_fp").cast("long").as("canonical_pr_fp"))
    }
  )
}