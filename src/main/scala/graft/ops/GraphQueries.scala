package graft.ops

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
      // set quadratically in multiplicity). Every clone of rep r has
      // degree d_r = Σ_{j∈N(r)} m_j + (m_r − 1 if r has bands), receives
      // cross-inflow Σ m_j·(s_j div d_j) plus sibling inflow
      // (m_r−1)·(s_r div d_r) — the identical int64 arithmetic, folded by
      // group. The UNCHANGED doc-space oracle is the bitwise proof.
      val rm = OpsQueries.sharedRepMapFor(s, d) // (doc_id, rep)
      val mult = rm.groupBy("rep").agg(count(lit(1)).as("m"))
      val bands = OpsQueries.sharedBandsFor(s, d)
      val rb = graft.util.PersistScope.track(
        bands.join(rm.filter(col("doc_id") === col("rep")).select("doc_id"),
            Seq("doc_id"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val rcand = rb.as("a").join(rb.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      // Rep-level symmetric edges, read once per iteration (3×) + degrees.
      val redges = graft.util.PersistScope.track(
        rcand.select(col("d1").as("src"), col("d2").as("dst"))
          .unionByName(rcand.select(col("d2").as("src"), col("d1").as("dst")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val hasBands = rb.select("doc_id").distinct()
        .select(col("doc_id").as("rep"), lit(1).as("hb"))
      val cross = redges
        .join(mult.select(col("rep").as("src"), col("m").as("ms")), "src")
        .groupBy(col("dst").as("rep")).agg(sum("ms").as("cd"))
      val nodes = graft.util.PersistScope.track(mult
        .join(broadcast(cross), Seq("rep"), "left")
        .join(broadcast(hasBands), Seq("rep"), "left")
        .select(col("rep"), col("m"),
          (coalesce(col("cd"), lit(0L)) +
            when(col("hb").isNotNull, col("m") - 1).otherwise(lit(0L))).as("deg"),
          when(col("hb").isNotNull, col("m") - 1).otherwise(lit(0L)).as("sd"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nRow = t(s, d, "documents").agg(count(lit(1)).as("n"))
      // One damped power iteration in exact int64 fixed point over reps:
      // per-edge share = s div d (truncating integer division — Spark's
      // `div`, DuckDB's `//`, identical on non-negatives), multiplicity-
      // weighted dst-keyed integer sum, then
      // r' = (15·(S div n)) div 100 + (85·in) div 100.
      def step(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
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
  )
}
