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
      val bands = OpsQueries.sharedBandsFor(s, d)
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      // Edges are read once per iteration (3×) plus the degree pass.
      val edges = graft.util.PersistScope.track(
        cand.select(col("d1").as("src"), col("d2").as("dst"))
          .unionByName(cand.select(col("d2").as("src"), col("d1").as("dst")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nodes = t(s, d, "documents").select("doc_id")
        .join(deg.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"))
      val nRow = t(s, d, "documents").agg(count(lit(1)).as("n"))
      // One damped power iteration in exact int64 fixed point: per-edge
      // share = r div deg (truncating integer division — Spark's `div`,
      // DuckDB's `//`, identical on non-negatives), dst-keyed integer sum,
      // then r' = (15·(S div n)) div 100 + (85·in) div 100.
      def step(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val contrib = edges
          .join(r.select(col("doc_id").as("src"), col("r"), col("deg").as("sdeg")), "src")
          .select(col("dst").as("doc_id"), expr("r div sdeg").as("share"))
          .groupBy("doc_id").agg(sum("share").as("inflow"))
        r.select("doc_id", "deg")
          .join(contrib, Seq("doc_id"), "left")
          .crossJoin(broadcast(nRow))
          .select(col("doc_id"), col("deg"),
            expr(s"(15 * ($S div n)) div 100" +
              s" + (85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100").as("r"))
      }
      val r0 = nodes.crossJoin(broadcast(nRow))
        .select(col("doc_id"), col("deg"), expr(s"$S div n").as("r"))
      val rF = (1 to Iters).foldLeft(r0)((r, _) => step(r))
      rF.select(col("doc_id"), col("deg").cast("long").as("degree"),
        col("r").cast("long").as("pr_fp"))
    }
  )
}
