package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over integer-quantized vectors — the cluster
  * index a 100 TB curation pipeline needs for IVF training and SemDeDup-style
  * semantic dedup (ref: catalog-pii-scanner has no clustering; this is part
  * of the extended LLM-data-pipeline surface, same family as
  * `embeddings.py:63-70`'s vector handling).
  *
  * Why integer codes: a float centroid mean is a SUM of floats, and float
  * sums depend on reduction order — a distributed partial-agg would drift
  * run to run (and engine to engine). Over int8 codes the per-cluster sums
  * are exact int64s (order-independent), so centroid components are the
  * exact rational sum/count evaluated once as a double: bit-identical on
  * any cluster size, any partitioning, and in DuckDB.
  *
  * Scale shape per iteration:
  *  - ASSIGN is shuffle-free: the k centroids collapse to ONE broadcast row
  *    (array of (cid, centroid)); each vector folds over that array and
  *    takes `array_min` of (dist², cid) structs — an argmin with a
  *    deterministic min-cid tie-break, computed entirely inside the row.
  *    No window, no per-vector shuffle (the window form would shuffle the
  *    whole corpus once per iteration).
  *  - UPDATE shuffles only (cid, dim) keyed integer sums with map-side
  *    combine: k·dims rows out of any corpus size.
  */
object KMeans {

  /** Stage symmetric int8 codes of a float/double array column as `qvCol`
    * (same construction as the x26 quantization query: scale = max|v|/127,
    * explicit floor(x+0.5) rounding so engines agree). The max-abs scale is
    * staged as a real column — inlining it into the per-element lambda would
    * re-evaluate the array_max per element (interpreted HOFs do no CSE). */
  def withInt8Codes(df: DataFrame, vecCol: String, qvCol: String): DataFrame =
    df.withColumn("__km_e", transform(col(vecCol), v => v.cast("double")))
      .withColumn("__km_emax", array_max(transform(col("__km_e"), v => abs(v))))
      .withColumn(qvCol, transform(col("__km_e"), v =>
        when(col("__km_emax") === 0, lit(0))
          .otherwise(floor(v / col("__km_emax") * 127 + 0.5).cast("int"))))
      .drop("__km_e", "__km_emax")

  /** Exact integer squared norm of an int-code array (for quantized cosine:
    * cos = dot / (sqrt(n1)·sqrt(n2)) with every input an exact int64).
    * Evaluated once per ROW (not per pair) — the HOF fold is fine here. */
  def int8SqNorm(qv: Column): Column =
    aggregate(qv, lit(0L), (acc, v) => acc + v.cast("long") * v.cast("long"))

  /** Exact integer dot product of two int-code arrays. Custom one-loop
    * expression — see [[Int8DotExpr]] for why not a HOF fold. */
  def int8Dot(a: Column, b: Column): Column = Int8DotExpr.int8_dot(a, b)

  /** Exact integer squared distance between two int-code arrays. Custom
    * one-loop expression — see [[Int8Dist2Expr]]: this is the per-PAIR hot
    * kernel of every quantized-vector operator. */
  def int8Dist2(a: Column, b: Column): Column = Int8Dist2Expr.int8_dist2(a, b)

  private def dist2(qv: Column, ce: Column): Column =
    aggregate(zip_with(qv, ce, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  /** One shuffle-free assignment pass: `centsArr` is a one-row frame with a
    * `cs: array<struct<cid, ce>>` column. Adds `cid` + `dist2`. */
  private def assignOnce(qb: DataFrame, idCol: String, qvCol: String,
                         centsArr: DataFrame): DataFrame = {
    val best = array_min(transform(col("__km_cs"),
      c => struct(dist2(col(qvCol), c.getField("ce")).as("d2"),
        c.getField("cid").as("cid"))))
    qb.crossJoin(broadcast(centsArr))
      .withColumn("__km_best", best)
      .select(col(idCol), col(qvCol),
        col("__km_best.cid").as("cid"), col("__km_best.d2").as("dist2"))
  }

  /** Collapse a (cid, ce) centroid frame to the one-row broadcast form. */
  private def toArr(cents: DataFrame): DataFrame =
    cents.agg(array_sort(collect_list(struct(col("cid"), col("ce")))).as("__km_cs"))

  /** Final (id, qv, cid, dist2) assignment after `iters` Lloyd passes.
    * Init: centroids = the vectors with id < k (k-means with deterministic
    * seeding; production would hash-sample instead — same shape). A cluster
    * that loses all members simply stops existing (no re-seeding), matching
    * the oracle's join semantics. */
  def assignments(qb: DataFrame, idCol: String, qvCol: String,
                  k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Persisted: the code frame feeds the init-centroid filter plus one
    // assignment pass per iteration — without it every consumer re-derives
    // the quantization chain from the source scan (and the update pass's
    // Generate would push the chain into scan DataFilters on top).
    // A caller that already persisted `qb` keeps ownership (the shared-stage
    // case: the returned frame may outlive this query's PersistScope, so
    // its upstream persist must share the same lifetime).
    val qbP =
      if (qb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.util.PersistScope.track(
          qb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else qb
    // limit(k): no-op on the id-predicate seed set, makes the k-bound
    // machine-visible (maxRows) to PlanGuard's corpus-lineage check.
    val init = qbP.filter(col(idCol) < k).limit(k)
      .select(col(idCol).as("cid"), transform(col(qvCol), v => v.cast("double")).as("ce"))
    var assigned = assignOnce(qbP, idCol, qvCol, toArr(init))
    for (_ <- 2 to iters) {
      // (cid, dim)-keyed exact integer sums -> k·dims rows -> per-cid arrays.
      // array_sort on (pos, val) structs restores dimension order: pos is
      // unique per cid, so the sort is total and val never breaks a tie.
      // posexplode_outer + null filter, not posexplode: a non-outer Generate
      // lets InferFiltersFromGenerate push size(qv)>0 toward the source as a
      // per-row filter that re-evaluates the quantization (the p04 trap;
      // caught here by plan audit — codes are never null anyway).
      val cents = assigned
        .select(col("cid"), posexplode_outer(col(qvCol)).as(Seq("pos", "v")))
        .filter(col("pos").isNotNull)
        .groupBy("cid", "pos").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n")).as("val")))).as("pv"))
        .select(col("cid"), transform(col("pv"), x => x.getField("val")).as("ce"))
      assigned = assignOnce(qbP, idCol, qvCol, toArr(cents))
    }
    assigned
  }

  /** Deterministic mini-batch k-means (Sculley 2010's update schedule with
    * the RNG replaced by id-deterministic batches, and the per-center
    * learning-rate recurrence replaced by its closed form): round r assigns
    * ONLY batch r (`id % batches == r`) against the current centroids, then
    * every touched centroid becomes Σ(batch sums so far) / Σ(counts so far)
    * — cumulative EXACT int64 statistics, which is precisely what Sculley's
    * 1/n_c step-size telescopes to, so the whole trajectory is
    * partition-independent and oracle-replicable. A centroid no batch has
    * touched keeps its seed. The final pass assigns the whole corpus with
    * the last centroids.
    *
    * Why this exists next to [[assignments]]: a full Lloyd round scans the
    * corpus per iteration — at 100 TB, k in the thousands and tens of
    * rounds is unaffordable. Here each update round scans corpus/batches
    * rows (the batch predicate prunes at the scan), the update shuffle is
    * still only (cid, dim) integer partials, and the corpus-wide work is
    * ONE final shuffle-free assignment pass. With batches = 1 this
    * degenerates to exactly one Lloyd iteration ([[assignments]] with
    * iters = 2) — the spec pins that equivalence. Production batching would
    * hash the id first; the modulo keeps the oracle's arithmetic plain. */
  def miniBatchAssignments(qb: DataFrame, idCol: String, qvCol: String,
                           k: Int, batches: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(batches >= 1, s"batches must be >= 1, got $batches")
    val qbP =
      if (qb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.util.PersistScope.track(
          qb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else qb
    // limit(k): no-op on the id-predicate seed set, makes the k-bound
    // machine-visible (maxRows) to PlanGuard's corpus-lineage check.
    val init = qbP.filter(col(idCol) < k).limit(k)
      .select(col(idCol).as("cid"), transform(col(qvCol), v => v.cast("double")).as("ce"))
    var cents = init
    // Cumulative (cid, pos) -> (Σv, Σ1) exact integer stats across batches;
    // persisted per round so round r+1 extends r's frame instead of
    // replaying every earlier batch's assignment from the scan.
    var stats: DataFrame = null
    for (r <- 0 until batches) {
      val batch = qbP.filter(pmod(col(idCol), lit(batches)) === r)
      val delta = assignOnce(batch, idCol, qvCol, toArr(cents))
        .select(col("cid"), posexplode_outer(col(qvCol)).as(Seq("pos", "v")))
        .filter(col("pos").isNotNull)
        .groupBy("cid", "pos").agg(sum("v").as("s"), count(lit(1)).as("n"))
      stats = graft.util.PersistScope.track(
        (if (stats == null) delta
         else stats.unionByName(delta)
           .groupBy("cid", "pos").agg(sum("s").as("s"), sum("n").as("n")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // Touched centroids: the exact rational cumulative mean, dimension
      // order restored by the (pos, val) struct sort (pos unique per cid).
      // Untouched centroids keep the seed via the whole-array coalesce —
      // per-position mixing can't occur because a touched cid has every pos.
      val ceStats = stats
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n")).as("val")))).as("pv"))
        .select(col("cid"), transform(col("pv"), x => x.getField("val")).as("ce2"))
      cents = init.join(ceStats, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ce2"), col("ce")).as("ce"))
    }
    // Alongside the float dist2, emit the EXACT integer distance to the
    // assigned centroid, scaled by its count: dist2n = Σ(qv_i·n_c − s_c,i)²
    // = n_c²·dist2 with every term an int64. The float d2 drives the argmin
    // (centroid ulp-ties are astronomically unlikelier than rounding-
    // boundary hits), but anything EMITTED cross-engine must be exact —
    // round(d2, 4) hit a half-midpoint at sf0.001 where Spark and DuckDB
    // round() disagree by one ulp. Untouched centroids are their integer
    // seed with n = 1.
    val exactCents = {
      val fromStats = stats.groupBy("cid").agg(
        array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"),
        min("n").as("__nc")) // n is constant across pos within a cid
        .select(col("cid"), transform(col("ps"), x => x.getField("s")).as("__sa"),
          col("__nc"))
      // limit(k): no-op — one row per cid and cids come from the k-row
      // init frame — but the left join erases init's maxRows, so the
      // k-bound must be re-asserted for PlanGuard's corpus-lineage check.
      init.select(col("cid"), transform(col("ce"), v => v.cast("long")).as("__sa0"))
        .join(fromStats, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("__sa"), col("__sa0")).as("__sa"),
          coalesce(col("__nc"), lit(1L)).as("__nc"))
        .limit(k)
    }
    assignOnce(qbP, idCol, qvCol, toArr(cents))
      .join(broadcast(exactCents), Seq("cid"))
      .withColumn("dist2n", aggregate(zip_with(col(qvCol), col("__sa"),
        (x, sc) => (x.cast("long") * col("__nc") - sc) * (x.cast("long") * col("__nc") - sc)),
        lit(0L), (acc, v) => acc + v))
      .select(col(idCol), col(qvCol), col("cid"), col("dist2"),
        col("__nc").as("nc"), col("dist2n"))
  }

  /** Bucketed (non-broadcast) assignment — the large-k escape hatch for
    * [[assignments]]' one-row broadcast centroid array, which stops working
    * somewhere around k ≈ 10⁴–10⁵ (the broadcast and the per-row O(k·dims)
    * fold both blow up). Classic IVF two-level structure:
    *
    *  1. COARSE cells: the centroids whose `cid % cellStep == 0` (m = k/cellStep
    *     of them — this small set IS broadcast-bounded; two levels buy
    *     k up to m × broadcast-bound).
    *  2. Each centroid joins its nearest coarse cell — in-row argmin over the
    *     broadcast coarse array; the resulting (cell, cid, ce) frame stays
    *     DISTRIBUTED (k rows, never collected, never broadcast).
    *  3. Each vector probes its `nprobe` nearest cells (same broadcast
    *     coarse array, in-row sort + slice — no shuffle).
    *  4. One CELL-KEYED equi-join meets vectors only with the centroids in
    *     their probed cells, then a per-vector min(struct(d2, cid)) partial
    *     aggregation picks the winner (map-side combine; the shuffle carries
    *     one row per vector, not per candidate pair).
    *
    * Approximate by construction (exact iff nprobe = m) — the determinism
    * contract is that BOTH engines walk the identical probe set, so the
    * result is still bitwise oracle-checkable. All distances are exact int64
    * over int-code arrays; ties break on min cid, min cell. Popular cells
    * skew the equi-join — AQE skew-join splitting (on in every session here)
    * or `Skew.saltedJoin` handles that without changing semantics. */
  def bucketedAssignments(cents: DataFrame, qb: DataFrame, idCol: String,
                          qvCol: String, cellStep: Int, nprobe: Int): DataFrame = {
    require(cellStep >= 1, s"cellStep must be >= 1, got $cellStep")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val coarseArr = coarseCellArray(cents, cellStep)
    // centroid -> its one cell (every coarse center lands in its own cell at
    // distance 0, so no cell is empty and every probe finds candidates)
    val centCell = cents.crossJoin(broadcast(coarseArr))
      .withColumn("__best", array_min(transform(col("__gs"),
        g => struct(int8Dist2(col("ce"), g.getField("ge")).as("d2"),
          g.getField("cell").as("cell")))))
      .select(col("__best.cell").as("cell"), col("cid"), col("ce"))
    probeCells(cents, qb, idCol, qvCol, cellStep, nprobe).join(centCell, "cell")
      .withColumn("__d2", int8Dist2(col(qvCol), col("ce")))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d2").as("d2"), col("cid").as("cid"),
        col("cell").as("cell"))).as("__b"))
      .select(col(idCol), col("__b.cid").as("cid"), col("__b.d2").as("dist2"),
        col("__b.cell").as("cell"))
  }

  /** The sorted coarse-cell array (one row, k/cellStep structs) both halves
    * of the two-level structure broadcast: cells = centroids with
    * cid % cellStep == 0. This is the ONLY broadcast-bounded piece. */
  private def coarseCellArray(cents: DataFrame, cellStep: Int): DataFrame =
    cents.filter(col("cid") % cellStep === 0)
      .agg(array_sort(collect_list(struct(col("cid").as("cell"), col("ce").as("ge"))))
        .as("__gs"))

  /** Step 3 of [[bucketedAssignments]] standing alone — the QUERY side of
    * an IVF search over a bucketed index: each vector in `qb` probes its
    * `nprobe` nearest coarse cells (exact int64 dist² against the broadcast
    * coarse array, in-row sort + slice, ties on min cell; no shuffle, no
    * k-sized anything). Returns one row per (vector, probed cell):
    * (idCol, qvCol, cell). Exposed so searches can compose the same probe
    * set the assignment used (x80 composes this with the x70 assignment). */
  def probeCells(cents: DataFrame, qb: DataFrame, idCol: String,
                 qvCol: String, cellStep: Int, nprobe: Int): DataFrame = {
    require(cellStep >= 1, s"cellStep must be >= 1, got $cellStep")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    qb.crossJoin(broadcast(coarseCellArray(cents, cellStep)))
      .withColumn("__near", slice(array_sort(transform(col("__gs"),
        g => struct(int8Dist2(col(qvCol), g.getField("ge")).as("d2"),
          g.getField("cell").as("cell")))), 1, nprobe))
      .select(col(idCol), col(qvCol),
        explode(transform(col("__near"), x => x.getField("cell"))).as("cell"))
  }

  /** Deterministic k-center greedy (farthest-point / Gonzalez) seeding over
    * int-code vectors: seed 1 = the min-id vector; each later seed = the
    * vector FARTHEST (exact int64 dist²) from its nearest already-chosen
    * seed, min-id tie-break. The k-means++ family's deterministic cousin —
    * same spread intuition, a 2-approximation for the k-center objective,
    * and no RNG, so it is oracle-checkable and retry-stable.
    *
    * Scale shape: k rounds, each = one broadcast of the latest seed, an
    * in-row running-min distance update over the persisted distance frame,
    * and a global top-1 (TakeOrdered — a tree reduce, never a corpus
    * shuffle). Exact greedy is inherently k sequential passes; for k in the
    * thousands switch to k-means||-style oversampling (one pass drawing
    * many candidates per round) — the per-round machinery here composes
    * unchanged. Returns (rank, id, dist2_at_pick), where dist2_at_pick is
    * the seed's distance to its nearest predecessor (0 for the first).
    *
    * Honest size: when fewer than k DISTINCT vectors exist, the greedy
    * winner's distance hits 0 (the only way a post-round-1 winner can be at
    * distance 0 is to coincide with an already-chosen seed), and every
    * later round would re-pick that same min-id duplicate. Those rounds are
    * filtered out, so the result has one row per distinct seed actually
    * found — possibly fewer than k — with contiguous ranks, instead of k
    * rows padded with silent duplicates. */
  def kCenterSeeds(qb: DataFrame, idCol: String, qvCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qbP =
      if (qb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.util.PersistScope.track(
          qb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else qb
    val first = qbP.orderBy(col(idCol)).limit(1)
    val picks = scala.collection.mutable.ArrayBuffer[DataFrame](
      first.select(lit(1).as("rank"), col(idCol), lit(0L).as("dist2_at_pick")))
    // Running (id, qv, nearest-seed dist²) state; each round's frame is
    // persisted so round r+1's update reads r's result instead of replaying
    // the whole chain from the scan (the lineage would otherwise double the
    // work per round).
    var dists = graft.util.PersistScope.track(
      qbP.crossJoin(broadcast(first.select(col(qvCol).as("__c"))))
        .select(col(idCol), col(qvCol),
          int8Dist2(col(qvCol), col("__c")).as("__d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    for (r <- 2 to k) {
      val next = dists.orderBy(col("__d").desc, col(idCol)).limit(1)
      picks += next.select(lit(r).as("rank"), col(idCol), col("__d").as("dist2_at_pick"))
      if (r < k) {
        dists = graft.util.PersistScope.track(
          dists.crossJoin(broadcast(next.select(col(qvCol).as("__c"))))
            .select(col(idCol), col(qvCol),
              least(col("__d"), int8Dist2(col(qvCol), col("__c"))).as("__d"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      }
    }
    // Duplicate rounds are lazy no-ops (a 0-distance pick equals an
    // existing seed, so the running-min update changes nothing) — dropping
    // them here needs no per-round driver action to detect exhaustion.
    picks.reduce(_ unionByName _)
      .filter(col("rank") === 1 || col("dist2_at_pick") > 0)
  }

  /** Deterministic k-means|| oversampled seeding — the large-k path x45's
    * exact greedy documents: instead of one farthest point per pass, each
    * round INDEPENDENTLY admits every point whose hash priority falls under
    * l·d²(x)/cost(X) (the k-means|| admission probability with the RNG
    * replaced by the portable md5 hash, so the draw is deterministic,
    * partition-independent, and oracle-replicable). Expected ~l candidates
    * per round regardless of corpus size; `rounds` rounds ≈ O(log n) in the
    * paper, 2 suffices for a well-spread oversample here. Already-admitted
    * points (and the seed) have running d² = 0 ⇒ admission threshold 0 ⇒
    * never re-admitted.
    *
    * Returns every center with its round and WEIGHT (how many corpus points
    * are nearest to it, min-(d², id) tie-break) — the weighted candidate
    * set the final small local clustering consumes, per the k-means||
    * paper's reduce step.
    *
    * Scale shape per round: one integer-sum reduce (cost), one broadcast of
    * the candidate array, one in-row running-min update — no corpus
    * shuffle; the weight pass is one broadcast argmin + a center-keyed
    * count. */
  def parallelSeeds(qb: DataFrame, idCol: String, qvCol: String,
                    l: Double, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val qbP =
      if (qb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.util.PersistScope.track(
          qb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else qb
    val c0 = qbP.orderBy(col(idCol)).limit(1)
    var centers = c0.select(col(idCol), col(qvCol), lit(0).as("round"))
    var dists = graft.util.PersistScope.track(
      qbP.crossJoin(broadcast(c0.select(col(qvCol).as("__c"))))
        .select(col(idCol), col(qvCol), int8Dist2(col(qvCol), col("__c")).as("__d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    for (r <- 1 to rounds) {
      val cost = dists.agg(sum("__d").as("__cost"))
      val cand = graft.util.PersistScope.track(
        dists.crossJoin(broadcast(cost))
          .filter(Sketches.bucket(col(idCol).cast("string"), lit(r), 65536).cast("double")
            / 65536.0 < lit(l) * col("__d") / col("__cost"))
          .select(col(idCol), col(qvCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      centers = centers.unionByName(cand.select(col(idCol), col(qvCol), lit(r).as("round")))
      if (r < rounds) {
        // empty-candidate round: transform over the empty collected array
        // yields an empty array, array_min null, coalesce keeps d — the
        // same semantics as the oracle's left-join + coalesce.
        val candArr = cand.agg(collect_list(col(qvCol)).as("__cs"))
        dists = graft.util.PersistScope.track(
          dists.crossJoin(broadcast(candArr))
            .select(col(idCol), col(qvCol),
              least(col("__d"), coalesce(array_min(transform(col("__cs"),
                c => int8Dist2(col(qvCol), c))), col("__d"))).as("__d"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      }
    }
    val centArr = centers.agg(
      collect_list(struct(col(idCol).as("cid"), col(qvCol).as("ce"))).as("__cs"))
    val best = array_min(transform(col("__cs"),
      c => struct(int8Dist2(col(qvCol), c.getField("ce")).as("d2"),
        c.getField("cid").as("cid"))))
    val weights = qbP.crossJoin(broadcast(centArr))
      .select(col(idCol), best.getField("cid").as("__w_cid"))
      .groupBy("__w_cid").agg(count(lit(1)).as("__w"))
    centers.join(weights, centers(idCol) === weights("__w_cid"), "left")
      .select(centers(idCol), col("round"),
        coalesce(col("__w"), lit(0L)).cast("long").as("weight"))
  }
}
