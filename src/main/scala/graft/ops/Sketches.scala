package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable probabilistic sketches for corpus-scale frequency/membership
  * questions — the structures that replace "materialize the full distinct
  * frame" once the vocabulary/benchmark set outgrows a broadcast:
  *
  *   - Count-Min sketch: fixed `depth x width` counter grid; counts are plain
  *     integer sums, so the sketch is built with map-side combine, merges
  *     across shards/days by cell-wise addition, and is bit-deterministic on
  *     any partitioning. Point estimate = min over rows (always >= exact).
  *   - Bloom filter: `bits`-bit array packed into longs; build is a bit_or
  *     aggregation (order-independent), membership has no false negatives.
  *     Broadcast as one row, it gates expensive exact joins: at 100 TB the
  *     benchmark/dedup set is too large to broadcast exactly, but its bloom
  *     image is a fixed few MB regardless of cardinality.
  *
  * Cross-engine determinism: bucket/bit positions derive from the first 4 hex
  * chars of md5(seed|item) — the same portable-hash scheme as the MinHash
  * pipeline (OpsQueries), replicable in DuckDB SQL for the oracle gate.
  * Mirrors the reference's sampling/estimation surface (sampler.py's
  * hash-prefix ladder) generalized to sketch form.
  */
object Sketches {

  /** 1L << i lookup table — column-indexed shift without a shift-by-column
    * expression (the Scala `shiftleft` function takes only a literal count). */
  private val Masks: Column = typedLit((0 until 64).map(i => 1L << i))

  /** Portable bucket hash: first 4 hex chars of md5(seed|x) as an int in
    * [0, width). 16 bits of hash per seed — plenty for sketch widths here;
    * widen to more hex chars if a sketch ever needs > 65536 cells. */
  def bucket(x: Column, seed: Column, width: Int): Column = {
    require(width <= 65536, s"bucket width $width exceeds the 16-bit hash range")
    conv(substring(md5(concat(seed.cast("string"), lit("|"), x)), 1, 4), 16, 10)
      .cast("long") % width
  }

  /** The DuckDB replication of [[bucket]] (strpos-based hex-to-int — DuckDB
    * has no hex-string cast). `seed` and `x` are SQL fragments. */
  def bucketSql(x: String, seed: String, width: Int): String =
    s"""(list_sum(list_transform(generate_series(1, 4), i ->
          CAST(strpos('0123456789abcdef', substr(md5(($seed)::VARCHAR || '|' || ($x)), i, 1)) - 1 AS BIGINT)
          * CAST(16**(4-i) AS BIGINT))) % $width)"""

  /** Count-Min sketch of a column: the (j, bucket, bc) counter grid,
    * `depth * width` rows total regardless of input cardinality. Built
    * straight off the raw item stream (one explode x depth, map-side
    * combine) — no distinct-item frame is ever materialized, which is the
    * point of the sketch. Merge two sketches by unioning and re-summing. */
  def countMin(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items
      .select(posexplode(transform(sequence(lit(0), lit(depth - 1)),
        j => bucket(col(itemCol), j, width))).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("bc"))

  /** Point estimates for candidate items: min over the sketch's depth rows.
    * Always an upper bound on the true count; within eN of it with
    * probability 1 - (1/2)^depth for e = euler/width. */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    candidates
      .select(col(itemCol), posexplode(transform(sequence(lit(0), lit(depth - 1)),
        j => bucket(col(itemCol), j, width))).as(Seq("j", "bucket")))
      .join(cms, Seq("j", "bucket"))
      .groupBy(itemCol).agg(min("bc").as("cms_est"))

  /** Bloom filter of a column as ONE row holding `bits/64` packed longs.
    * bit_or aggregation per word => insertion-order-independent, mergeable
    * (bit_or of two filters = filter of the union). Broadcast the returned
    * frame and test with [[bloomContains]]. */
  def bloomBuild(items: DataFrame, itemCol: String, bits: Int, hashes: Int): DataFrame = {
    require(bits % 64 == 0, "bits must pack into whole longs")
    val words = bits / 64
    items
      .select(explode(transform(sequence(lit(0), lit(hashes - 1)),
        p => bucket(col(itemCol), p, bits))).as("pos"))
      .select(floor(col("pos") / 64).cast("int").as("word"),
        element_at(Masks, (col("pos") % 64).cast("int") + 1).as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("wb"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("wb")))).as("m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("m"), w), lit(0L))).as("bm"))
  }

  /** Membership test against a [[bloomBuild]] bitmap column: all `hashes`
    * bits set. No false negatives; false-positive rate ~ (1-e^{-kn/m})^k.
    * Backed by [[BloomContainsExpr]] — one digest buffer, early exit on the
    * first clear bit; the composable forall/transform HOF form it replaced
    * re-ran interpreted md5 lambdas per probe and dominated the x42 gate. */
  def bloomContains(bm: Column, x: Column, bits: Int, hashes: Int): Column =
    BloomContainsExpr.bloom_might_contain(bm, x, bits, hashes)
}
