package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins whose build side is too big to
  * broadcast and whose key distribution is heavy-tailed (the 100 TB case AQE
  * skew-join doesn't always catch: a single hot key larger than any split
  * target).
  *
  * Salting: the probe side gets a deterministic salt in [0, n) derived from
  * the row (hash of all columns — NOT random, so the operator stays
  * deterministic and retry-safe); the build side is replicated n times with
  * every salt value. The join key becomes (key, salt), splitting each hot key
  * across n reducers. Result set is identical to the plain join.
  */
object Skew {

  /** Salted inner equi-join of `probe` (large, skewed) with `build`
    * (replicated n×). Both frames must share only the join key columns. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], n: Int): DataFrame = {
    require(n > 0)
    val salted = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(n)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
