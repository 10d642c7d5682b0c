package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution upsert for the catalog-column dimension (J4,
  * reference: db.py:157-214 `upsert_column`): get-or-create by the natural
  * key (catalog, schema, table, column); incoming NON-NULL `data_type` /
  * `description` update the stored row, null fields leave it untouched;
  * unseen keys insert.
  *
  * The reference's row-at-a-time SQLAlchemy flush becomes one set-oriented
  * merge: full outer join on the natural key + coalesce per field. Without a
  * table format carrying a transaction log, MERGE is merge-and-swap — read
  * the current store, merge, write to a per-run staging dir, then swap it in
  * with two renames (store → .old, staging → store). The swap is not a
  * single atomic operation; crash safety comes from recovery instead: a
  * crash between the renames leaves the prior store in `.old`, which the
  * next run restores before merging (the crashed run's batch is simply
  * retried). Delta/Iceberg `MERGE INTO` does the same job transactionally
  * and file-granularly; on a real lake swap this implementation for the
  * format's MERGE and keep [[mergeColumns]] as the semantics. Single-writer:
  * concurrent upserts to one store path are a lost-update race by nature of
  * read-merge-swap — serialize writers per store. The store is a dimension
  * table (one row per catalog column — metadata-scale, not data-scale), so
  * the full rewrite stays cheap even when the scanned data is 100 TB. */
object ColumnStore {

  val Key = Seq("catalog", "schema", "table", "column")
  /** Non-key fields with coalesce-update semantics (shared with
    * [[LakeMergeBackend]]'s generated MERGE). */
  val MergedFields = Seq("data_type", "description")
  private val Fields = MergedFields

  /** Set-oriented upsert_column semantics. Incoming rows are deduplicated on
    * the natural key first (last-writer-wins within a batch is meaningless
    * for a set; the max non-null value per field is deterministic). */
  def mergeColumns(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val aggs = Fields.map(f => max(f).as(f))
    val in = incoming
      .groupBy(Key.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val ex = existing.select((Key ++ Fields).map(col): _*)
    ex.as("e").join(in.as("i"), Key, "full_outer")
      .select(Key.map(col) ++ Fields.map(f =>
        coalesce(col(s"i.$f"), col(s"e.$f")).as(f)): _*)
  }

  /** Read-merge-swap against a parquet store path. Creating, re-running with
    * identical input, and null-field inputs are all idempotent. A live store
    * exists at `path` (or is recoverable from `path + ".old"`) at every
    * point in the sequence — the prior data is never deleted before the new
    * data is in place. */
  def upsertParquet(spark: SparkSession, path: String, incoming: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val old = new Path(path + ".old")
    // Recover from a crash between the two swap renames: the store was moved
    // aside but the staging never landed. Restore it; the crashed run's
    // batch is re-merged by whichever retry runs next.
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    // Dangling staging dirs from crashed runs are plain garbage (per-run
    // suffix — never the live store). Single-writer contract makes this
    // sweep safe.
    val parent = target.getParent
    if (parent != null && fs.exists(parent)) {
      fs.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(target.getName + ".staging-"))
        .foreach(fs.delete(_, true))
    }
    val merged =
      if (fs.exists(target)) mergeColumns(spark.read.parquet(path), incoming)
      else mergeColumns(incoming.limit(0), incoming)
    val staging = new Path(path + ".staging-" + java.util.UUID.randomUUID())
    // merged still lazily reads `path`; materialize before replacing it
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a crash post-swap
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"swap failed moving store aside: $target -> $old")
    if (!fs.rename(staging, target)) {
      if (fs.exists(old)) fs.rename(old, target) // put the prior store back
      throw new java.io.IOException(s"swap failed: $staging -> $target")
    }
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Snapshot reader for a store that may be mid-swap: returns the contents
    * of SOME committed version — the pre-swap store (possibly via its
    * `.old` alias during the rename gap) or the post-swap one — never a
    * torn mix and never a spurious not-found.
    *
    * Two races are absorbed: (1) the swap's two-rename gap, where `path`
    * momentarily doesn't exist — fall through to `.old`, retry if both
    * vanish between checks; (2) the store being renamed AWAY mid-read —
    * the eager localCheckpoint materializes the snapshot inside the read
    * attempt, so the returned frame is severed from the directory and
    * cannot observe later renames; a rename racing the materialization
    * surfaces as an exception here and retries. The gap is two directory
    * renames, so the retry budget is generous overkill. */
  def readStore(spark: SparkSession, path: String, maxAttempts: Int = 50): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var last: Throwable = null
    for (_ <- 1 to maxAttempts) {
      val candidate =
        if (fs.exists(new Path(path))) Some(path)
        else if (fs.exists(new Path(path + ".old"))) Some(path + ".old")
        else None
      candidate match {
        case Some(p) =>
          try return spark.read.parquet(p).localCheckpoint(true)
          catch { case e: Exception => last = e }
        case None => // mid-gap: both names absent for a rename's duration
      }
      Thread.sleep(10)
    }
    throw new java.io.IOException(
      s"no readable store at $path after $maxAttempts attempts", last)
  }
}
