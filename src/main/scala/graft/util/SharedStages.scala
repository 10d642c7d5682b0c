package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame

/** Cross-QUERY cache for persisted stages that several queries rebuild
  * identically: the MinHash band frame and the distinct-shingle frame over
  * the documents table are each built by three to four queries
  * (x02/x03/x21 bands; x03/x05/x21/x23 shingles). [[PersistScope]] scopes a
  * persist to ONE query's consuming action; a stage registered here instead
  * survives until the harness finishes its whole pass and calls
  * [[releaseAll]], so a suite run pays each shared computation once instead
  * of four times. At 100 TB this is the difference between re-shingling the
  * corpus per query and materializing the band/shingle tables once per
  * pipeline run (the production form writes them to a staging table).
  *
  * Keys must encode everything the plan depends on: the builder bakes in
  * the testdata dir and the owning session. `computeIfAbsent` gives
  * compute-once under Verify's concurrent query pool — a second query
  * needing the same stage blocks for the (lazy, action-free) plan build and
  * then shares the first query's frame; Spark's cache manager serves both
  * consumers from one set of blocks.
  */
object SharedStages {

  /** Per-key memo cell: the build runs inside the CELL's monitor, NOT
    * inside the ConcurrentHashMap's bin lock. computeIfAbsent's mapping
    * function must not touch the map — but stage builders DO re-enter
    * `cached` for their upstream stages (components → edges → bands/
    * shingles; kmeans → int8), and several run Spark ACTIONS. Running
    * those inside computeIfAbsent is specified as undefined behavior
    * (reentrancy on the same bin can corrupt or deadlock the map under
    * Verify's concurrent query pool). The two-phase memoizer makes the
    * map operation a cheap allocation; nested builds then recurse through
    * the map freely. Builder dependencies form a DAG, so cell-monitor
    * nesting cannot deadlock. */
  private final class Memo(build: () => DataFrame) {
    private var built: Option[DataFrame] = None
    private var released = false
    def value: DataFrame = synchronized {
      built.getOrElse {
        val df = build()
        // A release that ran while this builder was queued on the monitor
        // (or before it started) must not leave a persisted orphan: honor
        // it by unpersisting immediately — the caller still gets a correct
        // (merely uncached) frame.
        if (released) df.unpersist(blocking = false) else built = Some(df)
        df
      }
    }
    /** Unpersist the frame if built; WAITS for an in-flight build (the
      * builder holds this monitor), so releaseAll can never race a build
      * into leaking its cached blocks, and marks the cell dead so a build
      * that starts after removal cannot leak either. */
    def release(): Unit = synchronized {
      built.foreach(_.unpersist(blocking = false))
      built = None
      released = true
    }
  }

  private val cache = new ConcurrentHashMap[String, Memo]()

  /** The frame for `key`, building it (persist included — the builder's
    * job) on first use; concurrent callers of the same key block on the
    * cell and share one frame. */
  def cached(key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(key, _ => new Memo(() => build)).value

  /** Unpersist and forget every shared stage. Harnesses call this at
    * end-of-pass — and a bench additionally between its warmup and timed
    * passes, so the timed pass pays each shared computation exactly once
    * (leaving the warmup's blocks in place would time cache reads and call
    * them the cost of the pipeline). */
  def releaseAll(): Unit = {
    // release() synchronizes on each cell, so a build mid-flight when the
    // harness calls this is waited out and its blocks are freed (the old
    // peek-based sweep skipped exactly those cells, leaking their persisted
    // frames while the next cached() call rebuilt a second copy). Only one
    // cell monitor is held at a time, so builder-side monitor nesting
    // (components -> edges -> bands) cannot deadlock against this sweep.
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      it.next().getValue.release()
      it.remove()
    }
  }

  /** Number of live shared stages (spec hook). */
  def size: Int = cache.size()
}
