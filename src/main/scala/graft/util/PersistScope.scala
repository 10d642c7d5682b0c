package graft.util

import org.apache.spark.sql.Dataset

/** Tracks Datasets persisted while building a query so the harness can
  * release them once the consuming action completes. Query builders return
  * lazy plans — they cannot unpersist their own intermediates (the data
  * hasn't been produced yet), and leaving them persisted leaks disk blocks
  * for the lifetime of the session (the bench invokes every query twice).
  *
  * Thread-local on purpose: Verify runs queries from a thread pool, and a
  * global registry drained after one query's action would yank frames out
  * from under another query still executing on a sibling thread. Builder
  * and action run on the same thread in every harness (Bench, Verify,
  * specs), so the scope is naturally per-query.
  */
object PersistScope {
  private val local = new ThreadLocal[java.util.ArrayDeque[Dataset[_]]] {
    override def initialValue(): java.util.ArrayDeque[Dataset[_]] =
      new java.util.ArrayDeque()
  }

  /** Register a persisted Dataset for release at the end of the current
    * query's action. Returns the Dataset unchanged for call-site chaining. */
  def track[T](ds: Dataset[T]): Dataset[T] = { local.get().push(ds); ds }

  /** Unpersist every frame tracked on this thread since the last release.
    * Non-blocking: the catalog entry is dropped synchronously (so
    * getPersistentRDDs no longer lists it); block deletion is async. */
  def releaseAll(): Unit = {
    val q = local.get()
    while (!q.isEmpty) q.pop().unpersist(blocking = false)
  }
}
