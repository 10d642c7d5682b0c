package graft.util

import graft.SparkSpec

/** The DISK_ONLY frames inside x03/x05 are released by the harness after the
  * consuming action — a run must leave zero NEW persisted RDDs behind
  * (round-3 leaked 1–2 frames per invocation for the session lifetime).
  * Assertions are relative to a baseline snapshot: other suites share this
  * SparkSession and may legitimately cache their own fixtures. */
class PersistScopeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("x03/x05 leave no persisted RDDs after releaseAll") {
    val baseline = persistedIds
    val persisted = Seq("x03_minhash_pairs", "x05_ngram_jaccard")
    persisted.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      val df = q(spark, sfDir)
      assert(df.count() >= 0)
      PersistScope.releaseAll()
    }
    val leaked = persistedIds -- baseline
    assert(leaked.isEmpty, s"leaked RDD ids: $leaked")
  }

  test("track returns the dataset unchanged and releaseAll is idempotent") {
    import spark.implicits._
    val baseline = persistedIds
    val ds = Seq(1, 2, 3).toDF("n")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    assert(PersistScope.track(ds) eq ds)
    ds.count()
    assert((persistedIds -- baseline).nonEmpty)
    PersistScope.releaseAll()
    PersistScope.releaseAll() // second call on empty scope is a no-op
    // unpersist(blocking=false) drops the catalog entry synchronously
    assert((persistedIds -- baseline).isEmpty)
  }

  test("scope is thread-local: one thread's release doesn't touch another's") {
    import spark.implicits._
    val baseline = persistedIds
    val ds = Seq(1).toDF("n")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    PersistScope.track(ds)
    ds.count()
    val t = new Thread(() => PersistScope.releaseAll())
    t.start(); t.join()
    assert((persistedIds -- baseline).nonEmpty,
      "sibling thread's releaseAll must not drop this thread's frames")
    PersistScope.releaseAll()
    assert((persistedIds -- baseline).isEmpty)
  }
}
