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

  test("x03/x05 leave no persisted RDDs after both scopes release") {
    SharedStages.releaseAll() // other suites may have left shared stages live
    val baseline = persistedIds
    val sharedBefore = SharedStages.size
    val persisted = Seq("x03_minhash_pairs", "x05_ngram_jaccard")
    persisted.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      val df = q(spark, sfDir)
      assert(df.count() >= 0)
      PersistScope.releaseAll()
    }
    // The band/shingle/rep frames are SHARED stages: they deliberately
    // survive per-query release (x02/x21/x115 reuse them) and the
    // rep-collapsed x03+x05 register exactly bands+shingles+repmap+repcands
    // between them...
    assert(SharedStages.size == sharedBefore + 4,
      s"expected bands+shingles+repmap+repcands as new shared stages, size=${SharedStages.size}")
    // ...until the end-of-pass release, which must drop every block.
    SharedStages.releaseAll()
    val leaked = persistedIds -- baseline
    assert(leaked.isEmpty, s"leaked RDD ids: $leaked")
  }

  test("SharedStages.cached is compute-once: same key returns the same frame") {
    import spark.implicits._
    SharedStages.releaseAll()
    val baseline = persistedIds
    var builds = 0
    def build() = {
      builds += 1
      Seq(1, 2).toDF("n").persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }
    val a = SharedStages.cached("spec-stage")(build())
    val b = SharedStages.cached("spec-stage")(build())
    assert(a eq b, "second lookup must reuse the first frame")
    assert(builds == 1)
    assert(a.count() == 2)
    SharedStages.releaseAll()
    assert(SharedStages.size == 0)
    assert((persistedIds -- baseline).isEmpty)
  }

  test("SharedStages.releaseAll racing an in-flight build leaks nothing") {
    import spark.implicits._
    SharedStages.releaseAll()
    val baseline = persistedIds
    val buildEntered = new java.util.concurrent.CountDownLatch(1)
    val releaseDone = new java.util.concurrent.CountDownLatch(1)
    val builder = new Thread(() => {
      SharedStages.cached("race-stage") {
        buildEntered.countDown()
        // Hold the build open until releaseAll has returned on the main
        // thread; under the old peek-based sweep this frame was removed
        // from the map mid-build and its blocks leaked forever.
        releaseDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
        val df = Seq(1, 2, 3).toDF("n")
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        df.count()
        df
      }
      ()
    })
    builder.start()
    buildEntered.await(30, java.util.concurrent.TimeUnit.SECONDS)
    // releaseAll either waits out the build (monitor) or marks the cell
    // dead so the build unpersists its own result on completion.
    val releaser = new Thread(() => SharedStages.releaseAll())
    releaser.start()
    Thread.sleep(100) // give releaseAll a chance to reach the cell
    releaseDone.countDown()
    releaser.join(30000)
    builder.join(30000)
    assert(SharedStages.size == 0)
    // storage cleanup is async (blocking = false): poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while ((persistedIds -- baseline).nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert((persistedIds -- baseline).isEmpty,
      s"leaked RDD ids: ${persistedIds -- baseline}")
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
