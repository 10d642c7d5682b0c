package graft.ops

import graft.SparkSpec

/** kCenterSeeds vs an independent in-memory Gonzalez implementation: same
  * picks, same distances, on a seeded random corpus — including the
  * keep-picked-points-in-frame convention (a picked point's running
  * distance collapses to 0, so it can never win a later round). */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def d2(a: Seq[Int], b: Seq[Int]): Long =
    a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum

  private def reference(vecs: Seq[(Long, Seq[Int])], k: Int): Seq[(Int, Long, Long)] = {
    val byId = vecs.sortBy(_._1)
    val dists = scala.collection.mutable.Map(byId.map(v => v._1 -> d2(v._2, byId.head._2)): _*)
    val out = scala.collection.mutable.ArrayBuffer((1, byId.head._1, 0L))
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      val (nid, nd) = dists.toSeq.sortBy { case (id, dd) => (-dd, id) }.head
      // a 0-distance winner coincides with an existing seed: the distinct
      // vectors are exhausted, and the engine stops emitting rows here too
      if (nd == 0L) exhausted = true
      else {
        out += ((r, nid, nd))
        val nqv = byId.find(_._1 == nid).get._2
        byId.foreach(v => dists(v._1) = math.min(dists(v._1), d2(v._2, nqv)))
      }
    }
    out.toSeq
  }

  test("kCenterSeeds matches the in-memory Gonzalez reference") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextInt(255) - 127)))
    val got = KMeans.kCenterSeeds(vecs.toDF("id", "qv").repartition(5), "id", "qv", 6)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == reference(vecs, 6))
  }

  test("seeds are spread: each later pick is no farther than the previous") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(4)(rnd.nextInt(200) - 100)))
    val picks = KMeans.kCenterSeeds(vecs.toDF("id", "qv"), "id", "qv", 8)
      .orderBy("rank").collect().map(_.getLong(2)).drop(1)
    // greedy farthest-point distances are non-increasing
    picks.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("duplicate-only corpus returns the one honest seed, not k copies") {
    val vecs = (0L until 10L).map(i => (i, Seq(1, 2, 3)))
    val got = KMeans.kCenterSeeds(vecs.toDF("id", "qv"), "id", "qv", 3)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 0L, 0L)))
    assert(got == reference(vecs, 3))
  }

  test("k past the distinct-vector count stops at the honest seed set") {
    // 3 distinct vectors, each duplicated; k=5 must yield exactly 3 seeds
    // with contiguous ranks (the old behavior padded rounds 4-5 with
    // duplicate min-id picks at dist2_at_pick=0)
    val vecs = Seq(
      0L -> Seq(0, 0), 1L -> Seq(0, 0),
      2L -> Seq(100, 0), 3L -> Seq(100, 0),
      4L -> Seq(0, 90), 5L -> Seq(0, 90))
    val got = KMeans.kCenterSeeds(vecs.toDF("id", "qv"), "id", "qv", 5)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == Seq(1, 2, 3))
    assert(got.map(_._2).toSet == Set(0L, 2L, 4L))
    assert(got == reference(vecs, 5))
  }
}
