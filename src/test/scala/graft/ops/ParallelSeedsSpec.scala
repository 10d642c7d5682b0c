package graft.ops

import graft.SparkSpec

/** KMeans.parallelSeeds vs an independent in-memory k-means|| replication —
  * including the md5 hash-priority admission draw, the round-by-round
  * running-min updates, and the weight assignment. */
class ParallelSeedsSpec extends SparkSpec {
  import spark.implicits._

  private def d2(a: Seq[Int], b: Seq[Int]): Long =
    a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum

  /** hex4(md5(s"$seed|$x")) — the in-memory twin of Sketches.bucket. */
  private def prio(seed: Int, x: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$x".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
  }

  private def reference(vecs: Seq[(Long, Seq[Int])], l: Double,
      rounds: Int): Set[(Long, Int, Long)] = {
    val byId = vecs.sortBy(_._1)
    val seed = byId.head
    var centers = Vector((seed._1, seed._2, 0))
    var d = byId.map(v => v._1 -> d2(v._2, seed._2)).toMap
    for (r <- 1 to rounds) {
      val cost = d.values.sum
      val cand = byId.filter(v => prio(r, v._1.toString) / 65536.0 < l * d(v._1) / cost)
      centers ++= cand.map(v => (v._1, v._2, r))
      if (r < rounds && cand.nonEmpty)
        byId.foreach(v => d += v._1 -> math.min(d(v._1), cand.map(c => d2(v._2, c._2)).min))
    }
    val assign = byId.groupBy(v => centers.map(c => (d2(v._2, c._2), c._1)).min._2)
    centers.map(c => (c._1, c._3, assign.get(c._1).map(_.size.toLong).getOrElse(0L))).toSet
  }

  test("parallelSeeds matches the in-memory k-means|| replication") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(6)(rnd.nextInt(255) - 127)))
    val got = KMeans.parallelSeeds(vecs.toDF("id", "qv").repartition(7), "id", "qv",
        l = 6.0, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exp = reference(vecs, 6.0, 2)
    assert(got == exp)
    assert(got.size > 1, "expected the admission draw to pick candidates")
  }

  test("weights partition the corpus") {
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 80L).map(i => (i, Seq.fill(4)(rnd.nextInt(200) - 100)))
    val got = KMeans.parallelSeeds(vecs.toDF("id", "qv"), "id", "qv", l = 8.0, rounds = 2)
      .collect()
    assert(got.map(_.getLong(2)).sum == 80L)
  }
}
