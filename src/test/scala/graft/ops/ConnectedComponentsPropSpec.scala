package graft.ops

import graft.SparkSpec

/** Property: the distributed min-label propagation agrees with a driver-side
  * union-find on arbitrary small graphs — chains, stars, cliques, forests,
  * self-contained cycles, whatever the seeded generator produces. The oracle
  * query (x21) checks one concrete graph; this covers the shape space. */
class ConnectedComponentsPropSpec extends SparkSpec {

  /** Reference union-find: component = min node id. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("min-label propagation == union-find on 25 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(23)  // node universe
      val m = 1 + rnd.nextInt(30)  // edge attempts
      val edges = (1 to m).flatMap { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) None else Some((math.min(a, b), math.max(a, b)))
      }.distinct
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        val got = Dedup.connectedComponents(edges.toDF("id1", "id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.util.PersistScope.releaseAll()
        assert(got == expected, s"trial $trial (n=$n, edges=$edges)")
      }
    }
  }

  test("deep chain converges within the iteration cap (pointer jumping)") {
    import spark.implicits._
    // a 40-node path has diameter 39: plain neighbor propagation moves the
    // min ONE hop per round and silently truncated chains like this at the
    // cap (the bug this spec caught); pointer jumping covers 2^15 diameter
    val chain = (0L until 39L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.PersistScope.releaseAll()
    assert(got == (0L to 39L).map(_ -> 0L).toMap)
  }

  test("large-star/small-star == union-find on 12 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(420260812L)
    for (trial <- 1 to 12) {
      val n = 2 + rnd.nextInt(23)
      val m = 1 + rnd.nextInt(30)
      val edges = (1 to m).flatMap { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) None else Some((math.min(a, b), math.max(a, b)))
      }.distinct
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        val got = Dedup.connectedComponentsStar(edges.toDF("id1", "id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.util.PersistScope.releaseAll()
        assert(got == expected, s"trial $trial (n=$n, edges=$edges)")
      }
    }
  }

  test("star variant handles deep chains, reversed duplicates, and high hubs") {
    import spark.implicits._
    // 50-node path, diameter 49 — the shape the star form exists for.
    val chain = (0L until 49L).map(i => (i, i + 1))
    val gotChain = Dedup.connectedComponentsStar(chain.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.PersistScope.releaseAll()
    assert(gotChain == (0L to 49L).map(_ -> 0L).toMap)
    // star through a LARGER hub + a reversed duplicate edge: both variants
    // must agree on the same labels.
    val messy = Seq((1L, 9L), (2L, 9L), (9L, 1L), (20L, 21L))
    val gotStar = Dedup.connectedComponentsStar(messy.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotProp = Dedup.connectedComponents(messy.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.PersistScope.releaseAll()
    assert(gotStar == Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 20L -> 20L, 21L -> 20L))
    assert(gotStar == gotProp)
  }
}
