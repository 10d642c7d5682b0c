package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Round-16 additions: x147 generalized to Lee et al.'s L=50 convention
  * (x148) with the per-doc longest-shared-run length — the quantity the
  * paper actually cuts on — plus planted fixtures for the run-composition
  * arithmetic. The DuckDB oracle gates values separately; these specs pin
  * the hand-computable cases and the non-power-of-two path equivalence. */
class Round16QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("longest_run planted: a 17-token shared run reads 17 (two overlapping windows, one island)") {
    import spark.implicits._
    val run = (1 to 17).map(i => s"tok$i").mkString(" ") // 17 shared tokens
    val docs = Seq(
      (1L, run + " za zb zc"),        // run at offset 0
      (2L, "ya yb " + run),           // run at offset 2
      // two DISJOINT 16-token runs shared with doc 4, split by a gap ->
      // two islands, longest stays 16, shared_windows = 2
      (3L, (1 to 16).map(i => s"a$i").mkString(" ") + " gapgap " +
        (1 to 16).map(i => s"b$i").mkString(" ")),
      (4L, (1 to 16).map(i => s"a$i").mkString(" ") + " other " +
        (1 to 16).map(i => s"b$i").mkString(" ") + " tail")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.sharedRunStats(docs, "doc_id", "text",
      runTokens = 16, capTokens = 128).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // doc 1: 20 tokens -> 5 windows; windows @0 and @1 are the two
    // 16-windows inside the 17-run, both shared with doc 2 -> one island
    // of 2 -> longest_run = 2 + 15 = 17
    assert(got(1L) == ((5L, 2L, 17L, true)), s"doc1: ${got(1L)}")
    // doc 2: 19 tokens -> 4 windows; windows @2,@3 shared -> 17 again
    assert(got(2L) == ((4L, 2L, 17L, true)), s"doc2: ${got(2L)}")
    // doc 3: 33 tokens -> 18 windows; exactly @0 and @17 shared (the gap
    // token differs from doc 4's separator) -> two 1-window islands
    assert(got(3L) == ((18L, 2L, 16L, true)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((19L, 2L, 16L, true)), s"doc4: ${got(4L)}")
  }

  test("x148: in-row and doubling paths bit-identical at the NON-power-of-two L=50") {
    // Exercises the final overlapping sparse-table fold (span 32 + step 18)
    // that power-of-two L never reaches.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(via: Boolean) = graft.ops.Dedup.sharedRunStats(docs, "doc_id", "text",
      runTokens = 50, capTokens = 256, viaSuffixRanks = via).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    val a = run(false)
    val b = run(true)
    assert(a.sameElements(b))
    assert(a.count(_._5) > 0, "organic corpus has shared 50-token runs (planted clones)")
    assert(a.count(!_._5) > 0, "and unshared docs")
  }

  test("x148 organic: L=50 stats replicate a driver-side brute force") {
    val got = SparkEntry.queries("x148_substring_dedup_l50")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = scala.collection.mutable.HashMap
      .empty[Seq[String], scala.collection.mutable.HashSet[Long]]
    val perDoc = texts.map { case (id, text) =>
      val tk = text.split(" ", -1).take(256).toSeq
      val ws = (0 to tk.length - 50).map(j => tk.slice(j, j + 50))
      ws.foreach(w => wins.getOrElseUpdate(w, scala.collection.mutable.HashSet.empty) += id)
      (id, ws)
    }
    val expect = perDoc.map { case (id, ws) =>
      val shPos = ws.zipWithIndex.collect { case (w, j) if wins(w).size >= 2 => j }
      val longest =
        if (shPos.isEmpty) 0L
        else shPos.zipWithIndex.groupBy { case (p, i) => p - i }
          .values.map(_.size).max.toLong + 49L
      (id, ws.length.toLong, shPos.length.toLong, longest, shPos.nonEmpty)
    }.sortBy(_._1)
    assert(got.sameElements(expect))
    assert(got.count(_._5) > 0, "positive branch exercised at L=50")
  }

  test("s29: gate verdicts from the stored label artifact equal fresh in-session derivation") {
    val art = graft.ops.Dedup.substringLabelArtifact(spark, sf)
    assert(new java.io.File(art, "_SUCCESS").isFile, "artifact published with _SUCCESS")
    // Idempotent: a second call reuses the published artifact.
    assert(graft.ops.Dedup.substringLabelArtifact(spark, sf) == art)
    def run(path: Option[String], tag: String) = {
      val name = s"s29ab_$tag"
      val q = graft.streaming.EventStream.runSubstringGate(spark, sf, name,
        storedLabelsPath = path)
      graft.streaming.EventStream.awaitDone(q)
      q.sparkSession.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    }
    val fresh = run(None, "fresh")
    val stored = run(Some(art), "stored")
    assert(fresh.sameElements(stored))
    assert(fresh.exists(_._3), "blocked verdicts present")
    // The artifact IS the fresh derivation's label set.
    val fromArtifact = spark.read.parquet(art).collect().map(_.getString(0)).sorted
    val derived = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("source") =!= "src0")
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.Dedup.windowLabels(
          org.apache.spark.sql.functions.col("text"), 16, 128)).as("r"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(fromArtifact.sameElements(derived))
  }

  test("x150 planted: overlapping and touching runs merge into single cut spans") {
    import spark.implicits._
    val t = (0 to 18).map(i => s"t$i") // 19 shared-pool tokens
    val x = (0 to 15).map(i => s"x$i")
    val y = (0 to 15).map(i => s"y$i")
    val docs = Seq(
      // A: shared windows at pos 0 (with B) and pos 3 (with C), 1-2 unshared
      //    -> islands [0,16) and [3,19) OVERLAP -> ONE span [0,19), kept 0
      (1L, t.mkString(" ")),
      (2L, t.take(16).mkString(" ")),          // B = A[0..15]
      (3L, t.drop(3).mkString(" ")),           // C = A[3..18]
      // D: X++Y, windows @0 (=X, shared with E) and @16 (=Y, shared with F),
      //    boundary-crossing windows unshared -> ranges [0,16) and [16,32)
      //    TOUCH -> one contiguous span [0,32), kept 0
      (4L, (x ++ y).mkString(" ")),
      (5L, x.mkString(" ")),                   // E = X
      (6L, y.mkString(" ")),                   // F = Y
      // G: no sharing -> absent from the manifest
      (7L, (1 to 20).map(i => s"g$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.sharedRunManifest(docs, "doc_id", "text",
      runTokens = 16, capTokens = 128).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(r => (r._1, r._2))
    val expect = Array(
      (1L, 1L, 0L, 19L, 19L, 19L, 0L),
      (2L, 1L, 0L, 16L, 16L, 16L, 0L),
      (3L, 1L, 0L, 16L, 16L, 16L, 0L),
      (4L, 1L, 0L, 32L, 32L, 32L, 0L),
      (5L, 1L, 0L, 16L, 16L, 16L, 0L),
      (6L, 1L, 0L, 16L, 16L, 16L, 0L))
    assert(got.sameElements(expect), got.mkString(", "))
  }

  test("x150 organic: cut spans replicate a driver-side interval-union brute force") {
    val got = SparkEntry.queries("x150_substring_cut_manifest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(r => (r._1, r._2))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = scala.collection.mutable.HashMap
      .empty[Seq[String], scala.collection.mutable.HashSet[Long]]
    val perDoc = texts.map { case (id, text) =>
      val tk = text.split(" ", -1).take(128).toSeq
      val ws = (0 to tk.length - 16).map(j => tk.slice(j, j + 16))
      ws.foreach(w => wins.getOrElseUpdate(w, scala.collection.mutable.HashSet.empty) += id)
      (id, tk.length, ws)
    }
    val expect = perDoc.flatMap { case (id, n, ws) =>
      val shPos = ws.zipWithIndex.collect { case (w, j) if wins(w).size >= 2 => j }
      // interval union of [p, p+16) over shared positions
      val spans = shPos.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p <= e0 => (s0, math.max(e0, p + 16)) :: rest
        case (acc, p) => (p, p + 16) :: acc
      }.reverse
      val cut = spans.map { case (s0, e0) => e0 - s0 }.sum
      spans.zipWithIndex.map { case ((s0, e0), i) =>
        (id, (i + 1).toLong, s0.toLong, e0.toLong, (e0 - s0).toLong, n.toLong, (n - cut).toLong)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.sameElements(expect))
    assert(got.nonEmpty, "manifest has organic rows (planted clones)")
    // cross-check: manifest docs == x147's flagged docs
    val flagged = SparkEntry.queries("x147_substring_dedup")(spark, sf).collect()
      .collect { case r if r.getBoolean(4) => r.getLong(0) }.toSet
    assert(got.map(_._1).toSet == flagged)
  }

  test("rrfFuse planted: consensus rank-2 outranks either list's rank-1") {
    import spark.implicits._
    // doc 7 is rank 2 in BOTH lists; each list's rank 1 is absent from
    // the other — the case where fusion must beat either signal alone:
    // 2·floor(1e9/62) = 32_258_064 > floor(1e9/61) = 16_393_442.
    val lex = Seq((1L, 100L, 1), (1L, 7L, 2), (1L, 3L, 3)).toDF("qid", "doc_id", "rank")
    val sem = Seq((1L, 200L, 1), (1L, 7L, 2), (1L, 4L, 3)).toDF("qid", "doc_id", "rank")
    val got = graft.ops.RetrievalQueries.rrfFuse(lex, sem).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    // (rank, doc_id, rrf_nano, rank_lex, rank_sem)
    assert(got(0) == ((1L, 7L, 32258064L, 2L, 2L)), s"winner: ${got(0)}")
    // the two solo rank-1s tie on score; doc_id breaks the tie
    assert(got(1) == ((2L, 100L, 16393442L, 1L, 0L)))
    assert(got(2) == ((3L, 200L, 16393442L, 0L, 1L)))
    // solo rank-3s trail: floor(1e9/63) = 15_873_015
    assert(got(3) == ((4L, 3L, 15873015L, 3L, 0L)))
    assert(got(4) == ((5L, 4L, 15873015L, 0L, 3L)))
  }

  test("x149 organic: fused scores are the exact snapped sum of the input ranks") {
    val rows = SparkEntry.queries("x149_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    def snap(rank: Long): Long = if (rank == 0) 0L else math.floor(1e9 / (60 + rank)).toLong
    rows.foreach { case (_, rank, _, nano, rl, rs) =>
      assert(rank >= 1 && rank <= 10)
      assert(nano == snap(rl) + snap(rs), s"rrf_nano mismatch: $nano vs ${snap(rl) + snap(rs)}")
      assert(rl > 0 || rs > 0)
    }
    assert(rows.exists(_._5 > 0), "lexical side contributes")
    assert(rows.exists(_._6 > 0), "semantic side contributes")
    // per qid, ranks are dense from 1 and scores non-increasing
    rows.groupBy(_._1).foreach { case (_, rs0) =>
      val sorted = rs0.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }
}
