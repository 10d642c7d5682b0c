package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Round-15 addition: x147 (exact substring dedup at suffix granularity —
  * Lee et al. 2022's criterion). Planted fixtures with hand-computable
  * expectations, a driver-side brute-force replication on organic data,
  * and the in-row vs prefix-doubling path equivalence — the DuckDB oracle
  * gates values separately. */
class Round15QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def runStats(df: org.apache.spark.sql.DataFrame, via: Boolean) =
    graft.ops.Dedup.sharedRunStats(df, "doc_id", "text",
      runTokens = 16, capTokens = 128, viaSuffixRanks = via)

  test("x147 planted: cross-doc run flags, self-repeat does not, offsets don't matter") {
    import spark.implicits._
    val run = (1 to 16).map(i => s"tok$i").mkString(" ") // the shared 16-token run
    val docs = Seq(
      // 1: run at offset 0 + 4 trailing tokens -> 5 windows, all 5 inside
      // the run's coverage? No: windows STARTING in [0..4] overlap the run
      // region; only window 0 equals the planted run exactly. Shared
      // windows = the ones equal to a window in doc 2: doc 2 carries the
      // run at offset 3, so windows 0..4 of doc 1 = windows 3..7 of doc 2
      // shifted — those need the NEIGHBORING tokens equal too. Only the
      // pure run window (16 exact tokens) is common by construction.
      (1L, run + " za zb zc zd"),
      // 2: same run at a different offset (3 leading tokens)
      (2L, "ya yb yc " + run),
      // 3: repeats ITS OWN 16-token phrase twice, shared with nobody —
      //    cross-doc flag must stay false
      (3L, (1 to 16).map(i => s"self$i").mkString(" ") + " mid " +
        (1 to 16).map(i => s"self$i").mkString(" ")),
      // 4: 15 tokens only -> zero windows
      (4L, (1 to 15).map(i => s"short$i").mkString(" ")),
      // 5: no overlap with anyone
      (5L, (1 to 20).map(i => s"lone$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = runStats(docs, via = false).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // doc 1: 20 tokens -> 5 windows; exactly window@0 (the run) is shared;
    // one island of one window -> longest_run = 16
    assert(got(1L) == ((5L, 1L, 16L, true)), s"doc1: ${got(1L)}")
    // doc 2: 19 tokens -> 4 windows; exactly window@3 (the run) is shared
    assert(got(2L) == ((4L, 1L, 16L, true)), s"doc2: ${got(2L)}")
    // doc 3: 33 tokens -> 18 windows, none shared cross-doc
    assert(got(3L) == ((18L, 0L, 0L, false)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L, false)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((5L, 0L, 0L, false)), s"doc5: ${got(5L)}")
  }

  test("x147: in-row and prefix-doubling suffix-rank paths are bit-identical on organic data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = runStats(docs, via = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    val b = runStats(docs, via = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.count(_._5) > 0, "organic corpus has shared runs (planted clones)")
    assert(a.count(!_._5) > 0, "and unshared docs")
  }

  test("x147 organic: flags replicate a driver-side brute-force window count") {
    val got = SparkEntry.queries("x147_substring_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = scala.collection.mutable.HashMap
      .empty[Seq[String], scala.collection.mutable.HashSet[Long]]
    val perDoc = texts.map { case (id, text) =>
      val tk = text.split(" ", -1).take(128).toSeq
      val ws = (0 to tk.length - 16).map(j => tk.slice(j, j + 16))
      ws.foreach(w => wins.getOrElseUpdate(w, scala.collection.mutable.HashSet.empty) += id)
      (id, ws)
    }
    val expect = perDoc.map { case (id, ws) =>
      val shPos = ws.zipWithIndex.collect { case (w, j) if wins(w).size >= 2 => j }
      val longest =
        if (shPos.isEmpty) 0L
        else shPos.zipWithIndex.groupBy { case (p, i) => p - i }
          .values.map(_.size).max.toLong + 15L
      (id, ws.length.toLong, shPos.length.toLong, longest, shPos.nonEmpty)
    }.sortBy(_._1)
    assert(got.sameElements(expect))
    assert(got.count(_._5) > 0, "positive branch exercised")
  }

  test("x147: invariants — shared_windows <= n_windows, short docs zero out") {
    val rows = SparkEntry.queries("x147_substring_dedup")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getBoolean(4) == (r.getLong(2) > 0))
      // a shared island of k windows spans k+15 tokens, bounded by the cap
      assert(r.getLong(3) <= (if (r.getLong(2) > 0) r.getLong(2) + 15 else 0L))
      assert((r.getLong(3) > 0) == r.getBoolean(4))
    }
  }

  test("s29 organic: gate verdicts replicate a driver-side stored-corpus window check") {
    val got = SparkEntry.queries("s29_stream_substring_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def windows(text: String): Seq[Seq[String]] = {
      val tk = text.split(" ", -1).take(128).toSeq
      (0 to tk.length - 16).map(j => tk.slice(j, j + 16))
    }
    val stored = texts.filter(_._2 != "src0").flatMap(t => windows(t._3)).toSet
    val expect = texts.filter(_._2 == "src0").map { case (id, _, text) =>
      val ws = windows(text)
      val hits = ws.distinct.count(stored.contains)
      (id, ws.length.toLong, hits.toLong, hits == 0)
    }.sortBy(_._1)
    assert(got.sameElements(expect))
    assert(got.count(!_._4) > 0, "blocked branch exercised (planted cross-source dups)")
    assert(got.count(_._4) > 0, "admitted branch exercised")
  }

  test("s29: streamed gate agrees with the batch x147 criterion restricted to cross-source pairs") {
    // A blocked src0 doc shares a window with SOME doc; x147's flag is the
    // corpus-wide version, so blocked(s29) implies has_shared_run(x147).
    val s29 = SparkEntry.queries("s29_stream_substring_gate")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val x147 = SparkEntry.queries("x147_substring_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    s29.foreach { case (id, admitted) =>
      if (!admitted) assert(x147(id), s"doc $id blocked by s29 must be flagged by x147")
    }
  }
}
