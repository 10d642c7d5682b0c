package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture specs for the retrieval/audit family (x109–x111). */
class RetrievalQueriesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, tx) => (id, tx, "en", "s0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("x109 vocab growth: cumulative counts reconcile with the corpus totals") {
    val rows = SparkEntry.queries("x109_vocab_growth")(spark, "/root/testdata/sf0.001")
      .orderBy("bucket").collect()
    assert(rows.length == 10)
    // monotone cumulative columns
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2)
        && a.getLong(3) <= b.getLong(3))
    }
    // final cumulative row equals corpus-wide totals
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions._
    val nDocs = docs.count()
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    val last = rows.last
    assert(last.getLong(1) == nDocs)
    assert(last.getLong(2) == toks.count())
    assert(last.getLong(3) == toks.distinct().count())
    // new_tokens sums to the distinct vocabulary
    assert(rows.map(_.getLong(4)).sum == last.getLong(3))
  }

  test("x110 BM25: tf raises score, doc length penalizes, query doc excluded") {
    // query doc 0 (0 % 97 == 0) emits its tokens; candidates differ in tf/dl.
    val dir = tmpDir("bm25")
    writeDocs(dir, Seq(
      0L -> "apple banana",
      1L -> "apple apple apple",             // high tf, short
      2L -> "apple apple apple pad pad pad pad pad pad", // same tf, longer
      3L -> "apple",                          // tf 1, shortest
      4L -> "cherry cherry cherry"))          // no query terms
    val got = SparkEntry.queries("x110_bm25_search")(spark, dir)
      .orderBy("qid", "rank").collect()
    val forQ0 = got.filter(_.getLong(0) == 0L)
    // doc 4 never scores (no overlap); doc 0 excluded as the query itself
    assert(!forQ0.exists(_.getLong(2) == 4L) && !forQ0.exists(_.getLong(2) == 0L))
    val ranked = forQ0.map(_.getLong(2)).toSeq
    // BM25 ordering on this fixture: doc1 (3x apple, dl 3) first; the
    // length penalty then drops doc2 (3x apple but dl 9) below even doc3
    // (1x apple, dl 1) — hand-checked: 0.469 > 0.408 > 0.342.
    assert(ranked == Seq(1L, 3L, 2L))
    assert(forQ0.forall(_.getDouble(3) > 0.0))
  }

  test("x111 candidate degree: clone triple lands in bucket 2, loner in bucket 0") {
    val clone = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = tmpDir("degree")
    writeDocs(dir, Seq(
      1L -> clone, 2L -> clone, 3L -> clone,  // 3-clique of band collisions
      4L -> "completely different words about ships and harbors tonight"))
    val got = SparkEntry.queries("x111_candidate_degree")(spark, dir)
      .orderBy("ord").collect()
    assert(got.length == 7)
    val byBucket = got.map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byBucket("2") == (3L, 2L)) // each clone has exactly 2 partners
    assert(byBucket("0")._1 == 1L)    // the loner
    assert(got.map(_.getLong(2)).sum == 4L)
  }
}
