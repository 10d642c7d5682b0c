package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").limit(60).cache()

  test("dropNearDuplicates removes planted near-copies, keeps originals") {
    import spark.implicits._
    // plant near-dups: same text with one appended token, ids offset by 10000
    val copies = docs.limit(20)
      .select((col("doc_id") + 10000).as("doc_id"), concat(col("text"), lit(" extra")).as("text"))
    val corpus = docs.unionByName(copies)
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text", threshold = 0.7)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // the driver's documents table contains ORGANIC near-dups (e.g. 8≈12,
    // 0≈50 at jaccard ≥0.95) — those larger-id originals are legitimately
    // dropped too, so expect originals minus organic id2s.
    val organicDropped = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 0.7)
      .select("id2").as[Long].collect().toSet
    val originals = docs.select("doc_id").as[Long].collect().toSet
    assert((originals -- organicDropped).forall(keptIds.contains))
    assert(organicDropped.forall(id => !keptIds.contains(id)))
    assert(copies.select("doc_id").as[Long].collect().forall(id => !keptIds.contains(id)))
  }

  test("nearDuplicatePairs reports jaccard >= threshold with id1 < id2") {
    import spark.implicits._
    val copies = docs.limit(5)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val pairs = Dedup.nearDuplicatePairs(docs.unionByName(copies), "doc_id", "text", 0.99)
      .collect()
    assert(pairs.length >= 5) // exact copies all surface
    for (p <- pairs) {
      assert(p.getLong(0) < p.getLong(1))
      assert(p.getDouble(2) >= 0.99)
    }
  }

  test("short docs (<3 tokens) survive shingling: empty shingle set, no crash") {
    import spark.implicits._
    val corpus = Seq((1L, "one"), (2L, "two words"), (3L, ""), (4L, "three token doc"),
      (5L, "three token doc")).toDF("doc_id", "text")
    // shingles() must yield [] for <3 tokens, not throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    val sh = corpus.select(col("doc_id"), Dedup.shingles(Dedup.tokens(col("text"))).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L).isEmpty)
    assert(sh(4L) == Seq("three token doc"))
    val pairs = Dedup.nearDuplicatePairs(corpus, "doc_id", "text", 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((4L, 5L)))
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("embedding near-dup dedup drops planted scaled copies, keeps originals") {
    import spark.implicits._
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), v => v.cast("double")).as("e"))
      .limit(50)
    val planted = vecs.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("e"), v => v * 1.02).as("e"))
    val kept = Dedup.dropEmbeddingNearDuplicates(vecs.unionByName(planted), "vec_id", "e", 0.999)
      .select("vec_id").as[Long].collect().toSet
    val originals = vecs.select("vec_id").as[Long].collect().toSet
    assert(kept == originals) // no organic near-dups in the synthetic embeddings
    val pairs = Dedup.embeddingNearDupPairs(vecs.unionByName(planted), "vec_id", "e", 0.999)
      .collect()
    assert(pairs.length == 50)
    for (p <- pairs) {
      assert(p.getLong(1) == p.getLong(0) + 10000)
      assert(p.getDouble(2) >= 0.999)
    }
  }

  test("simhash near-dup pairs: identical texts at hamming 0, verified <= max") {
    import spark.implicits._
    val base = docs.limit(30)
    val copies = base.limit(10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val pairs = Dedup.simhashNearDupPairs(base.unionByName(copies), "doc_id", "text", maxHamming = 2)
      .collect()
    val exact = pairs.filter(r => r.getLong(1) == r.getLong(0) + 10000)
    assert(exact.length == 10) // identical text => identical simhash => hamming 0
    assert(exact.forall(_.getInt(2) == 0))
    assert(pairs.forall(_.getInt(2) <= 2))
  }

  test("x21 clusters are transitive, min-id-labeled, and never singleton") {
    val rows = graft.SparkEntry.queries("x21_dedup_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.util.PersistScope.releaseAll()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    for ((cid, members) <- byCluster) {
      assert(members.map(_._1).min == cid, s"cluster $cid label is not its min doc_id")
      assert(members.length >= 2, s"cluster $cid is a singleton — only edge endpoints enter")
      assert(members.forall(_._3 == members.length), s"cluster $cid size column wrong")
    }
    // transitivity: a doc appears in exactly one cluster
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("x20 keep gate agrees with its published thresholds") {
    val rows = graft.SparkEntry.queries("x20_repetition_quality")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val keep = r.getDouble(2) <= 0.55 && r.getDouble(3) <= 0.08
      assert(r.getBoolean(4) == keep, s"doc ${r.getLong(0)} keep flag mismatch")
    }
    assert(rows.exists(!_.getBoolean(4)), "thresholds should reject some docs")
    assert(rows.exists(_.getBoolean(4)), "thresholds should keep some docs")
  }

  test("x22 tf-idf emits exactly top-3 ranked terms per doc with positive scores") {
    val rows = graft.SparkEntry.queries("x22_tfidf")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    for ((_, perDoc) <- rows.groupBy(_._1)) {
      assert(perDoc.map(_._4).sorted.sameElements(1 to perDoc.length) && perDoc.length <= 3)
      // rank order follows tfidf desc
      val sorted = perDoc.sortBy(_._4)
      assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("x23 contamination catches a planted benchmark near-dup and nothing clean") {
    val rows = graft.SparkEntry.queries("x23_contamination")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    graft.util.PersistScope.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, c, flag) => flag == (c >= 0.5) })
    assert(rows.forall { case (id, _, _) => id >= 10 }) // benchmark excluded
    assert(rows.forall { case (_, c, _) => c >= 0.0 && c <= 1.0 })
  }

  test("connectedComponents labels a star through a larger hub as one cluster") {
    import spark.implicits._
    // 2 ~ 3 ~ 1: greedy pair-drop would keep both 1 and 2; components must not.
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val lab = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.util.PersistScope.releaseAll()
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dropNearDuplicatesTransitive keeps one representative per cluster") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (1L, base), (2L, base + " x"), (3L, base + " y"), // one near-dup cluster
      (9L, "completely different words forming another sentence entirely here now ok"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicatesTransitive(corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    graft.util.PersistScope.releaseAll()
    assert(kept == Set(1L, 9L))
  }

  test("dropExactDuplicates keeps the min-id representative") {
    import spark.implicits._
    val corpus = Seq((1L, "same text here ok"), (2L, "same text here ok"), (3L, "unique one two"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("incrementalDropList: new docs drop only against OLD matches, min dup_of") {
    import spark.implicits._
    // pairs: 10~1 and 10~2 (old), 10~11 (new-new: ignored), 12 has no pair
    val pairs = Seq((1L, 10L), (10L, 2L), (10L, 11L)).toDF("id1", "id2")
    val tags = Seq((1L, "old"), (2L, "old"), (10L, "new"), (11L, "new"), (12L, "new"))
      .toDF("doc_id", "batch")
    val got = Dedup.incrementalDropList(pairs, tags, "doc_id", "batch", newTag = "new")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // 10 drops (dup of min(1,2)=1); 11's only pair is new-new -> kept;
    // 12 untouched -> kept
    assert(got == Set((10L, true, 1L), (11L, false, -1L), (12L, false, -1L)))
  }

  test("splitManifest: every disposition and the cluster-quarantine branch fire") {
    import spark.implicits._
    // Planted topology the organic corpus lacks (its benchmark-adjacent
    // docs are all verbatim copies): cluster 5 holds benchmark doc 5 plus
    // CLEAN doc 100 (paraphrase chain) -> 100 is quarantined_by_cluster;
    // cluster 200 holds self-contaminated 200 plus clean 201; 300/301/302
    // are clean singletons spread across train/val/test by the hash.
    val assign = Seq((5L, 5L), (100L, 5L), (200L, 200L), (201L, 200L),
      (300L, 300L), (301L, 301L), (302L, 302L)).toDF("doc_id", "cluster_id")
    val ct = Seq((100L, false), (200L, true), (201L, false),
      (300L, false), (301L, false), (302L, false)).toDF("doc_id", "contaminated")
    val got = Dedup.splitManifest(assign, ct, benchBelow = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(got(100L) == ("quarantine", true))  // clean, but cluster-mate is benchmark
    assert(got(200L) == ("quarantine", false)) // self-contaminated
    assert(got(201L) == ("quarantine", true))  // clean, but cluster-mate contaminated
    assert(Seq(300L, 301L, 302L).forall(id => got(id)._1 != "quarantine" && !got(id)._2))
    assert(got.size == 6) // benchmark doc 5 excluded from the manifest
  }
}
