package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused one-pass hash expressions must be bit-identical to their
  * composable built-in forms (which are what the DuckDB oracles mirror). */
class HashExprSpec extends SparkSpec {

  private def toks = split(col("text"), " ")
  private def shingles = transform(sequence(lit(1), greatest(size(toks) - 2, lit(0))),
    i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)

  test("minhash_from_tokens == composable minhash over shingles == MinHashSigExpr") {
    val composable = transform(sequence(lit(0), lit(7)),
      j => array_min(transform(shingles, x => md5(concat(j.cast("string"), lit("|"), x)))))
    val rows = docs
      .withColumn("fused", MinHashFromTokensExpr.minhash_from_tokens(toks, 8))
      .withColumn("viaShingles", MinHashSigExpr.minhash_sig(shingles, 8))
      .withColumn("hof", composable)
      .select("doc_id", "fused", "viaShingles", "hof").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getSeq[String](1) == r.getSeq[String](3), s"fused != hof for doc ${r.getLong(0)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"expr != hof for doc ${r.getLong(0)}")
    }
  }

  test("lsh_bucket == composable hyperplane fold, incl. degenerate vectors") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the pre-expression composable construction (what the DuckDB twin mirrors)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, i: Int): Double = {
      val dig = md.digest(s"${p}_$i".getBytes("UTF-8"))
      if (((dig(0) & 0xff) >> 4) >= 8) 1.0 else -1.0
    }
    val hof = concat_ws("", (0 until 8).map { p =>
      val plane = array((0 until 64).map(i => lit(sign(p, i))): _*)
      when(aggregate(zip_with(col("embedding"), plane, (v, h) => v.cast("double") * h),
        lit(0.0), (acc, v) => acc + v) >= 0, "1").otherwise("0")
    }: _*)
    val rows = vecs
      .withColumn("fused", LshBucketExpr.lsh_bucket(col("embedding"), 8, 64))
      .withColumn("hof", hof)
      .select("vec_id", "fused", "hof").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getString(1) == r.getString(2), s"vec ${r.getLong(0)}")
    // degenerate: short vector -> all-zeros bucket (the null-poisoned fold's value)
    import spark.implicits._
    val short = Seq(Tuple1(Array(1.0f, -2.0f))).toDF("embedding")
      .select(LshBucketExpr.lsh_bucket(col("embedding"), 8, 64)).first().getString(0)
    assert(short == "0" * 8)
  }

  test("cosine_sim == composable fold form, bitwise") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
    def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
      val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
      dot / (na * nb)
    }
    val rows = pairs.select(
      CosineSimExpr.cosine_sim(col("a.embedding"), col("b.embedding")).as("fused"),
      hofCos(col("a.embedding"), col("b.embedding")).as("hof")).collect()
    assert(rows.nonEmpty)
    // exact double equality on purpose: same ops in same order must be bitwise equal
    for (r <- rows) assert(r.getDouble(0) == r.getDouble(1))
  }

  test("simhash32 == composable bit-count form") {
    val tokh = transform(toks, tk => md5(tk))
    val composable = concat_ws("", transform(sequence(lit(1), lit(32)), b =>
      when(aggregate(tokh, lit(0),
        (acc, h) => acc + when(h.substr(b, lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
        >= 0, "1").otherwise("0")))
    val rows = docs
      .withColumn("fused", SimHash32Expr.simhash32(toks))
      .withColumn("hof", composable)
      .select("doc_id", "fused", "hof").collect()
    for (r <- rows) assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)}")
  }

  test("rolling_fps: matches a from-scratch polynomial reference over random strings") {
    import spark.implicits._
    val M = 2147483647L
    def reference(s: String, w: Int, k: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      (0 to b.length - w).map { i =>
        (i until i + w).foldLeft(0L)((h, j) => (h * 256 + (b(j) & 0xff)) % M)
      }.distinct.sorted.take(k)
    }
    val rnd = new scala.util.Random(59L)
    // lengths straddle the window; duplicated substrings force distinct-dedup
    val strs = (0 until 60).map { i =>
      val n = rnd.nextInt(80)
      val base = Array.fill(n)((32 + rnd.nextInt(95)).toChar).mkString
      if (i % 3 == 0) base + base else base // repeated halves -> duplicate windows
    }
    for ((w, k) <- Seq((16, 4), (4, 8), (1, 2))) {
      val got = strs.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("id", "t")
        .select(col("id"), RollingFpExpr.rolling_fps(col("t"), w, k).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      for ((t, id) <- strs.zipWithIndex)
        assert(got(id.toLong) == reference(t, w, k), s"w=$w k=$k id=$id")
    }
    // SQL-registered form agrees (session registry + extension injection path)
    graft.functions.register(spark)
    val viaSql = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "t")
      .selectExpr("rolling_fps(t, 16, 4) AS f")
      .collect()(0).getSeq[Long](0).toSeq
    assert(viaSql == reference("abcdefghijklmnopqrstuvwxyz", 16, 4))
  }
}
