package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKMinExpr (the bounded-heap partial top-k aggregate) vs the
  * row_number window it replaces: identical winners and order on a seeded
  * corpus spread over many partitions, so partial heaps MERGE across
  * map-side combines and the serialize/deserialize path actually runs. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk_min(struct) == row_number window, across partitions and merges") {
    val rnd = new scala.util.Random(13)
    // many groups, varied sizes incl. groups smaller than k; duplicate
    // scores force the token tiebreak
    val rows = (0 until 5000).map { i =>
      (i % 400).toLong -> (f"tok${rnd.nextInt(50)}%03d", rnd.nextInt(20) / 10.0)
    }.map { case (g, (t, s)) => (g, t, s) }
    val df = rows.toDF("g", "token", "score").repartition(16).cache()

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("token"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select("g", "token", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet

    val viaTopK = df
      .groupBy("g")
      .agg(TopK.topk_min(struct((-col("score")).as("neg"), col("token")), 3).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("g"), col("e.token"), (-col("e.neg")).as("score"),
        (col("i") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet

    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("groups smaller than k return their full membership; nulls skipped") {
    val df = Seq(
      (1L, Some("a"), 1.0), (1L, Some("b"), 2.0),
      (2L, Some("c"), 5.0), (2L, None, 9.0)).toDF("g", "token", "score")
    val got = df.groupBy("g")
      .agg(TopK.topk_min(
        when(col("token").isNotNull, struct(col("score"), col("token"))), 3).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 2, 2L -> 1))
  }

  test("SQL registration: topk_min callable from spark.sql") {
    graft.functions.register(spark)
    Seq((1L, 5.0), (1L, 1.0), (1L, 3.0), (2L, 9.0)).toDF("g", "v")
      .createOrReplaceTempView("__topk_sql")
    val got = spark.sql(
      "SELECT g, topk_min(v, 2) AS t FROM __topk_sql GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(got == Seq((1L, Seq(1.0, 3.0)), (2L, Seq(9.0))))
  }

  test("duplicate-heavy input: ties kept deterministically by full struct order") {
    val df = Seq.tabulate(100)(i => (0L, s"t${i % 5}", 1.0)).toDF("g", "token", "score")
    val got = df.groupBy("g")
      .agg(TopK.topk_min(struct(col("score"), col("token")), 3).as("top"))
      .select(explode(col("top")).as("e")).select("e.token")
      .as[String].collect().toSeq
    assert(got == Seq("t0", "t0", "t0"))
  }
}
