package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Round-12 additions: x129 (MinHash estimator calibration), x130
  * (per-source KS drift), x131 (inter-arrival burstiness). Each checked
  * against a DRIVER-SIDE exact replication (BigInt arithmetic, no Spark)
  * or organic invariants the construction guarantees — independent of the
  * DuckDB oracle, which gates values separately. */
class Round12QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x129: estimator table invariants + pair mass equals rep-candidate count") {
    val rows = graft.SparkEntry.queries("x129_minhash_accuracy")(spark, sf).collect()
    assert(rows.nonEmpty)
    var mass = 0L
    for (r <- rows) {
      val est = r.getAs[Long]("est_matches")
      val mn = r.getAs[Double]("min_jaccard")
      val mean = r.getAs[Double]("mean_jaccard")
      val mx = r.getAs[Double]("max_jaccard")
      // candidacy requires at least one fully-matching band (BandSize
      // consecutive signature positions), so est >= BandSize
      assert(est >= 2 && est <= 8, s"est=$est out of [2,8]")
      assert(r.getAs[Double]("est_jaccard") == est / 8.0)
      assert(mn >= 0.0 && mn <= mean + 1e-9 && mean <= mx + 1e-9 && mx <= 1.0,
        s"jaccard order violated: $mn / $mean / $mx")
      mass += r.getAs[Long]("n_pairs")
    }
    val nCand = graft.ops.OpsQueries.sharedRepCandsFor(spark, sf).count()
    assert(mass == nCand, s"sum(n_pairs)=$mass != rep candidates=$nCand")
    graft.util.SharedStages.releaseAll()
  }

  test("x130: KS statistic matches a driver-side exact BigInt replication") {
    val got = graft.SparkEntry.queries("x130_source_ks_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), Option(r.getAs[Any]("ks_d")).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("flagged")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = BigInt(docs.length)
    val grid = docs.map(_._2).distinct.sorted
    val bySource = docs.groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    for ((src, rows) <- bySource) {
      val na = BigInt(rows.length)
      val nr = n - na
      var num = BigInt(0)
      for (v <- grid) {
        val ca = BigInt(rows.count(_._2 <= v))
        val call = BigInt(docs.count(_._2 <= v))
        num = num.max((ca * nr - (call - ca) * na).abs)
      }
      val (gn, gks, gfl) = got(src)
      assert(gn == rows.length.toLong)
      val expKs = BigDecimal(num) / BigDecimal(na * nr)
      assert(gks.isDefined && math.abs(gks.get - expKs.toDouble) < 1e-6,
        s"$src ks: got ${gks.get}, expected ~$expKs")
      val expFl = num * num * 10000 > BigInt(18496) * n * na * nr
      assert(gfl == expFl, s"$src flagged: got $gfl, expected $expFl")
    }
  }

  test("x131: burstiness matches a driver-side exact BigInt replication") {
    val got = graft.SparkEntry.queries("x131_event_burstiness")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("mean_gap_s"),
          Option(r.getAs[Any]("cv2")).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("bursty")))).toMap
    val ev = QueryDef.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsm", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).filter(_._2.length >= 2)
    assert(got.keySet == byUser.keySet)
    for ((u, rows) <- byUser) {
      val sorted = rows.sortBy(r => (r._2, r._3))
      val gaps = sorted.sliding(2).map { case Array(a, b) =>
        BigInt(b._2 - a._2) / 1000000 }.toSeq
      val ng = BigInt(gaps.length)
      val s = gaps.sum
      val q = gaps.map(g => g * g).sum
      val (gn, gm, gcv, gb) = got(u)
      assert(gn == gaps.length.toLong)
      assert(gm == (s / ng).toLong, s"user $u mean gap")
      if (ng >= 2 && s > 0) {
        val expCv = (BigInt(1000000) * (ng * q - s * s) / (s * s)).toDouble / 1e6
        assert(gcv.isDefined && math.abs(gcv.get - expCv) < 1e-9,
          s"user $u cv2: got $gcv, expected $expCv")
        assert(gb == (ng * q - s * s > s * s), s"user $u bursty")
      } else {
        assert(gcv.isEmpty && !gb)
      }
    }
    assert(got.values.exists(_._4) || got.values.exists(!_._4))
  }
}
