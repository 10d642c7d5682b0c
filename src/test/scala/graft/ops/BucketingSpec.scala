package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  test("co-bucketed join plans with zero shuffle exchanges") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.sql("DROP TABLE IF EXISTS bkt.li_b")
    spark.sql("DROP TABLE IF EXISTS bkt.o_b")
    // a previously-failed run can leave orphan managed-table locations behind
    for (t <- Seq("li_b", "o_b")) {
      val loc = new java.io.File(s"spark-warehouse/bkt.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "bkt.li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "bkt.o_b", "l_orderkey", 8)
    // make sure the bucketed plan isn't replaced by a broadcast, and disable
    // AQE so executedPlan is the static plan countShuffles can traverse
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt.li_b", "bkt.o_b", "l_orderkey")
      assert(joined.count() == li.count())           // every lineitem matches its order
      assert(Bucketing.countShuffles(joined) == 0)   // no Exchange on either side
      // the same join over raw parquet DOES shuffle — the bucketing is what removed it
      val plain = li.join(o, "l_orderkey")
      assert(Bucketing.countShuffles(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
