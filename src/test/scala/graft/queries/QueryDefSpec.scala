package graft.queries

import graft.SparkSpec

/** graft.scan.rebalance flag parsing: misconfiguration must surface as a
  * clear config error naming the key, not a bare toBoolean crash inside
  * every query. */
class QueryDefSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("rebalance flag parses case-insensitively and rejects junk with a named error") {
    try {
      spark.conf.set("graft.scan.rebalance", "FALSE")
      assert(QueryDef.t(spark, sf, "customer").rdd.getNumPartitions >= 1)
      spark.conf.set("graft.scan.rebalance", " True ")
      assert(QueryDef.t(spark, sf, "customer").count() > 0)
      spark.conf.set("graft.scan.rebalance", "1")
      val e = intercept[IllegalArgumentException] { QueryDef.t(spark, sf, "customer") }
      assert(e.getMessage.contains("graft.scan.rebalance") && e.getMessage.contains("'1'"))
    } finally spark.conf.unset("graft.scan.rebalance")
  }
}
