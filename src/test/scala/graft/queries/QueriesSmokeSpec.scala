package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs and yields rows at sf0.001; the value-level
  * gate is the DuckDB oracle (tools/check.py / driver t2). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs and returns rows") {
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle is registered for a defined query") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }
}
