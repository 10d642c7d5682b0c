package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs and yields rows at sf0.001; the value-level
  * gate is the DuckDB oracle (tools/check.py / driver t2). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose CORRECT organic output at sf0.001 is empty (the oracle
    * pins the empty set bitwise there): smoke them one SF up, where the
    * output is non-trivially live. s19 releases nothing at sf0.001 because
    * none of its 144 quasi-identifier classes reaches k=5 among 150
    * customers — that IS the k-anonymity semantics, not a dead query. */
  private val liveOneSfUp = Map("s19_stream_kanon_gate" -> "/root/testdata/sf0.01")

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs and returns rows") {
      val n = q.fn(spark, liveOneSfUp.getOrElse(q.name, sf)).count()
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
