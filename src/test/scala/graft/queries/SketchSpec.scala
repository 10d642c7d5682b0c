package graft.queries

import graft.{SparkEntry, SparkSpec}

class SketchSpec extends SparkSpec {
  test("approx_count_distinct lands within its rsd bound of the exact count") {
    // x14 is self-verifying: within_bound is the |approx-exact|/exact <= 3*rsd
    // check computed inside the query (and value-checked by the oracle).
    val rows = SparkEntry.queries("x14_approx_distinct")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getBoolean(2), s"flag ${r.getString(0)}: estimate outside 6% of ${r.getLong(1)}")
    }
  }
}
