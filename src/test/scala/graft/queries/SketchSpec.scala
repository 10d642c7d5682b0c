package graft.queries

import graft.{SparkEntry, SparkSpec}

class SketchSpec extends SparkSpec {
  test("approx_count_distinct lands within its rsd bound of the exact count") {
    val rows = SparkEntry.queries("x14_approx_distinct")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1, s"flag ${r.getString(0)}: $approx vs $exact")
    }
  }
}
