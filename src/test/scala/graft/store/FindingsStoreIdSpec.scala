package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two-phase sequential-id assignment (r16 verdict #7: the export
  * paths ran an UNPARTITIONED row_number over the whole findings table).
  * The replacement must produce the identical contract: ids are exactly
  * 1..N, and id order is column_ref order (ties may permute, like the
  * global window they replace). */
class FindingsStoreIdSpec extends SparkSpec {

  test("withSequentialId assigns a 1..N permutation ordered by column_ref") {
    import spark.implicits._
    // enough rows to span several range partitions at the spec's
    // shuffle.partitions=4, with duplicate keys to exercise ties
    val rows = (1 to 997).map(i => (f"col_${i % 331}%04d", s"payload_$i"))
    val df = rows.toDF("column_ref", "v")
    val out = FindingsStore.withSequentialId(df)
      .select(col("id"), col("column_ref")).collect()
    assert(out.length === rows.length)
    val ids = out.map(_.getInt(0)).sorted
    assert(ids.toSeq === (1 to rows.length))
    // id order respects column_ref order: sorting by id yields a
    // non-decreasing column_ref sequence
    val byId = out.sortBy(_.getInt(0)).map(_.getString(1))
    assert(byId.zip(byId.tail).forall { case (a, b) => a <= b })
  }

  test("withSequentialId handles the empty and single-row frames") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("column_ref", "v")
    assert(FindingsStore.withSequentialId(empty).count() === 0L)
    val one = Seq(("only", "x")).toDF("column_ref", "v")
    val got = FindingsStore.withSequentialId(one).select("id").collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1))
  }
}
