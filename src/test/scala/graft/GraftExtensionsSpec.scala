package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftshim.shims

import graft.SparkSpec

/** The extensions class must inject the full SQL surface. (Applied to the
  * shared session's registry through the same code path `getOrCreate` runs —
  * building a separate session here would tear down the suite-shared
  * SparkContext. The spark.sql.extensions config path is driven manually:
  * see README quickstart.) */
class GraftExtensionsSpec extends SparkSpec {
  test("injected functions resolve and evaluate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    shims.registerExtensionFunctions(ext, spark)
    val r = spark.sql(
      """SELECT luhn('4111 1111 1111 1111') AS l,
                size(pii_candidates('a@b.co')) AS n,
                mask_token('Zz9') AS m,
                simhash32(split('a b', ' ')) AS sh,
                int8_dist2(array(1, 2), array(3, 1)) AS d2,
                int8_dot(array(2, 3), array(4, 5)) AS dp""").collect().head
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 1)
    assert(r.getString(2) == "Xx0")
    assert(r.getString(3).length == 32)
    assert(r.getLong(4) == 5L)  // (1-3)^2 + (2-1)^2
    assert(r.getLong(5) == 23L) // 2*4 + 3*5
  }
}
