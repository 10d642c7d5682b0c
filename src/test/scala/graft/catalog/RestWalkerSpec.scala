package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** Fake-backend contract tests mirroring tests/test_unity_rest_jdbc.py and
  * tests/test_glue_backoff.py: pagination draining, per-level glob filters,
  * and throttle retry counting. */
class RestWalkerSpec extends AnyFunSuite {

  /** Fake paginated endpoint serving `items` in pages of `size`. */
  private def paged(items: Seq[String], size: Int): RestWalker.Page[String] = { token =>
    val start = token.map(_.toInt).getOrElse(0)
    val page = items.slice(start, start + size)
    val next = if (start + size < items.size) Some((start + size).toString) else None
    (page, next)
  }

  test("drain follows page tokens to the end") {
    assert(RestWalker.drain(paged((1 to 7).map("c" + _), 3)) == (1 to 7).map("c" + _))
    assert(RestWalker.drain(paged(Seq.empty, 3)) == Seq.empty)
  }

  test("3-level walk applies glob filters at every level") {
    var getTableCalls = 0
    val cols = RestWalker.iterColumns(
      listCatalogs = paged(Seq("main", "dev"), 1),
      listSchemas = cat => paged(Seq("analytics", "internal"), 1),
      listTables = (cat, sch) => paged(Seq("users", "events", "tmp_x"), 2),
      getColumns = ref => {
        getTableCalls += 1
        Seq(RestWalker.ColumnInfo("email", "string", "contact"))
      },
      catalogPatterns = Seq("main"),
      schemaPatterns = Seq("analytic*"),
      tablePatterns = Seq("users", "events"))
    assert(cols.map(c => (c.catalog, c.schema, c.table)).toSet ==
      Set(("main", "analytics", "users"), ("main", "analytics", "events")))
    assert(getTableCalls == 2) // filtered tables are never fetched
    assert(cols.head.ref == "unity://main/analytics/users/email")
  }

  test("retry backs off on throttles and gives up after maxRetries") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Retry.withBackoff(maxRetries = 5, sleep = delays.append(_), jitter = () => 1.0) {
      calls += 1
      if (calls < 4) throw new RuntimeException("ThrottlingException")
      "ok"
    }
    assert(got == "ok" && calls == 4)
    assert(delays.toSeq == Seq(500, 1000, 2000)) // base 0.5s doubling, jitter=1
    // exhausted retries rethrow
    var calls2 = 0
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 2, sleep = _ => (), jitter = () => 1.0) {
        calls2 += 1; throw new RuntimeException("boom")
      }
    }
    assert(calls2 == 3)
    // non-retryable errors fail fast
    var calls3 = 0
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 5, sleep = _ => (),
        isRetryable = _.getMessage.contains("Throttl")) {
        calls3 += 1; throw new RuntimeException("AccessDenied")
      }
    }
    assert(calls3 == 1)
  }

  test("delay caps at 8s like the reference (glue.py:44-46)") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 6, sleep = delays.append(_), jitter = () => 1.0) {
        calls += 1; throw new RuntimeException("throttle")
      }
    }
    assert(delays.toSeq == Seq(500, 1000, 2000, 4000, 8000, 8000))
  }
}
