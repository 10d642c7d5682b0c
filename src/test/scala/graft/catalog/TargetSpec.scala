package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

class TargetSpec extends AnyFunSuite {
  test("glue/hms two-level targets (cli.py:85-94)") {
    assert(ScanTarget.parse("glue://*") == ScanTarget("glue", Seq("*"), Seq("*"), Seq("*")))
    assert(ScanTarget.parse("glue://sales/orders_*") ==
      ScanTarget("glue", Seq("*"), Seq("sales"), Seq("orders_*")))
    assert(ScanTarget.parse("hms://db") == ScanTarget("hms", Seq("*"), Seq("db"), Seq("*")))
    assert(ScanTarget.parse("glue:///*") == ScanTarget("glue", Seq("*"), Seq("*"), Seq("*")))
  }

  test("unity three-level targets (cli.py:127-141)") {
    assert(ScanTarget.parse("unity://main/analytics/events") ==
      ScanTarget("unity", Seq("main"), Seq("analytics"), Seq("events")))
    assert(ScanTarget.parse("unity://main") ==
      ScanTarget("unity", Seq("main"), Seq("*"), Seq("*")))
  }

  test("rejects unknown schemes and shapeless targets") {
    intercept[IllegalArgumentException](ScanTarget.parse("s3://bucket"))
    intercept[IllegalArgumentException](ScanTarget.parse("no-scheme"))
  }
}
