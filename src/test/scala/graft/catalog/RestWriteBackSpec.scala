package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import RestWriteBack._

/** Unity REST write-back against a fake in-memory session, mirroring the
  * reference's tests/test_unity_rest_jdbc.py: first run PATCHes, second run
  * (against the patched state) is a zero-call no-op. */
class RestWriteBackSpec extends AnyFunSuite {

  private class FakeSession {
    var table = UnityTable("demo.public.users", Map.empty, Seq(
      UnityTableColumn("id", "int", None),
      UnityTableColumn("email", "string", Some("user email"))))
    var gets = 0
    var patches = Vector.empty[(String, UnityTable)]

    def getTable(fullName: String): UnityTable = {
      gets += 1
      assert(fullName == table.fullName)
      table
    }
    def patchTable(path: String, body: UnityTable): Unit = {
      patches :+= (path, body)
      table = body // the registry applies the patch
    }
    def tag(column: String, pii: Boolean, types: Option[Seq[String]],
            note: Option[String]): Boolean =
      updateColumnTags(getTable, patchTable)(
        "demo", "public", "users", column, pii, types, note)
  }

  test("first tag PATCHes properties and comment; second run is a no-op") {
    val s = new FakeSession
    assert(s.tag("email", pii = true, Some(Seq(" EMAIL", "", "PERSON ")), Some("PII: EMAIL")))
    assert(s.patches.size == 1)
    val (path, body) = s.patches.head
    assert(path == "/api/2.1/unity-catalog/tables/demo.public.users")
    assert(body.properties("cps.pii.col.email") == "true")
    assert(body.properties("cps.pii_types.col.email") == "EMAIL,PERSON")
    assert(body.columns.find(_.name == "email").get.comment.contains("user email PII: EMAIL"))
    assert(body.columns.find(_.name == "id").get.comment.isEmpty)

    // idempotent: the exact same request against the patched table
    assert(!s.tag("email", pii = true, Some(Seq("EMAIL", "PERSON")), Some("PII: EMAIL")))
    assert(s.patches.size == 1)
  }

  test("flag comparison is case-insensitive; value change re-PATCHes") {
    val t0 = UnityTable("c.s.t", Map("cps.pii.col.x" -> "True"), Seq(UnityTableColumn("x", "string", None)))
    assert(patchBody(t0, "x", pii = true).isEmpty)
    assert(patchBody(t0, "x", pii = false).get.properties("cps.pii.col.x") == "false")
  }

  test("comment appends once, preserves others, truncates at 1024") {
    val t0 = UnityTable("c.s.t", Map("cps.pii.col.x" -> "true"), Seq(
      UnityTableColumn("x", "string", Some("a" * 1020)),
      UnityTableColumn("y", "string", Some("keep"))))
    val body = patchBody(t0, "x", pii = true, appendComment = Some("PII: SSN")).get
    val cx = body.columns.find(_.name == "x").get.comment.get
    assert(cx.length == 1024 && cx.startsWith("a" * 1020 + " PII"))
    assert(body.columns.find(_.name == "y").get.comment.contains("keep"))
  }

  test("duplicate column names: only the first match gets the comment (unity.py break)") {
    val t0 = UnityTable("c.s.t", Map("cps.pii.col.x" -> "true"), Seq(
      UnityTableColumn("x", "string", None),
      UnityTableColumn("x", "string", Some("second"))))
    val body = patchBody(t0, "x", pii = true, appendComment = Some("PII: SSN")).get
    assert(body.columns.head.comment.contains("PII: SSN"))
    assert(body.columns(1).comment.contains("second")) // untouched
  }

  test("pii_types omitted leaves existing types property untouched") {
    val t0 = UnityTable("c.s.t",
      Map("cps.pii.col.x" -> "true", "cps.pii_types.col.x" -> "EMAIL"),
      Seq(UnityTableColumn("x", "string", None)))
    assert(patchBody(t0, "x", pii = true, piiTypes = None).isEmpty)
  }
}
