package graft.catalog

/** Unity REST write-back (reference: connectors/unity.py:313-345): when no
  * SQL warehouse is available, PII tags land via PATCH
  * `/api/2.1/unity-catalog/tables/{full_name}` with change-detected table
  * properties and column comments.
  *
  * Pure logic over an injected session, in the [[RestWalker]] style (the
  * reference's tests fake the HTTP session the same way,
  * tests/test_unity_rest_jdbc.py): `updateColumnTags` takes `getTable` /
  * `patchTable` functions; [[patchBody]] is the side-effect-free core —
  * `None` means "already up to date, do not PATCH" (idempotency by change
  * detection, so a second run against the patched state issues zero calls).
  */
object RestWriteBack {

  /** The slice of the Unity table payload the write-back reads and writes. */
  case class UnityTable(
      fullName: String,
      properties: Map[String, String],
      columns: Seq[UnityTableColumn])

  case class UnityTableColumn(name: String, typeText: String, comment: Option[String])

  val CommentMaxLen = 1024

  def piiFlagKey(column: String) = s"cps.pii.col.$column"
  def piiTypesKey(column: String) = s"cps.pii_types.col.$column"

  def patchPath(fullName: String) = s"/api/2.1/unity-catalog/tables/$fullName"

  /** The updated table payload, or None when nothing would change
    * (unity.py:316-341). Property semantics match the reference exactly:
    * the PII flag compares lowercased string forms; pii_types (when given)
    * is the sorted CSV of trimmed non-empty entries; the comment appends
    * only if absent, truncated to 1024 chars. */
  def patchBody(table: UnityTable, column: String, pii: Boolean,
                piiTypes: Option[Seq[String]] = None,
                appendComment: Option[String] = None): Option[UnityTable] = {
    var changed = false

    var props = table.properties
    val flag = pii.toString
    if (!props.get(piiFlagKey(column)).map(_.toLowerCase).contains(flag)) {
      props += piiFlagKey(column) -> flag
      changed = true
    }
    piiTypes.foreach { ts =>
      val desired = ts.map(_.trim).filter(_.nonEmpty).sorted.mkString(",")
      if (!props.get(piiTypesKey(column)).contains(desired)) {
        props += piiTypesKey(column) -> desired
        changed = true
      }
    }

    // Only the FIRST column with the target name is considered — the
    // reference (unity.py) breaks out of its column loop on the first match,
    // so payloads with duplicate column names leave later duplicates alone.
    var matched = false
    val cols = table.columns.map { c =>
      appendComment match {
        case Some(note) if c.name == column && !matched =>
          matched = true
          val existing = c.comment.getOrElse("")
          if (existing.contains(note)) c
          else {
            changed = true
            val merged = (if (existing.isEmpty) note else s"$existing $note").take(CommentMaxLen)
            c.copy(comment = Some(merged))
          }
        case _ => c
      }
    }

    if (changed) Some(UnityTable(table.fullName, props, cols)) else None
  }

  /** Tag one column through an injected REST session: GET the table, build
    * the change-detected body, PATCH only if something changed. Returns true
    * iff a PATCH was issued (unity.py:341-345). */
  def updateColumnTags(
      getTable: String => UnityTable,
      patchTable: (String, UnityTable) => Unit)(
      catalog: String, schema: String, table: String, column: String,
      pii: Boolean, piiTypes: Option[Seq[String]] = None,
      appendComment: Option[String] = None): Boolean = {
    val fullName = s"$catalog.$schema.$table"
    patchBody(getTable(fullName), column, pii, piiTypes, appendComment) match {
      case Some(body) => patchTable(patchPath(fullName), body); true
      case None => false
    }
  }
}
