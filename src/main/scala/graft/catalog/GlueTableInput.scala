package graft.catalog

/** Glue `GetTable` → `TableInput` sanitizer (reference: connectors/glue.py:241-353).
  *
  * Strict field whitelists, reimplemented verbatim: Glue's `UpdateTable`
  * rejects read-only/unknown fields that `GetTable` returns, so write-back
  * must rebuild the payload from an allowlist. Values are nested
  * `Map[String, Any]` / `Seq[Any]` trees (what an AWS SDK JSON document
  * deserializes to). Pure logic — the actual HTTP call belongs to a
  * driver-side SDK client. */
object GlueTableInput {
  type Doc = Map[String, Any]

  private val allowedTableKeys = Set(
    "Name", "Description", "Owner", "Retention", "StorageDescriptor",
    "PartitionKeys", "ViewOriginalText", "ViewExpandedText", "TableType",
    "Parameters", "TargetTable")

  private def keep(doc: Doc, allowed: Set[String]): Doc = doc.filter(kv => allowed(kv._1))

  private def sanitizeColumn(c: Doc): Doc = keep(c, Set("Name", "Type", "Comment", "Parameters"))
  private def sanitizeSerde(i: Doc): Doc = keep(i, Set("Name", "SerializationLibrary", "Parameters"))
  private def sanitizeOrder(o: Doc): Doc = keep(o, Set("Column", "SortOrder"))
  private def sanitizeSkewed(i: Doc): Doc =
    keep(i, Set("SkewedColumnNames", "SkewedColumnValues", "SkewedColumnValueLocationMaps"))

  private def sanitizeSchemaRef(r: Doc): Doc = {
    val out = keep(r, Set("SchemaId", "SchemaVersionId", "SchemaVersionNumber"))
    out.get("SchemaId") match {
      case Some(sid: Map[String @unchecked, Any @unchecked]) =>
        out + ("SchemaId" -> keep(sid, Set("SchemaArn", "SchemaName", "RegistryName")))
      case _ => out
    }
  }

  private def sanitizeStorageDescriptor(sd: Doc): Doc = {
    var out = keep(sd, Set(
      "Columns", "Location", "AdditionalLocations", "InputFormat", "OutputFormat",
      "Compressed", "NumberOfBuckets", "SerdeInfo", "BucketColumns", "SortColumns",
      "Parameters", "SkewedInfo", "StoredAsSubDirectories", "SchemaReference"))
    out.get("Columns") match {
      case Some(cs: Seq[Any @unchecked]) =>
        out += "Columns" -> cs.collect { case c: Map[String @unchecked, Any @unchecked] => sanitizeColumn(c) }
      case _ =>
    }
    out.get("SerdeInfo") match {
      case Some(si: Map[String @unchecked, Any @unchecked]) => out += "SerdeInfo" -> sanitizeSerde(si)
      case _ =>
    }
    out.get("SortColumns") match {
      case Some(os: Seq[Any @unchecked]) =>
        out += "SortColumns" -> os.collect { case o: Map[String @unchecked, Any @unchecked] => sanitizeOrder(o) }
      case _ =>
    }
    out.get("SkewedInfo") match {
      case Some(si: Map[String @unchecked, Any @unchecked]) => out += "SkewedInfo" -> sanitizeSkewed(si)
      case _ =>
    }
    out.get("SchemaReference") match {
      case Some(sr: Map[String @unchecked, Any @unchecked]) => out += "SchemaReference" -> sanitizeSchemaRef(sr)
      case _ =>
    }
    out
  }

  /** Whitelisted rebuild with the reference's minimal-default backfills
    * (glue.py:344-352). */
  def tableToInput(tbl: Doc): Doc = {
    var ti: Doc = Map.empty
    for (k <- allowedTableKeys; if tbl.contains(k)) {
      val v = tbl(k)
      ti += k -> ((k, v) match {
        case ("StorageDescriptor", sd: Map[String @unchecked, Any @unchecked]) => sanitizeStorageDescriptor(sd)
        case ("PartitionKeys", pks: Seq[Any @unchecked]) =>
          pks.collect { case c: Map[String @unchecked, Any @unchecked] => sanitizeColumn(c) }
        case ("TargetTable", tt: Map[String @unchecked, Any @unchecked]) =>
          keep(tt, Set("CatalogId", "DatabaseName", "Name"))
        case (_, other) => other
      })
    }
    if (!ti.contains("Name")) tbl.get("Name").foreach(n => ti += "Name" -> n)
    if (!ti.contains("StorageDescriptor"))
      ti += "StorageDescriptor" -> sanitizeStorageDescriptor(
        tbl.get("StorageDescriptor").collect { case m: Map[String @unchecked, Any @unchecked] => m }
          .getOrElse(Map.empty))
    if (!ti.contains("Parameters"))
      ti += "Parameters" -> tbl.getOrElse("Parameters", Map.empty[String, Any])
    if (!ti.contains("TableType"))
      ti += "TableType" -> tbl.get("TableType").filter(_ != null).getOrElse("EXTERNAL_TABLE")
    ti
  }
}
