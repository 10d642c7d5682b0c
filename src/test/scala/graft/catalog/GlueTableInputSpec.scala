package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/test_glue_tableinput.py: the whitelist must strip the
  * read-only GetTable fields that make UpdateTable reject the payload. */
class GlueTableInputSpec extends AnyFunSuite {

  val getTableOutput: Map[String, Any] = Map(
    "Name" -> "users",
    "DatabaseName" -> "demo",              // read-only: must be stripped
    "CreateTime" -> "2024-01-01",          // read-only
    "UpdateTime" -> "2024-01-02",          // read-only
    "CreatedBy" -> "arn:aws:...",          // read-only
    "IsRegisteredWithLakeFormation" -> false, // read-only
    "CatalogId" -> "123",                  // read-only
    "VersionId" -> "7",                    // read-only
    "TableType" -> "EXTERNAL_TABLE",
    "Parameters" -> Map("pii" -> "true"),
    "StorageDescriptor" -> Map(
      "Columns" -> Seq(
        Map("Name" -> "email", "Type" -> "string", "Comment" -> "x",
          "Parameters" -> Map("pii" -> "true"), "ReadOnlyExtra" -> 1)),
      "Location" -> "s3://bucket/path",
      "SerdeInfo" -> Map("SerializationLibrary" -> "lib", "Bogus" -> 2),
      "SortColumns" -> Seq(Map("Column" -> "email", "SortOrder" -> 1, "Junk" -> 3)),
      "SkewedInfo" -> Map("SkewedColumnNames" -> Seq("email"), "Extra" -> 4),
      "SchemaReference" -> Map("SchemaVersionId" -> "v1",
        "SchemaId" -> Map("SchemaName" -> "s", "Unknown" -> 5), "Noise" -> 6),
      "DeprecatedField" -> "zap"))

  test("strips read-only keys at every nesting level") {
    val ti = GlueTableInput.tableToInput(getTableOutput)
    assert(!ti.contains("DatabaseName") && !ti.contains("CreateTime") &&
      !ti.contains("CatalogId") && !ti.contains("VersionId") &&
      !ti.contains("IsRegisteredWithLakeFormation") && !ti.contains("CreatedBy"))
    val sd = ti("StorageDescriptor").asInstanceOf[Map[String, Any]]
    assert(!sd.contains("DeprecatedField"))
    val col = sd("Columns").asInstanceOf[Seq[Map[String, Any]]].head
    assert(col == Map("Name" -> "email", "Type" -> "string", "Comment" -> "x",
      "Parameters" -> Map("pii" -> "true")))
    assert(sd("SerdeInfo") == Map("SerializationLibrary" -> "lib"))
    assert(sd("SortColumns").asInstanceOf[Seq[Map[String, Any]]].head ==
      Map("Column" -> "email", "SortOrder" -> 1))
    assert(sd("SkewedInfo") == Map("SkewedColumnNames" -> Seq("email")))
    assert(sd("SchemaReference") == Map("SchemaVersionId" -> "v1",
      "SchemaId" -> Map("SchemaName" -> "s")))
  }

  test("backfills minimal required defaults (glue.py:344-352)") {
    val ti = GlueTableInput.tableToInput(Map("Name" -> "t"))
    assert(ti("Name") == "t")
    assert(ti("StorageDescriptor") == Map.empty[String, Any])
    assert(ti("Parameters") == Map.empty[String, Any])
    assert(ti("TableType") == "EXTERNAL_TABLE")
  }

  test("idempotent: sanitizing a TableInput is a no-op") {
    val once = GlueTableInput.tableToInput(getTableOutput)
    assert(GlueTableInput.tableToInput(once) == once)
  }
}
