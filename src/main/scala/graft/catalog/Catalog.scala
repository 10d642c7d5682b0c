package graft.catalog

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CatalogColumn

/** Catalog enumeration + tag write-back (SURVEY §2.1 S1-S6, S14-S17).
  *
  * Enumeration goes through `spark.catalog` — the session's metastore client
  * (Hive/Glue-backed in production, in-memory locally) — so no custom Thrift
  * or AWS pagination code is needed; the reference's NextToken loops
  * (glue.py:100-140) live inside Spark's client. Glob filters are applied to
  * db/table names like the reference's fnmatch (and, unlike the reference,
  * can be pushed into `listTables(db, pattern)`).
  */
object Connectors {

  /** fnmatch-style glob → Java regex (C23). */
  def globToRegex(glob: String): String =
    "(?s)" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  def globMatch(glob: String, s: String): Boolean = s.matches(globToRegex(glob))

  private def anyMatch(patterns: Seq[String], s: String): Boolean =
    patterns.isEmpty || patterns.exists(globMatch(_, s))

  /** Enumerate columns of every table matching the patterns into a
    * Dataset[CatalogColumn] (S3/S6 equivalent over the session catalog). */
  def iterColumns(spark: SparkSession,
                  dbPatterns: Seq[String] = Seq("*"),
                  tablePatterns: Seq[String] = Seq("*"),
                  source: String = "hms"): Dataset[CatalogColumn] = {
    import spark.implicits._
    val cols = for {
      db <- spark.catalog.listDatabases().collect().toSeq.map(_.name)
      if anyMatch(dbPatterns, db)
      tb <- spark.catalog.listTables(db).collect().toSeq
      if anyMatch(tablePatterns, tb.name) && !tb.isTemporary
      c <- spark.catalog.listColumns(db, tb.name).collect().toSeq
    } yield CatalogColumn(source, "", db, tb.name, c.name,
      Option(c.dataType).getOrElse(""), Option(c.description).getOrElse(""), Map.empty)
    spark.createDataset(cols)
  }
}

/** Idempotent tag computation + application (glue.py:184-235, hms.py:110-162,
  * unity.py:246-345). The decision logic is pure (unit-testable, identical
  * across connectors); application goes through native Spark SQL
  * `ALTER TABLE … SET TBLPROPERTIES` from a deduplicated driver-side
  * collection — never from tasks, so distributed retries can't double-apply
  * (SURVEY §7.4 #6). */
object WriteBack {

  val PiiFlagKey = "pii"
  def typesKey(column: String) = s"cps.pii_types.col.$column"

  /** Escape a string for interpolation inside a single-quoted SQL literal. */
  private def sqlStr(s: String): String = s.replace("'", "''")

  /** Escape an identifier for interpolation inside backtick quoting. */
  private def ident(s: String): String = s.replace("`", "``")

  /** Sorted-CSV normalizer (C25). */
  def sortedCsv(types: Seq[String]): String = types.distinct.sorted.mkString(",")

  /** New property map; returns None when already up to date (idempotency by
    * change detection, glue.py:207-219). */
  def updatedProperties(existing: Map[String, String], column: String,
                        isPii: Boolean, types: Seq[String]): Option[Map[String, String]] = {
    val want = existing ++ Map(
      PiiFlagKey -> isPii.toString,
      typesKey(column) -> sortedCsv(types))
    if (want == existing) None else Some(want)
  }

  /** Comment append-if-absent with truncation (C26): Glue/HMS cap 255,
    * Unity 1024. */
  def appendComment(existing: String, note: String, maxLen: Int = 255): String = {
    val base = Option(existing).getOrElse("")
    val merged = if (base.contains(note)) base
      else if (base.isEmpty) note
      else s"$base $note"
    merged.take(maxLen)
  }

  /** Apply PII notes to column comments via native
    * `ALTER TABLE … ALTER COLUMN … COMMENT` (S15/S17 application path) with
    * append-if-absent change detection: re-running is a no-op. `findings`
    * columns: (schema, table, column, types array). Returns comments changed.
    *
    * Findings are grouped by table first so the metastore pays ONE
    * listColumns round trip per table, not one per finding row — a wide
    * table with 200 flagged columns is 1 call, not 200. `listDescriptions`
    * is injectable so specs can count those round trips. */
  def applyColumnComments(spark: SparkSession, findings: DataFrame,
                          maxLen: Int = 255,
                          listDescriptions: (String, String) => Map[String, String] = null): Int = {
    val list: (String, String) => Map[String, String] =
      if (listDescriptions != null) listDescriptions
      else (db, tb) => spark.catalog.listColumns(db, tb).collect()
        .map(c => c.name -> Option(c.description).getOrElse("")).toMap
    val rows = findings.select("schema", "table", "column", "types").distinct().collect()
    var changed = 0
    for (((db, tb), perTable) <- rows.groupBy(r => (r.getString(0), r.getString(1)))
                                     .toSeq.sortBy(_._1)) {
      val existingByCol = list(db, tb)
      for (r <- perTable.sortBy(_.getString(2))) {
        val c = r.getString(2)
        val note = s"PII: ${sortedCsv(r.getSeq[String](3))}"
        val existing = existingByCol.getOrElse(c, "")
        val merged = appendComment(existing, note, maxLen)
        if (merged != existing) {
          spark.sql(s"ALTER TABLE `${ident(db)}`.`${ident(tb)}` ALTER COLUMN `${ident(c)}` COMMENT '${sqlStr(merged)}'")
          changed += 1
        }
      }
    }
    changed
  }

  /** Apply findings as table properties via Spark SQL. `findings` columns:
    * (schema, table, column, types array). Collects the (tiny, deduplicated)
    * finding set on the driver and issues one ALTER per table. */
  def applyTags(spark: SparkSession, findings: DataFrame): Int = {
    val perTable = findings
      .groupBy("schema", "table")
      .agg(map_from_entries(collect_list(struct(
        col("column"), array_join(array_sort(col("types")), ",")))).as("colTypes"))
      .collect()
    var applied = 0
    for (row <- perTable) {
      val db = row.getString(0); val tb = row.getString(1)
      val colTypes = row.getMap[String, String](2)
      val existing = spark.sql(s"SHOW TBLPROPERTIES `${ident(db)}`.`${ident(tb)}`")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val wanted = colTypes.toSeq.sortBy(_._1).flatMap { case (c, csv) =>
        val k = typesKey(c)
        if (existing.get(k).contains(csv)) None else Some(k -> csv)
      } ++ (if (existing.get(PiiFlagKey).contains("true")) None else Some(PiiFlagKey -> "true"))
      if (wanted.nonEmpty) {
        val props = wanted.map { case (k, v) => s"'${sqlStr(k)}'='${sqlStr(v)}'" }.mkString(", ")
        spark.sql(s"ALTER TABLE `${ident(db)}`.`${ident(tb)}` SET TBLPROPERTIES ($props)")
        applied += 1
      }
    }
    applied
  }
}
