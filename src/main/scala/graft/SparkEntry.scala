package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PiiQueries, PipelineQueries, QueryDef, RelationalQueries}
import graft.ops.OpsQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  val all: Seq[QueryDef] =
    RelationalQueries.defs ++ PiiQueries.defs ++ PipelineQueries.defs ++
      OpsQueries.defs ++ graft.ops.ClusterQueries.defs ++
      graft.ops.SketchQueries.defs ++ graft.ops.CurationQueries.defs ++
      graft.queries.ExtraQueries.defs ++ graft.queries.AnalyticsQueries.defs ++
      graft.queries.MetricsQueries.defs ++ graft.ops.RetrievalQueries.defs ++
      graft.ops.PqQueries.defs ++ graft.ops.GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full offline PII scan (candidates → ensemble → argmax). */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "p02_pii_scan").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
