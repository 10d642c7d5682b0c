package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.WriteBack

class SkewSpec extends SparkSpec {
  test("salted join returns exactly the plain join result") {
    import spark.implicits._
    // skewed probe: key 1 carries 90% of rows
    val probe = (Seq.fill(900)(1) ++ (2 to 101)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "pv")
    val build = (1 to 101).map(k => (k, s"dim_$k")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).select("k", "pv", "bv").collect().toSet
    val salted = Skew.saltedJoin(probe, build, Seq("k"), n = 8)
      .select("k", "pv", "bv").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("dup-ngram stats: salted gram join equals the plain form on a hot-gram corpus") {
    import spark.implicits._
    // boilerplate 5-gram in EVERY doc (the hot key AQE can't split further),
    // plus unique per-doc content
    val boiler = "this content is licensed under"
    val docs = (0L until 200L).map(i =>
      (i, s"$boiler unique token run number $i alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    val plain = rows(Dedup.dupNgramStats(docs, "doc_id", "text"))
    graft.util.PersistScope.releaseAll()
    val salted = rows(Dedup.dupNgramStats(docs, "doc_id", "text", saltBuckets = 8))
    graft.util.PersistScope.releaseAll()
    assert(salted == plain)
    // the boilerplate run spans 5-gram windows shared by all docs -> every
    // doc has duplicated occurrences; the unique tail keeps fractions < 1
    assert(plain.forall { case (_, _, frac, _) => frac > 0.0 && frac < 1.0 })
  }
}

class ColumnCommentSpec extends SparkSpec {
  test("column comment write-back appends once and is idempotent") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS demo_cc")
    spark.sql("DROP TABLE IF EXISTS demo_cc.t")
    spark.sql("CREATE TABLE demo_cc.t (email STRING COMMENT 'the email') USING parquet")
    val findings = Seq(("demo_cc", "t", "email", Seq("PHONE_NUMBER", "EMAIL")))
      .toDF("schema", "table", "column", "types")
    assert(WriteBack.applyColumnComments(spark, findings) == 1)
    assert(WriteBack.applyColumnComments(spark, findings) == 0) // no-op re-run
    val desc = spark.catalog.listColumns("demo_cc", "t").collect().head.description
    assert(desc == "the email PII: EMAIL,PHONE_NUMBER")
  }

  test("write-back lists each table's columns once, not once per finding") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS demo_cc")
    spark.sql("DROP TABLE IF EXISTS demo_cc.wide")
    spark.sql("CREATE TABLE demo_cc.wide (a STRING, b STRING, c STRING) USING parquet")
    val findings = Seq(
      ("demo_cc", "wide", "a", Seq("EMAIL")),
      ("demo_cc", "wide", "b", Seq("PHONE_NUMBER")),
      ("demo_cc", "wide", "c", Seq("EMAIL", "SSN")))
      .toDF("schema", "table", "column", "types")
    var listCalls = 0
    val counting = (db: String, tb: String) => {
      listCalls += 1
      spark.catalog.listColumns(db, tb).collect()
        .map(col => col.name -> Option(col.description).getOrElse("")).toMap
    }
    assert(WriteBack.applyColumnComments(spark, findings, 255, counting) == 3)
    assert(listCalls == 1, s"3 findings on one table must cost 1 listColumns, got $listCalls")
    // and the comments actually landed
    val descs = spark.catalog.listColumns("demo_cc", "wide").collect()
      .map(c => c.name -> c.description).toMap
    assert(descs("a") == "PII: EMAIL")
    assert(descs("c") == "PII: EMAIL,SSN")
  }
}
