package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic PII-bearing text derived from the `customer` table.
  *
  * The driver's testdata documents are PII-free word salad, so the detection
  * pipeline is exercised on text deterministically derived from customer keys:
  * every doc embeds one name/email/phone/card/ssn/ip/mac/aadhaar/pan/date whose
  * digits are arithmetic functions of `c_custkey`. The SAME construction is
  * expressed in DuckDB SQL ([[PiiInputs.sql]]) so the oracle compares the full
  * detection pipeline end-to-end: checksum gates (Luhn ~10% of cards,
  * Verhoeff ~10% of aadhaars), the DOB boost (25% of docs), case-folded PAN
  * (33%), and an overlapping AADHAAR-inside-CREDIT-CARD candidate.
  */
object PiiInputs {

  private def chr(c: Column): Column = call_function("char", c)
  private def lp(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")

  /** Columns (doc_id, text) derived from customer. */
  def df(spark: SparkSession, sfDir: String): DataFrame =
    fromCustomer(QueryDef.t(spark, sfDir, "customer"))

  /** The same construction over an arbitrary customer frame — pure column
    * expressions, so it applies unchanged to a STREAMING customer source
    * (s06 scans the catalog sample incrementally). */
  def fromCustomer(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    val name = concat(chr(lit(65) + c % 26), lit("ohn "), chr(lit(65) + (c * 11) % 26), lit("mith"))
    val email = concat(lit("user"), c.cast("string"), lit("@example.com"))
    val phone = concat(lit("(415) 555-"), lp((c * 7) % 10000, 4))
    val cc = concat(
      lp((c * 7919) % 10000, 4), lit(" "), lp((c * 104729) % 10000, 4), lit(" "),
      lp((c * 1299709) % 10000, 4), lit(" "), lp((c * 15485863) % 10000, 4))
    val ssn = concat(
      lp(lit(100) + c % 900, 3), lit("-"), lp(lit(10) + (c * 3) % 90, 2), lit("-"),
      lp(lit(1000) + (c * 7) % 9000, 4))
    val ip = concat(lit("10."), (c % 256).cast("string"), lit("."),
      ((c * 3) % 256).cast("string"), lit("."), (lit(1) + (c * 7) % 254).cast("string"))
    val h = md5(c.cast("string"))
    val mac = concat(
      substring(h, 1, 2), lit(":"), substring(h, 3, 2), lit(":"), substring(h, 5, 2), lit(":"),
      substring(h, 7, 2), lit(":"), substring(h, 9, 2), lit(":"), substring(h, 11, 2))
    val aad = concat((lit(2) + c % 8).cast("string"), lp((c * 13) % 1000, 3), lit(" "),
      lp((c * 37) % 10000, 4), lit(" "), lp((c * 91) % 10000, 4))
    val panRaw = concat(chr(lit(65) + c % 26), lit("BCDE"), lp(c % 10000, 4),
      chr(lit(65) + (c * 5) % 26))
    val pan = when(c % 3 === 0, lower(panRaw)).otherwise(panRaw)
    val date = concat(lit("2024-"), lp(lit(1) + c % 12, 2), lit("-"), lp(lit(1) + (c * 3) % 28, 2))
    val dob = when(c % 4 === 0, lit("DOB: ")).otherwise(lit("on "))
    val text = concat(
      lit("Contact "), name, lit(" <"), email, lit("> or call "), phone,
      lit(". Card "), cc, lit(" SSN "), ssn, lit(" IP "), ip, lit(" MAC "), mac,
      lit(" Aadhaar "), aad, lit(" PAN "), pan, lit(" "), dob, date, lit("."))
    customer.select(c.as("doc_id"), text.as("text"))
  }

  /** The identical construction as a DuckDB CTE body producing (doc_id, text).
    * Usable as `WITH pii_inputs AS ($sql) SELECT ...`. */
  val sql: String = """
    SELECT c_custkey AS doc_id,
      'Contact ' || chr(65 + (c_custkey % 26)::INT) || 'ohn ' || chr(65 + ((c_custkey*11) % 26)::INT) || 'mith'
      || ' <' || 'user' || c_custkey::VARCHAR || '@example.com' || '> or call '
      || '(415) 555-' || lpad(((c_custkey*7) % 10000)::VARCHAR, 4, '0')
      || '. Card ' || lpad(((c_custkey*7919) % 10000)::VARCHAR, 4, '0') || ' '
      || lpad(((c_custkey*104729) % 10000)::VARCHAR, 4, '0') || ' '
      || lpad(((c_custkey*1299709) % 10000)::VARCHAR, 4, '0') || ' '
      || lpad(((c_custkey*15485863) % 10000)::VARCHAR, 4, '0')
      || ' SSN ' || lpad((100 + c_custkey % 900)::VARCHAR, 3, '0') || '-'
      || lpad((10 + (c_custkey*3) % 90)::VARCHAR, 2, '0') || '-'
      || lpad((1000 + (c_custkey*7) % 9000)::VARCHAR, 4, '0')
      || ' IP 10.' || (c_custkey % 256)::VARCHAR || '.' || ((c_custkey*3) % 256)::VARCHAR || '.' || (1 + (c_custkey*7) % 254)::VARCHAR
      || ' MAC ' || substr(md5(c_custkey::VARCHAR),1,2) || ':' || substr(md5(c_custkey::VARCHAR),3,2) || ':' || substr(md5(c_custkey::VARCHAR),5,2) || ':' || substr(md5(c_custkey::VARCHAR),7,2) || ':' || substr(md5(c_custkey::VARCHAR),9,2) || ':' || substr(md5(c_custkey::VARCHAR),11,2)
      || ' Aadhaar ' || (2 + c_custkey % 8)::VARCHAR || lpad(((c_custkey*13) % 1000)::VARCHAR, 3, '0') || ' '
      || lpad(((c_custkey*37) % 10000)::VARCHAR, 4, '0') || ' ' || lpad(((c_custkey*91) % 10000)::VARCHAR, 4, '0')
      || ' PAN ' || (CASE WHEN c_custkey % 3 = 0
            THEN lower(chr(65 + (c_custkey % 26)::INT) || 'BCDE' || lpad((c_custkey % 10000)::VARCHAR, 4, '0') || chr(65 + ((c_custkey*5) % 26)::INT))
            ELSE chr(65 + (c_custkey % 26)::INT) || 'BCDE' || lpad((c_custkey % 10000)::VARCHAR, 4, '0') || chr(65 + ((c_custkey*5) % 26)::INT) END)
      || ' ' || (CASE WHEN c_custkey % 4 = 0 THEN 'DOB: ' ELSE 'on ' END)
      || '2024-' || lpad((1 + c_custkey % 12)::VARCHAR, 2, '0') || '-' || lpad((1 + (c_custkey*3) % 28)::VARCHAR, 2, '0') || '.'
      AS text
    FROM customer"""

  /** DuckDB SQL snippets shared by the oracle queries. */
  object Sql {
    /** Shape-preserving mask (ASCII): digits→0, lower→x, upper→X. */
    def mask(e: String): String =
      s"regexp_replace(regexp_replace(regexp_replace($e,'[0-9]','0','g'),'[a-z]','x','g'),'[A-Z]','X','g')"

    /** Luhn gate over the digits of `e` (13-19 digits required). */
    def luhn(e: String): String = {
      val ds = s"regexp_replace($e,'[^0-9]','','g')"
      s"""(length($ds) BETWEEN 13 AND 19 AND
        list_sum(list_transform(generate_series(1, length($ds)), luhn_i ->
          CASE WHEN (luhn_i-1) % 2 = length($ds) % 2
            THEN CASE WHEN 2*(($ds)[luhn_i])::INT > 9 THEN 2*(($ds)[luhn_i])::INT - 9 ELSE 2*(($ds)[luhn_i])::INT END
            ELSE (($ds)[luhn_i])::INT END)) % 10 = 0)"""
    }

    /** Verhoeff gate: 12 digits, not starting 0/1, table recurrence ends 0. */
    def verhoeff(e: String): String = {
      val ds = s"regexp_replace($e,'[^0-9]','','g')"
      val d = "[[0,1,2,3,4,5,6,7,8,9],[1,2,3,4,0,6,7,8,9,5],[2,3,4,0,1,7,8,9,5,6],[3,4,0,1,2,8,9,5,6,7],[4,0,1,2,3,9,5,6,7,8],[5,9,8,7,6,0,4,3,2,1],[6,5,9,8,7,1,0,4,3,2],[7,6,5,9,8,2,1,0,4,3],[8,7,6,5,9,3,2,1,0,4],[9,8,7,6,5,4,3,2,1,0]]"
      val p = "[[0,1,2,3,4,5,6,7,8,9],[1,5,7,6,2,8,3,0,9,4],[5,8,0,3,7,9,6,1,4,2],[8,9,1,6,0,4,3,5,2,7],[9,4,5,3,1,2,6,8,7,0],[4,2,8,6,5,7,3,9,0,1],[2,7,9,3,8,0,6,4,1,5],[7,0,4,6,9,1,3,2,5,8]]"
      s"""(length($ds) = 12 AND ($ds)[1] NOT IN ('0','1') AND
        list_reduce(list_prepend(0, range(0, 12)), (acc, vrf_i) ->
          ($d)[acc+1][(($p)[(vrf_i % 8)+1][(($ds)[12-vrf_i])::INT + 1]) + 1]) = 0)"""
    }

    // Regex patterns as DuckDB (RE2) string literals.
    val EMAIL = """'\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b'"""
    val PHONE = """'(?:\+?\d{1,3}[\s.-]?)?(?:\(\d{3}\)|\d{3})[\s.-]?\d{3}[\s.-]?\d{4}\b'"""
    val CC = """'\b(?:\d[ -]*?){13,19}\b'"""
    val SSN = """'\b\d{3}-\d{2}-\d{4}\b'"""
    val IPV4 = """'\b(?:(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\b'"""
    val MAC = """'\b(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}\b'"""
    val DATE = """'\b(?:\d{4}-\d{2}-\d{2}|\d{2}/\d{2}/\d{4}|\d{2}-\d{2}-\d{4})\b'"""
    val AADHAAR = """'\b([2-9][0-9]{3}[ -]?[0-9]{4}[ -]?[0-9]{4})\b'"""
    val PAN = """'(?i)\b([A-Z]{5}[0-9]{4}[A-Z])\b'"""
    val PERSON = """'\b([A-Z][a-z]+\s[A-Z][a-z]+)\b'"""
  }
}
