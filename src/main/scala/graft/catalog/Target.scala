package graft.catalog

/** Scan-target URI parsing (reference: cli.py:85-94 glue, 127-141 unity,
  * 174-186 hms): `scheme://dbPat/tblPat` (unity adds a catalog level), empty
  * or "*" segments fall back to the ["*"] default pattern list. */
case class ScanTarget(
    source: String,
    catalogPatterns: Seq[String],
    dbPatterns: Seq[String],
    tablePatterns: Seq[String])

object ScanTarget {
  private val Schemes = Set("glue", "unity", "hms")

  def parse(target: String): ScanTarget = {
    val idx = target.indexOf("://")
    require(idx > 0, s"target must look like scheme://db/table, got: $target")
    val scheme = target.substring(0, idx)
    require(Schemes(scheme), s"unknown target scheme: $scheme")
    val parts = target.substring(idx + 3).trim.split("/").filter(_.nonEmpty).toSeq
    def pat(i: Int): Seq[String] =
      parts.lift(i).filter(p => p != "*" && p.nonEmpty).map(Seq(_)).getOrElse(Seq("*"))
    if (scheme == "unity") ScanTarget(scheme, pat(0), pat(1), pat(2))
    else ScanTarget(scheme, Seq("*"), pat(0), pat(1))
  }
}
