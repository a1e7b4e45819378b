package graft.tpch

/** The 22 benchto TPC-H reference texts, read VERBATIM from the public
  * benchmark kit at run time (presto-benchto-benchmarks/src/main/
  * resources/sql/presto/tpch/qNN.sql — never copied into this repo) and
  * re-aimed at the fixture domains with the same global substitutions the
  * value-gating spec uses (TpchTextSpec): calendar 1992-1998 → 1995-2001,
  * kit literal domains → fixture NATION_<k>/part-type words. Shared by the
  * spec (which adds per-query substitutions + replica comparison) and the
  * bench's `tpch_sql` suite (which measures the texts through the dialect
  * — the reference's own benchto method measures exactly these texts). */
object BenchtoTexts {

  val dir =
    "/root/reference/presto-benchto-benchmarks/src/main/resources/sql/presto/tpch"

  def available: Boolean = new java.io.File(dir, "q01.sql").isFile

  /** Fixture-domain parameter substitutions applied to every text. */
  val params: Seq[(String, String)] = Seq(
    "FRANCE" -> "NATION_19", "GERMANY" -> "NATION_20", "BRAZIL" -> "NATION_19",
    "CANADA" -> "NATION_3", "SAUDI ARABIA" -> "NATION_20",
    "%BRASS" -> "%PROMO", "ECONOMY ANODIZED STEEL" -> "ECONOMY",
    "MEDIUM POLISHED%" -> "MEDIUM%", "%green%" -> "%widget%",
    "forest%" -> "blue%",
    "'1992-" -> "'1995-", "'1993-" -> "'1996-", "'1994-" -> "'1997-")

  def text(q: String, subs: (String, String)*): String = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$q.sql")), "UTF-8")
    val base = params.foldLeft(raw
      .replaceAll(
        "\"\\$\\{database\\}\"\\.\"\\$\\{schema\\}\"\\.\"\\$\\{prefix\\}(\\w+)\"",
        "tpch_$1")
      .replaceAll("\\s+", " ").trim.stripSuffix(";")) {
      case (t, (from, to)) => t.replace(from, to)
    }
    subs.foldLeft(base) { case (t, (from, to)) => t.replaceAll(from, to) }
  }
}
