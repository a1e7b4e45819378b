package graft.api

import org.apache.spark.sql.SparkSession

/** FROM-position lake-table scans in SQL text — the dialect's equivalent
  * of the reference's delta/hudi/iceberg CATALOGS (there a table name
  * resolves through the connector; here, with no external metastore, the
  * table function spelling names the path directly, like DuckDB's
  * delta_scan):
  *
  *   SELECT ... FROM delta_scan('/path/to/table') ...
  *   SELECT ... FROM hudi_scan('/path') / iceberg_scan('/path')
  *   ... iceberg_scan('/path', <snapshot-id>)   -- time travel
  *   ... delta_scan('/path', <version>)         -- time travel
  *   ... hudi_scan('/path', '<instant>')        -- time travel
  *
  * Each occurrence registers the reader's DataFrame as a deterministic
  * temp view at translate time and the text is rewritten to that view —
  * the scan itself stays a fully distributed multi-file parquet read
  * (ops/DeltaLake.scala, ops/HudiCow.scala, ops/IcebergTable.scala);
  * only KB-sized log/manifest metadata is touched here. Occurrences
  * inside string literals are left alone. */
object LakeScans {

  private val InsertPat =
    """(?is)\AINSERT\s+INTO\s+(delta|iceberg)_scan\s*\(\s*'([^']+)'\s*\)\s+(.+)\z""".r

  /** INSERT INTO delta_scan('/p') / iceberg_scan('/p') SELECT ... — the
    * SQL-text surface over the engine's lake append writers
    * (ops/DeltaLake.insert, ops/IcebergTable.insertAppend). Positional
    * insert with coercion to the table's column types, the same contract
    * as managed-table INSERT; returns the landed row count. Must run
    * BEFORE the FROM-position scan rewrite or the target spelling would
    * be swallowed as a read. */
  def dispatchInsert(ses: SqlSession, text: String)
      : Option[org.apache.spark.sql.DataFrame] = text.trim match {
    case InsertPat(kind, path, query) =>
      import org.apache.spark.sql.functions.col
      val spark = ses.spark
      def read() = kind.toLowerCase match {
        case "delta" => graft.ops.DeltaLake.read(spark, path)
        case _ => graft.ops.IcebergTable.read(spark, path)
      }
      val target = read().schema
      val src = ses.sql(query)
      if (src.schema.length != target.length)
        throw new IllegalArgumentException(
          s"Insert column count ${src.schema.length} does not match " +
            s"table (${target.length})")
      val aligned = src.select(src.columns.zip(target.fields).map {
        case (c, f) => col(c).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      val before = read().count()
      kind.toLowerCase match {
        case "delta" => graft.ops.DeltaLake.insert(spark, path, aligned)
        case _ => graft.ops.IcebergTable.insertAppend(spark, path, aligned)
      }
      Some(DdlStatements.rowsResult(spark, read().count() - before))
    case _ => None
  }

  private val Pat =
    ("""(?i)\b(delta|hudi|iceberg)_scan\s*\(\s*'([^']+)'""" +
      """\s*(?:,\s*('?)([^)']+)\3\s*)?\)""").r

  /** Blank string literals so matching never fires inside them
    * (same single-quote doubling rule as the dialect). */
  private def masked(text: String): String = {
    val sb = new StringBuilder(text)
    var i = 0
    var inStr = false
    while (i < sb.length) {
      if (sb.charAt(i) == '\'') inStr = !inStr
      else if (inStr) sb.setCharAt(i, ' ')
      i += 1
    }
    sb.toString
  }

  def rewrite(spark: SparkSession, text: String): String = {
    val m = masked(text)
    val hits = Pat.findAllMatchIn(m).toSeq
    if (hits.isEmpty) return text
    val sb = new StringBuilder(text)
    // replace right-to-left so earlier offsets stay valid
    hits.reverseIterator.foreach { h =>
      val kind = text.substring(h.start(1), h.end(1)).toLowerCase
      val path = text.substring(h.start(2), h.end(2))
      val arg = Option(h.group(4))
        .map(_ => text.substring(h.start(4), h.end(4)).trim)
      val df = (kind, arg) match {
        case ("delta", None) => graft.ops.DeltaLake.read(spark, path)
        case ("delta", Some(v)) =>
          graft.ops.DeltaLake.readVersion(spark, path, v.toLong)
        case ("hudi", None) => graft.ops.HudiCow.read(spark, path)
        case ("hudi", Some(i)) => graft.ops.HudiCow.readAt(spark, path, i)
        case ("iceberg", None) => graft.ops.IcebergTable.read(spark, path)
        case ("iceberg", Some(sid)) =>
          graft.ops.IcebergTable.readAt(spark, path, sid.toLong)
        case other => throw new IllegalArgumentException(other.toString)
      }
      val view = s"graft_${kind}_scan_" + java.lang.Integer.toHexString(
        (path + arg.getOrElse("")).hashCode)
      df.createOrReplaceTempView(view)
      sb.replace(h.start, h.end, view)
    }
    sb.toString
  }
}
