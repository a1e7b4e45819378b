package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ZOrderExpr

/** Z-ordered data layout — the write-side use of the reference's
  * `zorder` function (presto-iceberg/.../function/
  * IcebergZOrderFunctions.java; Iceberg's REWRITE DATA FILES ... sort_by
  * zorder procedure, RewriteDataFilesProcedure.java): cluster a table on
  * the Z (Morton) curve of several columns so every output file covers a
  * small range of EACH column, and parquet min/max stats prune selective
  * predicates on any of them.
  *
  * Spark-first shape: `repartitionByRange` on the z-key (range exchange
  * with sampled bounds — balanced output files regardless of skew in the
  * raw columns) + `sortWithinPartitions` so row groups inside each file
  * are also z-clustered. At 100 TB this is the difference between a
  * multi-dimensional pruned scan (read a few files for `a BETWEEN ... AND
  * b BETWEEN ...`) and a full-table scan on whichever column the single
  * sort key didn't cover.
  */
object Layout {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** The z-key column (Column-API twin of SQL `zorder(ROW(...))`). */
  def zorderKey(cols: Column*): Column = ZOrderExpr.column(cols: _*)

  /** Rewrite `df` z-clustered on `cols` into `files` parquet files. */
  def writeZOrdered(df: DataFrame, cols: Seq[Column], path: String,
      files: Int): Unit =
    df.withColumn("_z", zorderKey(cols: _*))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file bounding boxes of a written layout — the pruning quality a
    * stats-based reader sees (small boxes ⇒ selective predicates skip
    * files). Used by ZOrderSpec to pin that z-order beats a linear sort
    * on the second dimension. */
  def fileBoxes(s: SparkSession, path: String, xCol: String, yCol: String): DataFrame =
    s.read.parquet(path)
      .select(input_file_name().as("f"), col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("f")
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))

  /** Gate: the zorder key itself, pinned against a bit-level oracle. Two
    * bigint columns in [0, 255] encode as 0x80 00.. 00 vv each, so the
    * interleaved key is 0xC0, thirteen zero bytes, then the classic
    * 16-bit Morton interleave of the low bytes — a closed form DuckDB
    * can rebuild bit by bit. Also exercises the ROW-argument SQL
    * spelling (the reference's only signature) and NULL → all-zero
    * encoding. */
  def gateZorder(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_zo")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT p_partkey AS k,
        |    CAST(p_partkey % 256 AS BIGINT) AS x,
        |    CAST(p_size % 256 AS BIGINT) AS y
        |  FROM part_zo WHERE p_partkey <= 300)
        |SELECT k, x, y,
        |  lower(hex(zorder(named_struct('a', x, 'b', y)))) AS z,
        |  lower(hex(zorder(named_struct('a', CAST(NULL AS BIGINT),
        |    'b', CAST(NULL AS BIGINT))))) AS znull
        |FROM b ORDER BY k""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> gateZorder)

  /** Morton interleave of the low bytes, spelled as an 8-term bit sum
    * (x supplies the odd bit positions — column 0 leads). */
  private val mortonSql: String = (0 to 7).map { i =>
    s"((x >> $i) & 1) * ${1L << (2 * i + 1)} + ((y >> $i) & 1) * ${1L << (2 * i)}"
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "layout_zorder" ->
      s"""WITH b AS (SELECT p_partkey AS k,
         |    CAST(p_partkey % 256 AS BIGINT) AS x,
         |    CAST(p_size % 256 AS BIGINT) AS y
         |  FROM part WHERE p_partkey <= 300)
         |SELECT k, x, y,
         |  'c0' || repeat('00', 13) ||
         |    lpad(lower(hex($mortonSql)), 4, '0') AS z,
         |  repeat('00', 16) AS znull
         |FROM b ORDER BY k""".stripMargin)
}
