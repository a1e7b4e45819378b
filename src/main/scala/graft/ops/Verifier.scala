package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Result-checksum validation — the presto-verifier's core technique
  * (presto-verifier/src/main/java/com/facebook/presto/verifier/checksum/
  * ChecksumValidator.java): instead of shipping two full result sets to
  * compare, run ONE aggregate query per side that reduces every column to
  * an order-independent checksum, then compare the tiny checksum rows.
  * Column families follow the reference's validators:
  *
  *  - floating point (FloatingPointColumnValidator.java): a sum plus a
  *    value count — bitwise checksums are meaningless across engines that
  *    reorder additions, so the verifier compares sums within tolerance;
  *    here the repo-wide decimal-cast sum ([[Tables.dsum]]) makes the sum
  *    itself engine-exact.
  *  - everything else (SimpleColumnValidator.java): an order-independent
  *    XOR of per-value hashes. The reference uses its own checksum()
  *    aggregate; here the hash is the first 60 bits of md5 over a
  *    canonical string rendering, so any engine (Spark, DuckDB, ...)
  *    reproduces it bit-for-bit. Arrays would sort first
  *    (OrderableArrayColumnValidator.java) — same canonical-string idea.
  *
  * XOR is commutative/associative → the aggregate is shuffle-order
  * independent and partially aggregates map-side; at 100 TB a checksum
  * run is one scan + one 1-row reduce, exactly why the verifier uses this
  * shape against production clusters.
  */
object Verifier {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** 60-bit md5 xor over a canonical string column. */
  private def xorChecksum(canon: String, alias: String): Column =
    expr(s"bit_xor(CAST(conv(substring(md5($canon), 1, 15), 16, 10) AS BIGINT))")
      .as(alias)

  /** The one-row checksum aggregate for an arbitrary result frame. */
  def checksum(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType => Seq(
          Tables.dsum(col(f.name), s"${f.name}_sum"),
          count(col(f.name)).as(s"${f.name}_count"))
        case TimestampType | TimestampNTZType => Seq(
          xorChecksum(s"date_format(`${f.name}`, 'yyyy-MM-dd HH:mm:ss')",
            s"${f.name}_checksum"))
        case _ => Seq(
          xorChecksum(s"CAST(`${f.name}` AS STRING)", s"${f.name}_checksum"))
      }
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Gate: checksum the lineitem table's representative column families
    * (bigint, int, varchar, timestamp, double). */
  def lineitemChecksum(s: SparkSession, dir: String): DataFrame =
    checksum(t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_shipdate"), col("l_quantity"), col("l_extendedprice")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "verifier_checksum" -> lineitemChecksum)

  val oracle: Map[String, String] = Map(
    "verifier_checksum" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
        |    AS BIGINT)) AS l_orderkey_checksum,
        |  bit_xor(CAST('0x' || substr(md5(CAST(l_linenumber AS VARCHAR)), 1, 15)
        |    AS BIGINT)) AS l_linenumber_checksum,
        |  bit_xor(CAST('0x' || substr(md5(l_returnflag), 1, 15)
        |    AS BIGINT)) AS l_returnflag_checksum,
        |  bit_xor(CAST('0x' || substr(md5(strftime(l_shipdate,
        |    '%Y-%m-%d %H:%M:%S')), 1, 15) AS BIGINT)) AS l_shipdate_checksum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18, 6))) AS DOUBLE)
        |    AS l_quantity_sum,
        |  CAST(count(l_quantity) AS BIGINT) AS l_quantity_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 6))) AS DOUBLE)
        |    AS l_extendedprice_sum,
        |  CAST(count(l_extendedprice) AS BIGINT) AS l_extendedprice_count
        |FROM lineitem""".stripMargin)
}
