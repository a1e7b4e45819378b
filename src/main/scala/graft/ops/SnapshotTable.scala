package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Managed table with snapshot-and-swap commits — the reference's
  * table-finish protocol in miniature (SPI/plan/TableFinishNode.java,
  * MAIN/operator/TableFinishOperator.java:68): every write lands in a NEW
  * versioned directory and becomes visible in one atomic pointer move, so
  * a concurrent reader sees the old snapshot or the new one, never a
  * partially-written mix. This is the same old-or-new contract
  * copy-on-write table formats give MERGE.
  *
  * Layout: `<base>/v<N>/` parquet snapshots + `<base>/_current` holding
  * the committed version number. The pointer flip is
  * `Files.move(..., ATOMIC_MOVE)` — atomic on POSIX; on object stores the
  * equivalent is a metastore pointer swap, which is exactly what the
  * reference's connectors do at 100 TB (the data files are immutable
  * either way, so the mechanism scales: commit cost is one pointer write,
  * not proportional to data).
  */
object SnapshotTable {
  private def pointer(base: java.io.File) = new java.io.File(base, "_current")

  /** The committed version, if any. */
  def currentVersion(base: java.io.File): Option[Int] = {
    val p = pointer(base)
    if (p.isFile)
      Some(new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8").trim.toInt)
    else None
  }

  private def versionDir(base: java.io.File, v: Int) =
    new java.io.File(base, s"v$v")

  /** Write `df` as the next snapshot and commit it atomically. Returns the
    * committed version. */
  def write(spark: SparkSession, base: java.io.File, df: DataFrame): Int = {
    base.mkdirs()
    val next = currentVersion(base).getOrElse(0) + 1
    df.write.mode("overwrite").parquet(versionDir(base, next).getAbsolutePath)
    // commit: write-temp + atomic rename (one pointer, old-or-new)
    val tmp = new java.io.File(base, s"_current.tmp$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, pointer(base).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** The committed snapshot. */
  def read(spark: SparkSession, base: java.io.File): DataFrame = {
    val v = currentVersion(base).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $base"))
    spark.read.parquet(versionDir(base, v).getAbsolutePath)
  }

  /** MERGE: transform the committed snapshot and commit the result as the
    * next version (copy-on-write). Readers concurrent with the merge see
    * the old snapshot until the pointer flips. */
  def merge(spark: SparkSession, base: java.io.File)
      (transform: DataFrame => DataFrame): Int =
    write(spark, base, transform(read(spark, base)))

  /** Drop the table (all snapshots + pointer). */
  def drop(base: java.io.File): Unit = {
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rec)
      f.delete(); ()
    }
    if (base.exists()) rec(base)
  }
}
