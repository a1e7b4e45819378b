package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-reader overhead check: the same aggregation over sf lineitem as
  * (a) a plain parquet scan, (b) a Delta table built IN PLACE over the
  * same files (convertToDelta — zero copy, so byte-identical data), and
  * (c) an Iceberg table listing the same files. The three should be
  * within noise of each other: the lake layers are KB-scale metadata
  * resolution in front of the identical distributed parquet scan.
  * Prints ONE JSON line. */
object BenchLake {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-bench-lake").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage lineitem as a directory we can convert in place
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_benchlake_" + Integer.toHexString(sfDir.hashCode))
    val delta = new java.io.File(work, "delta")
    val ice = new java.io.File(work, "ice")
    if (!new java.io.File(delta, "_delta_log").exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(work)
      val li = Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag")
      li.write.parquet(delta.getPath)
      ops.DeltaLake.convertToDelta(spark, delta.getPath)
      ice.mkdirs()
      val entries = Option(delta.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .zipWithIndex.map { case (f, i) =>
          val name = f"li-$i%05d.parquet"
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(new java.io.File(ice, "data"),
              name).toPath.tap(_.getParent.toFile.mkdirs()))
          ops.IcebergTable.Entry(1, s"data/$name")
        }.toSeq
      ops.IcebergTable.commitSnapshot(ice, 1, 1L, entries)
    }

    def agg(df: DataFrame): Long =
      df.filter(col("l_discount") > 0.02)
        .groupBy("l_returnflag")
        .agg(count(lit(1)), sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))))
        .collect().length.toLong

    def time(f: => Long): Double = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val plain = time(agg(spark.read.parquet(delta.getPath)))
    val dl = time(agg(ops.DeltaLake.read(spark, delta.getPath)))
    val ib = time(agg(ops.IcebergTable.read(spark, ice.getPath)))
    println(f"""{"metric":"lake_overhead","unit":"sec","plain":$plain%.4f,"delta":$dl%.4f,"iceberg":$ib%.4f,"delta_ratio":${dl / plain}%.3f,"iceberg_ratio":${ib / plain}%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }

  private implicit class Tap[A](private val a: A) extends AnyVal {
    def tap(f: A => Unit): A = { f(a); a }
  }
}
