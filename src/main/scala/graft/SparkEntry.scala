package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    tpch.Tpch.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Module key-spaces are disjoint (qNN / snake_case per area). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    tpch.Tpch.queries ++ ops.Relational.queries ++ ops.Windows.queries ++
      ops.Aggregates.queries ++ ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.TextAnalysis.queries ++ ops.Multimodal.queries ++
      ops.Scalars.queries ++ ops.Subqueries.queries ++ ops.Sources.queries ++
      ops.Spatial.queries ++ streaming.Streams.queries ++ tpcds.Tpcds.queries ++
      ops.Ddl.queries ++ ops.Ml.queries ++ ops.IndexJoin.queries ++
      ops.Remote.queries ++ ops.Cdc.queries ++ ops.Layout.queries ++
      ops.Transactions.queries ++ ops.AsOfJoin.queries ++
      ops.AvroSource.queries ++ ops.RangeJoin.queries ++
      ops.Verifier.queries ++ ops.RecordDecoders.queries ++
      ops.Rank.queries ++ ops.JdbcDialects.queries ++
      ops.SearchIndex.queries ++ ops.DocumentStore.queries ++
      ops.TimeSeriesStore.queries ++ ops.KeyedTable.queries ++
      ops.KeyValueStore.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    tpch.Tpch.oracle ++ ops.Relational.oracle ++ ops.Windows.oracle ++
      ops.Aggregates.oracle ++ ops.Dedup.oracle ++ ops.Similarity.oracle ++
      ops.TextAnalysis.oracle ++ ops.Multimodal.oracle ++
      ops.Scalars.oracle ++ ops.Subqueries.oracle ++ ops.Sources.oracle ++
      ops.Spatial.oracle ++ streaming.Streams.oracle ++ tpcds.Tpcds.oracle ++
      ops.Ddl.oracle ++ ops.Ml.oracle ++ ops.IndexJoin.oracle ++
      ops.Remote.oracle ++ ops.Cdc.oracle ++ ops.Layout.oracle ++
      ops.Transactions.oracle ++ ops.AsOfJoin.oracle ++
      ops.AvroSource.oracle ++ ops.RangeJoin.oracle ++
      ops.Verifier.oracle ++ ops.RecordDecoders.oracle ++
      ops.Rank.oracle ++ ops.JdbcDialects.oracle ++
      ops.SearchIndex.oracle ++ ops.DocumentStore.oracle ++
      ops.TimeSeriesStore.oracle ++ ops.KeyedTable.oracle ++
      ops.KeyValueStore.oracle
}
