package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full reference pipeline shape: scan → clean → derive →
    * two-key aggregate (spark_processor.py:231-270 end-to-end). */
  def entry(spark: SparkSession): DataFrame =
    etl.Analyze.a5TwoKeySummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etl.Analyze.queries ++ etl.Projections.queries ++
      functions.FnQueries.queries ++ ext.SetOps.queries ++
      ext.Joins.queries ++ ext.WindowFns.queries ++
      ext.TextStats.queries ++ ext.Similarity.queries ++ ext.Dedup.queries ++
      sources.Sources.queries ++ functions.WelfordQueries.queries ++
      ext.Multimodal.queries ++ ext.Packing.queries ++ ext.Curate.queries ++
      ext.Classify.queries ++ ext.TrainOrder.queries ++
      ext.Snapshot.queries ++ ext.Graph.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    etl.Analyze.oracle ++ etl.Projections.oracle ++
      functions.FnQueries.oracle ++ ext.SetOps.oracle ++
      ext.Joins.oracle ++ ext.WindowFns.oracle ++
      ext.TextStats.oracle ++ ext.Similarity.oracle ++ ext.Dedup.oracle ++
      sources.Sources.oracle ++ functions.WelfordQueries.oracle ++
      ext.Multimodal.oracle ++ ext.Packing.oracle ++ ext.Curate.oracle ++
      ext.Classify.oracle ++ ext.TrainOrder.oracle ++
      ext.Snapshot.oracle ++ ext.Graph.oracle
}
