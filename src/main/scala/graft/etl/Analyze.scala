package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's five analysis aggregates (A1-A5) re-expressed over the
  * driver testdata. The reference groups air-quality observations by
  * `location` (spark_processing/spark_processor.py:156-189, :210-217); our
  * fact stream is `events`, whose low-cardinality dimension is
  * `event_type` — same shape: grouped hash aggregation with partial
  * (map-side) combine, one shuffle on the group key.
  *
  * All outputs are fully ordered with tie-breakers and float aggregates are
  * round(_, 2) for cross-engine determinism (the reference rounds the same
  * way, spark_processor.py:159-161).
  */
object Analyze {

  /** A1 — per-location multi-aggregate temperature summary
    * (spark_processor.py:156-163): avg/min/max/count per group. */
  def a1LocationStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(avg(col("value")), 2).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"),
        count(lit(1)).as("reading_count"))
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_location_stats" -> a1LocationStats
  )

  val oracle: Map[String, String] = Map(
    "a1_location_stats" ->
      """SELECT event_type,
        |  round(avg(value), 2) AS avg_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value,
        |  count(*) AS reading_count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
