package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** §3.1 — the reference's batch ETL entry point composed end-to-end
  * (spark_processor.py:231-270): scan the JSON landing zone with the
  * declared schema, clean (dedup + null filters), derive the 9 columns,
  * then write BOTH sinks — the full history partitioned by
  * location/year/month (:202-205) and the location×AQI summary as a
  * single-file CSV (:210-224). This is the one call a reference user
  * switches their spark-submit job to.
  */
object BatchJob {

  /** The reference's persisted summary shape (spark_processor.py:210-217):
    * count + 4 rounded means per (location, AQI category). */
  def summarize(processed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    processed
      .groupBy(col("location"), col("air_quality_index"))
      .agg(count(lit(1)).as("count"),
        round(avg(col("temp_c")), 2).as("avg_temp"),
        round(avg(col("pm2_5")), 2).as("avg_pm25"),
        round(avg(col("humidity")), 2).as("avg_humidity"),
        round(avg(col("pollution_score")), 2).as("avg_pollution_score"))
      .orderBy(col("location"), col("air_quality_index"))

  /** Run the whole job; returns (history rows written, summary rows) —
    * the counts the reference logs. The processed frame is cached for the
    * job's lifetime (the reference does the same, spark_processor.py:255):
    * it feeds two sinks and the summary count, and without the cache the
    * scan + dedup shuffle + derivation would run once per action. The
    * history count re-reads the sink, so it also validates the
    * partitioned write. */
  def run(spark: SparkSession, jsonDir: String,
          parquetOut: String, csvOut: String): (Long, Long) = {
    val processed = Transform.pipeline(
      Sources.readAirQualityJson(spark, jsonDir)).cache()
    try {
      Sources.writePartitioned(processed, parquetOut)
      val summary = summarize(processed)
      Sources.writeSummaryCsv(summary, csvOut)
      (spark.read.parquet(parquetOut).count(), summary.count())
    } finally processed.unpersist()
  }
}
