package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.AirQuality

/** The reference's derived-column stage (spark_processing/
  * spark_processor.py:89-132): widens a cleaned 17-column air-quality
  * frame with 9 derived columns. Composable `DataFrame => DataFrame` so
  * batch and streaming share one code path.
  */
object Transform {

  /** All 9 derived columns of spark_processor.py:89-132. `timestamp`
    * arrives as an ISO-8601 string (producer.py:81) and is parsed once. */
  def derive(df: DataFrame): DataFrame = {
    val ts = to_timestamp(col("timestamp"))
    val withBuckets = df
      .withColumn("air_quality_index", AirQuality.aqiCategory(col("pm2_5")))
      .withColumn("temperature_category", AirQuality.tempCategory(col("temp_c")))
      .withColumn("processing_date", current_date())
    val withDates = AirQuality.dateParts(ts).foldLeft(withBuckets) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withDates.withColumn(
      "pollution_score",
      AirQuality.pollutionScore(col("pm2_5"), col("pm10"), col("no2"),
        col("o3"), col("co"), col("so2")))
  }

  /** Full clean→derive pipeline (spark_processor.py:250-255 shape). */
  def pipeline(df: DataFrame): DataFrame = derive(Clean(df))
}
