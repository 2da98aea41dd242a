package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's derived-column semantics (F1-F7) as plain Scala
  * functions returning `Column` — fully codegen'd by Catalyst, zero UDF
  * penalty, reusable in batch and streaming plans alike.
  *
  * Semantics reproduced from the reference:
  *  - AQI bucket thresholds: spark_processing/spark_processor.py:89-96
  *  - temperature categories: spark_processor.py:97-103
  *  - date parts:             spark_processor.py:104-119
  *  - pollution score:        spark_processor.py:121-131
  */
object AirQuality {

  /** F1 — 6-way AQI bucket from pm2.5 (spark_processor.py:89-96). */
  def aqiCategory(pm25: Column): Column =
    when(pm25 <= 12, "Good")
      .when(pm25 <= 35, "Moderate")
      .when(pm25 <= 55, "Unhealthy for Sensitive Groups")
      .when(pm25 <= 150, "Unhealthy")
      .when(pm25 <= 250, "Very Unhealthy")
      .otherwise("Hazardous")

  /** F2 — 5-way temperature category (spark_processor.py:97-103). */
  def tempCategory(tempC: Column): Column =
    when(tempC < 0, "Freezing")
      .when(tempC < 10, "Cold")
      .when(tempC < 20, "Cool")
      .when(tempC < 30, "Warm")
      .otherwise("Hot")

  /** F6+F7 — weighted pollution score, rounded to 2 decimals
    * (spark_processor.py:121-131). */
  def pollutionScore(pm25: Column, pm10: Column, no2: Column, o3: Column,
                     co: Column, so2: Column): Column =
    round(
      pm25 * 0.3 + pm10 * 0.25 + no2 * 0.2 + o3 * 0.15 + co * 0.05 + so2 * 0.05,
      2)

  /** F5 — date-part columns from an event timestamp
    * (spark_processor.py:107-119). Returned as (name, column) pairs so the
    * caller controls column placement. */
  def dateParts(ts: Column): Seq[(String, Column)] = Seq(
    "year"  -> year(ts),
    "month" -> month(ts),
    "day"   -> dayofmonth(ts),
    "hour"  -> hour(ts))
}
