package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function operators (SURVEY §2.8 F1-F14), each exercised through a
  * deterministic aggregate/ordered projection so it is oracle-checkable.
  * All are built-in codegen'd functions — no UDFs anywhere (the reference
  * defines zero UDFs either, spark_processor.py:2).
  */
object FnQueries {

  /** F1 — the 6-way AQI CASE WHEN bucket (spark_processor.py:89-96)
    * applied to the events measure. */
  def f1AqiBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("aqi_category", AirQuality.aqiCategory(col("value")))
      .groupBy(col("aqi_category")).agg(count(lit(1)).as("n"))
      .orderBy(col("aqi_category"))

  /** F2 — the 5-way temperature CASE WHEN (spark_processor.py:97-103);
    * value-100 shifts the measure so every bucket incl. Freezing is hit. */
  def f2TempBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("temp_category", AirQuality.tempCategory(col("value") - 100))
      .groupBy(col("temp_category")).agg(count(lit(1)).as("n"))
      .orderBy(col("temp_category"))

  /** F3+F10 — current_date/current_timestamp generation
    * (spark_processor.py:104-106, producer.py:81). Non-deterministic →
    * rows-only check, no oracle. */
  def f3CurrentDate(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).agg(
      count(lit(1)).as("n"),
      first(current_date()).as("processing_date"),
      first(date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")).as("iso_now"))

  /** F4+F5+F12 — string→timestamp parse + date parts
    * (spark_processor.py:107-119; dashboard.py:98): format o_orderdate to an
    * ISO string, parse it back, extract parts. */
  def f4DatePartsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val parsed = to_timestamp(
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss")
    Tables.orders(spark, dir)
      .select(year(parsed).as("y"), month(parsed).as("m"), dayofmonth(parsed).as("d"))
      .groupBy(col("y"), col("m")).agg(count(lit(1)).as("n"), max(col("d")).as("max_day"))
      .orderBy(col("y"), col("m"))
  }

  /** F6+F7 — weighted linear score + round(_,2)
    * (spark_processor.py:121-131) over lineitem measures. */
  def f6WeightedScore(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("score",
        round(col("l_quantity") * 0.3 + col("l_extendedprice") * 0.25 +
          col("l_discount") * 0.2 + col("l_tax") * 0.15 +
          col("l_linenumber") * 0.05 + col("l_partkey") * 0.05, 2))
      .groupBy(col("l_returnflag"))
      .agg(round(avg(col("score")), 2).as("avg_score"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** F8 — regexp_replace (consumer.py:68's character normalization). */
  def f8RegexpReplace(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(regexp_replace(col("text"), "[aeiou]", "*"), 1, 40).as("frag"))
      .orderBy(col("doc_id"))
      .limit(100)

  /** F9 — date_format (consumer.py:67 strftime naming). */
  def f9DateFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("month_total"))
      .orderBy(col("order_month"))

  /** F11 — JSON path extraction (producer.py:24 / consumer.py:53 round-trip;
    * the events.props column is a JSON string). */
  def f11JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("k_mod"))

  /** F13 — coalesce default-on-missing (producer.py:83-88's 0-defaults). */
  def f13Coalesce(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("kind",
        coalesce(nullif(col("event_type"), lit("error")), lit("unknown")))
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .orderBy(col("kind"))

  /** F14 — array functions over the embeddings column
    * (ArrayType(FloatType)): size + element access + aggregation. */
  def f14ArrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        max(size(col("embedding"))).as("dim"),
        round(avg(element_at(col("embedding"), 1)), 4).as("avg_first"))
      .orderBy(col("label"))

  /** F15 — calendar-spine generation + gap-filling join: a continuous
    * daily date dimension spanning the data's own range (one `sequence`
    * explode from a single min/max row — spine size is bounded by the
    * TIME RANGE, never the corpus), left-joined to map-side-combined
    * daily counts so absent days surface as explicit gap rows — the
    * dimension table w7's gap DETECTION needs to enumerate what's
    * missing (time-series models train on the filled frame, not the
    * sparse one). Monthly rollup keeps the registered output
    * calendar-bounded; the spine↔counts join is date-keyed and tiny on
    * both sides (Catalyst broadcasts it). */
  def f15DateSpine(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir).select(to_date(col("ts")).as("d"))
    val spine = days.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val daily = days.groupBy(col("d")).agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("d"), "left")
      .groupBy(year(col("d")).as("year"), month(col("d")).as("month"))
      .agg(count(lit(1)).as("n_days"),
        count(col("n")).as("n_active_days"),
        (count(lit(1)) - count(col("n"))).as("n_gap_days"),
        sum(coalesce(col("n"), lit(0L))).as("n_events"))
      .orderBy(col("year"), col("month"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f15_date_spine" -> f15DateSpine,
    "f1_aqi_bucket" -> f1AqiBucket,
    "f2_temp_bucket" -> f2TempBucket,
    "f3_current_date" -> f3CurrentDate,
    "f4_dateparts_roundtrip" -> f4DatePartsRoundtrip,
    "f6_weighted_score" -> f6WeightedScore,
    "f8_regexp_replace" -> f8RegexpReplace,
    "f9_date_format" -> f9DateFormat,
    "f11_json_extract" -> f11JsonExtract,
    "f13_coalesce" -> f13Coalesce,
    "f14_array_fns" -> f14ArrayFns
  )

  val oracle: Map[String, String] = Map(
    "f15_date_spine" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS d FROM events),
        |r AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |    AS d
        |  FROM r),
        |daily AS (SELECT d, count(*) AS n FROM e GROUP BY d)
        |SELECT CAST(year(s.d) AS INT) AS year,
        |  CAST(month(s.d) AS INT) AS month,
        |  count(*) AS n_days, count(n) AS n_active_days,
        |  CAST(count(*) - count(n) AS BIGINT) AS n_gap_days,
        |  CAST(sum(coalesce(n, 0)) AS BIGINT) AS n_events
        |FROM spine s LEFT JOIN daily USING (d)
        |GROUP BY 1, 2 ORDER BY year, month""".stripMargin,
    "f1_aqi_bucket" ->
      """SELECT CASE WHEN value <= 12 THEN 'Good'
        |  WHEN value <= 35 THEN 'Moderate'
        |  WHEN value <= 55 THEN 'Unhealthy for Sensitive Groups'
        |  WHEN value <= 150 THEN 'Unhealthy'
        |  WHEN value <= 250 THEN 'Very Unhealthy'
        |  ELSE 'Hazardous' END AS aqi_category, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY aqi_category""".stripMargin,
    "f2_temp_bucket" ->
      """SELECT CASE WHEN value - 100 < 0 THEN 'Freezing'
        |  WHEN value - 100 < 10 THEN 'Cold'
        |  WHEN value - 100 < 20 THEN 'Cool'
        |  WHEN value - 100 < 30 THEN 'Warm'
        |  ELSE 'Hot' END AS temp_category, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY temp_category""".stripMargin,
    "f4_dateparts_roundtrip" ->
      """SELECT CAST(year(t) AS INT) AS y, CAST(month(t) AS INT) AS m,
        |  count(*) AS n, CAST(max(day(t)) AS INT) AS max_day
        |FROM (SELECT strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
        |  '%Y-%m-%d %H:%M:%S') AS t FROM orders)
        |GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "f6_weighted_score" ->
      """SELECT l_returnflag,
        |  round(avg(round(l_quantity * 0.3 + l_extendedprice * 0.25 +
        |    l_discount * 0.2 + l_tax * 0.15 + l_linenumber * 0.05 +
        |    l_partkey * 0.05, 2)), 2) AS avg_score,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f8_regexp_replace" ->
      """SELECT doc_id, substr(regexp_replace(text, '[aeiou]', '*', 'g'), 1, 40) AS frag
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin,
    "f9_date_format" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS month_total
        |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin,
    "f11_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
        |  count(*) AS n, round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "f13_coalesce" ->
      """SELECT coalesce(nullif(event_type, 'error'), 'unknown') AS kind,
        |  count(*) AS n FROM events GROUP BY 1 ORDER BY kind""".stripMargin,
    "f14_array_fns" ->
      """SELECT label, count(*) AS n, CAST(max(len(embedding)) AS INT) AS dim,
        |  round(avg(embedding[1]), 4) AS avg_first
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
