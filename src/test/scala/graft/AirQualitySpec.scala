package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AirQuality

object TestSpark {
  /** Point the whole test JVM's IndexStore at its own scratch root
    * (before any suite serves) UNLESS a suite already re-pointed it:
    * the default root is shared with driver Verify/Bench runs, and
    * since sim31's retrain COMMIT is a registered query, a prior
    * driver run may have cut the shared store over to the committed
    * generation — suite pins must see a deterministic store, not
    * whichever lifecycle state the last production run left. Suites
    * with their own scratch (IndexStoreSpec et al.) still override. */
  lazy val storeScratch: java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_index_store_suite_${ProcessHandle.current().pid()}")
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory)
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete(): Unit
    }
    rm(f)
    f
  }

  /** Re-point the store at a FRESH per-suite scratch — for suites whose
    * pins assume the pre-commit (gen-1) index state and must not
    * inherit a sim31 commit another suite ran earlier in this JVM. The
    * shared session's per-session memos are invalidated too: a memoized
    * committed-generation view would otherwise outlive the store
    * re-point and keep serving gen2 from the session catalog. */
  def isolateStore(suite: String): Unit = {
    sys.props("graft.index.store") =
      new java.io.File(storeScratch, suite).getPath
    graft.ext.Similarity.invalidateCaches(spark)
  }

  lazy val spark: SparkSession = {
    if (!sys.props.contains("graft.index.store"))
      sys.props("graft.index.store") = storeScratch.getPath
    val s = Sessions.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Boundary tests for the derived-column semantics the reference defines
  * (spark_processor.py:89-131): bucket edges are inclusive upper bounds for
  * AQI (<=) and exclusive upper bounds for temperature (<). */
class AirQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def aqiOf(vals: Double*): Seq[String] =
    vals.toDF("pm2_5").select(AirQuality.aqiCategory(col("pm2_5")))
      .as[String].collect().toSeq

  private def tempOf(vals: Double*): Seq[String] =
    vals.toDF("temp_c").select(AirQuality.tempCategory(col("temp_c")))
      .as[String].collect().toSeq

  test("AQI bucket boundaries (<= semantics at 12/35/55/150/250)") {
    assert(aqiOf(12.0) == Seq("Good"))
    assert(aqiOf(12.01) == Seq("Moderate"))
    assert(aqiOf(35.0) == Seq("Moderate"))
    assert(aqiOf(35.01) == Seq("Unhealthy for Sensitive Groups"))
    assert(aqiOf(55.0) == Seq("Unhealthy for Sensitive Groups"))
    assert(aqiOf(55.01) == Seq("Unhealthy"))
    assert(aqiOf(150.0) == Seq("Unhealthy"))
    assert(aqiOf(150.01) == Seq("Very Unhealthy"))
    assert(aqiOf(250.0) == Seq("Very Unhealthy"))
    assert(aqiOf(250.01) == Seq("Hazardous"))
  }

  test("temperature bucket boundaries (< semantics at 0/10/20/30)") {
    assert(tempOf(-0.01) == Seq("Freezing"))
    assert(tempOf(0.0) == Seq("Cold"))
    assert(tempOf(9.99) == Seq("Cold"))
    assert(tempOf(10.0) == Seq("Cool"))
    assert(tempOf(19.99) == Seq("Cool"))
    assert(tempOf(20.0) == Seq("Warm"))
    assert(tempOf(29.99) == Seq("Warm"))
    assert(tempOf(30.0) == Seq("Hot"))
  }

  test("pollution score is the rounded weighted sum") {
    val row = Seq((10.0, 20.0, 30.0, 40.0, 50.0, 60.0))
      .toDF("pm2_5", "pm10", "no2", "o3", "co", "so2")
    val got = row.select(AirQuality.pollutionScore(
      col("pm2_5"), col("pm10"), col("no2"), col("o3"), col("co"), col("so2")))
      .as[Double].head()
    // 10*.3 + 20*.25 + 30*.2 + 40*.15 + 50*.05 + 60*.05 = 25.5
    assert(got == 25.5)
  }

  test("clean stage dedups full rows and drops null criticals") {
    val df = Seq(
      (Some("London"), Some(15.0), Some("2024-01-01T00:00:00")),
      (Some("London"), Some(15.0), Some("2024-01-01T00:00:00")), // exact dup
      (None, Some(15.0), Some("2024-01-01T00:00:00")),           // null location
      (Some("Paris"), None, Some("2024-01-01T00:00:00")),        // null temp
      (Some("Berlin"), Some(8.0), None)                          // null ts
    ).toDF("location", "temp_c", "timestamp")
    val cleaned = etl.Clean(df)
    assert(cleaned.count() == 1)
    assert(cleaned.select("location").as[String].head() == "London")
  }

  test("transform pipeline adds all 9 derived columns") {
    val df = Seq(("London", 15.0, "2024-03-05T07:30:00", 20.0, 30.0, 5.0, 8.0, 1.0, 2.0))
      .toDF("location", "temp_c", "timestamp", "pm2_5", "pm10", "no2", "o3", "co", "so2")
    val out = etl.Transform.derive(df)
    val expected = Set("air_quality_index", "temperature_category",
      "processing_date", "year", "month", "day", "hour", "pollution_score")
    assert(expected.subsetOf(out.columns.toSet))
    val r = out.select("air_quality_index", "temperature_category", "year",
      "month", "day", "hour").head()
    assert(r.getString(0) == "Moderate")
    assert(r.getString(1) == "Cool")
    assert((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)) == ((2024, 3, 5, 7)))
  }
}
