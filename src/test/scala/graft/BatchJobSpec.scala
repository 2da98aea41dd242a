package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.BatchJob
import graft.streaming.Ingest

/** The composed batch entry point: landing JSON in, partitioned history +
  * summary CSV out, with the reference's derived columns intact. */
class BatchJobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("batch job lands JSON, derives, and writes both sinks") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("batchjob").toString
    // landing zone: 40 observations through the real wire path
    val ticks = (0 until 40)
      .map(i => (new Timestamp(1704100000000L + i * 10000L), i.toLong))
      .toDF("timestamp", "value")
    // one JSON file per record — the reference consumer's landing layout
    // (consumer.py:69-77), which is what the multiline schema'd scan reads
    val landing = java.nio.file.Paths.get(s"$root/landing")
    java.nio.file.Files.createDirectories(landing)
    Ingest.enrich(
      graft.sources.Sources.flattenApiPayload(Ingest.renderPayload(ticks)))
      .toJSON.collect().zipWithIndex.foreach { case (json, i) =>
        java.nio.file.Files.writeString(landing.resolve(f"rec_$i%04d.json"), json)
      }

    val (historyRows, summaryRows) =
      BatchJob.run(spark, s"$root/landing", s"$root/history", s"$root/summary")
    assert(historyRows == 40)
    assert(summaryRows > 0)

    // history is hive-partitioned by location and readable with pruning
    val history = spark.read.parquet(s"$root/history")
    assert(history.count() == 40)
    assert(history.columns.contains("air_quality_index"))
    assert(history.columns.contains("pollution_score"))
    val delhiOnly = history.filter(col("location") === "Delhi")
    assert(delhiOnly.count() == 8) // 40 ticks round-robin over 5 cities
    // partition dirs exist on disk
    val dirs = new java.io.File(s"$root/history").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("location=")))

    // summary CSV: one file, header, expected shape
    val csvFiles = new java.io.File(s"$root/summary").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(csvFiles.length == 1)
    val summary = spark.read.option("header", "true").csv(s"$root/summary")
    assert(summary.columns.toSeq == Seq("location", "air_quality_index",
      "count", "avg_temp", "avg_pm25", "avg_humidity", "avg_pollution_score"))
    assert(summary.select(sum(col("count").cast("long"))).head().getLong(0) == 40)
  }
}
