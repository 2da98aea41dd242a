package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Ingest, Windows}

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)
case class KafkaMsg(value: String, offset: Long, partition: Int)

/** Structured Streaming semantics (T1-T9) driven through MemoryStream with
  * manually advanced event time — watermark closure, late-data drop,
  * session gaps, and stateful dedup. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("kafka-shaped ingest: from_json decode + lineage enrichment (S4/S6/F11/T5)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KafkaMsg]
    val q = Ingest.enrich(Ingest.decodeKafkaShape(in.toDF()))
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    in.addData(
      KafkaMsg("""{"location":"London","temp_c":15.5,"pm2_5":20.0,"timestamp":"2024-01-01T10:00:00"}""", 41L, 2),
      KafkaMsg("""not json at all""", 42L, 2))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ingest_out").collect()
    assert(out.length == 2)
    val ok = out.find(_.getAs[Long]("kafka_offset") == 41L).get
    assert(ok.getAs[String]("location") == "London")
    assert(ok.getAs[Float]("temp_c") == 15.5f)
    assert(ok.getAs[Int]("kafka_partition") == 2)
    assert(ok.getAs[String]("processed_timestamp") != null)
    // malformed JSON degrades to null fields, record is not lost (lineage kept)
    val bad = out.find(_.getAs[Long]("kafka_offset") == 42L).get
    assert(bad.getAs[String]("location") == null)
  }

  test("tumbling window closes on watermark; late rows are dropped (T6/T7)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Windows.tumblingHourly(in.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    in.addData(
      Ev(t("2024-01-01 10:05:00"), "click", 1, 10.0),
      Ev(t("2024-01-01 10:45:00"), "click", 1, 5.0))
    q.processAllAvailable()
    // watermark still inside the 10:00 window → nothing finalized yet
    assert(spark.table("tumbling_out").isEmpty)
    // advance event time well past 11:00 + 10 min watermark
    in.addData(Ev(t("2024-01-01 12:00:00"), "click", 1, 1.0))
    q.processAllAvailable()
    val closed = spark.table("tumbling_out").collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[Long]("n") == 2)
    assert(closed.head.getAs[Double]("sum_value") == 15.0)
    // a late row for the already-closed 10:00 window must be dropped
    in.addData(Ev(t("2024-01-01 10:30:00"), "click", 1, 99.0))
    in.addData(Ev(t("2024-01-01 14:00:00"), "click", 1, 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("tumbling_out")
      .filter(col("window_start") === t("2024-01-01 10:00:00")).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n") == 2)
  }

  test("session windows split on >5 min inactivity gaps (T9)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Windows.sessions(in.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    in.addData(
      Ev(t("2024-01-01 10:00:00"), "click", 7, 1.0),
      Ev(t("2024-01-01 10:03:00"), "click", 7, 2.0),  // same session
      Ev(t("2024-01-01 10:20:00"), "click", 7, 4.0))  // new session (17 min gap)
    in.addData(Ev(t("2024-01-01 12:00:00"), "click", 8, 0.0)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("session_out")
      .filter(col("user_id") === 7).orderBy(col("session_start")).collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(0).getAs[Double]("session_value") == 3.0)
    assert(sessions(1).getAs[Long]("n_events") == 1)
  }

  test("dropDuplicatesWithinWatermark keeps first occurrence only (T9)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Windows.dedupWithinWatermark(in.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(
      Ev(t("2024-01-01 10:00:00"), "click", 1, 1.0),
      Ev(t("2024-01-01 10:01:00"), "click", 1, 2.0),  // dup key within watermark
      Ev(t("2024-01-01 10:02:00"), "view", 1, 3.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Double]("value")).toSet == Set(1.0, 3.0))
  }

  test("checkpointed file sink is replayable and exactly-once (T3/T4/S5)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_sink").toString
    val in = MemoryStream[KafkaMsg]
    val enriched = Ingest.enrich(Ingest.decodeKafkaShape(in.toDF()))
    val q = enriched.writeStream.format("parquet")
      .option("path", s"$dir/data").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    in.addData(KafkaMsg("""{"location":"A","temp_c":1.0,"timestamp":"2024-01-01T00:00:00"}""", 1L, 0))
    in.addData(KafkaMsg("""{"location":"B","temp_c":2.0,"timestamp":"2024-01-01T00:00:10"}""", 2L, 0))
    q.processAllAvailable(); q.stop()
    val replayed = Ingest.replay(spark, s"$dir/data")
    assert(replayed.count() == 2)
    assert(replayed.select("location").as[String].collect().toSet == Set("A", "B"))
  }
}
