package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.Tables

/** The streaming ingest pipeline (SURVEY §2.9 / §3.3): the reference's
  * producer→Kafka→consumer→HDFS chain (producer.py:107-132,
  * consumer.py:140-169) collapsed into one Structured Streaming query:
  *
  *   source → from_json(wire schema) → lineage enrichment → partitioned
  *   file sink with checkpointing
  *
  * The source is pluggable: in production `format("kafka")` yields exactly
  * the (value, offset, partition, timestamp) columns this pipeline
  * consumes; in this zero-egress environment the same shape is fed from a
  * file source or MemoryStream (tests). Checkpointed micro-batch parquet
  * replaces the reference's one-file-per-record WebHDFS writes
  * (consumer.py:69-77) — at scale that's the difference between O(batches)
  * and O(records) NameNode objects — and upgrades at-least-once
  * (consumer.py:51,169) to exactly-once.
  */
object Ingest {

  /** S4 — consumer-side Kafka reader options, mirroring the reference
    * consumer (consumer.py:44-61): subscribe one topic, replay from the
    * earliest offset, don't kill the query when retention expires old
    * offsets. Exposed as a Map so assembly is unit-testable in a
    * zero-egress environment. */
  def kafkaSourceOptions(brokers: String, topic: String,
                         startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "failOnDataLoss" -> "false")

  /** S4 — the configured `format("kafka")` reader. `.load()` yields the
    * (key, value, topic, partition, offset, timestamp, …) frame that
    * [[decodeKafkaShape]] consumes; it needs the kafka connector on the
    * cluster classpath, so this builder stops at the reader. */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String,
                  startingOffsets: String = "earliest"): DataStreamReader =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(brokers, topic, startingOffsets))

  /** S3 — producer-side Kafka options (producer.py:19-33: acks=all for
    * durable publish; value serialization is [[toKafkaRecords]]). */
  def kafkaSinkOptions(brokers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "topic" -> topic,
    "kafka.acks" -> "all")

  /** S3 — serialize any frame to Kafka's wire contract: one JSON `value`
    * column per row (producer.py:26's value_serializer as a Spark
    * expression — codegen'd to_json, no driver round-trip). */
  def toKafkaRecords(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("*"))).as("value"))

  /** S3 — checkpointed Kafka producer sink. Exactly-once into the broker
    * is Kafka-transactional territory; this matches the reference's
    * at-least-once acks=all publish, upgraded with checkpointed offsets so
    * a restart never re-reads the source from scratch. */
  def kafkaSink(df: DataFrame, brokers: String, topic: String,
                checkpoint: String): DataStreamWriter[Row] =
    toKafkaRecords(df).writeStream
      .format("kafka")
      .options(kafkaSinkOptions(brokers, topic))
      .option("checkpointLocation", checkpoint)

  /** S1 — the HTTP poll source, simulated. The reference polls a weather
    * API every 10 s and emits one nested JSON payload per city
    * (producer.py:35-61, loop at :132). Zero-egress stand-in: a rate-family
    * source provides the tick stream and each tick is rendered
    * deterministically into the same nested payload shape — so
    * flatten (S2) → enrich (S6) → sink (S5) runs end-to-end against a
    * live unbounded stream, exactly as it would against the real API.
    * Pass `rate-micro-batch` + `rowsPerBatch` for deterministic tests;
    * plain `rate` + `rowsPerSecond` for wall-clock pacing. */
  def simulatedHttpSource(spark: SparkSession,
                          format: String = "rate",
                          options: Map[String, String] = Map("rowsPerSecond" -> "1")): DataFrame =
    renderPayload(spark.readStream.format(format).options(options).load())

  /** Tick frame (timestamp, value) → nested API payload. Pure per-row
    * column ops — identical on a batch frame, which is how it's
    * deterministically unit-tested. */
  private[graft] def renderPayload(ticks: DataFrame): DataFrame = {
    val cities = array(Seq("Delhi", "London", "Tokyo", "Lagos", "Lima").map(lit): _*)
    def pollutant(scale: Int): Column =
      round(pmod(col("value") * scale, lit(3000)) / 10.0, 1)
    ticks
      .select(
        struct(
          element_at(cities, pmod(col("value"), lit(5)).cast("int") + 1).as("name"),
          lit("Region").as("region"),
          lit("Country").as("country"),
          date_format(col("timestamp"), "yyyy-MM-dd HH:mm").as("localtime")
        ).as("location"),
        struct(
          (pmod(col("value"), lit(40)) - lit(5)).cast("float").as("temp_c"),
          pmod(col("value"), lit(100)).cast("int").as("humidity"),
          struct(lit("Clear").as("text")).as("condition"),
          struct(pollutant(7).as("co"), pollutant(11).as("no2"),
            pollutant(13).as("o3"), pollutant(17).as("so2"),
            pollutant(19).as("pm2_5"), pollutant(23).as("pm10")
          ).as("air_quality")
        ).as("current"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"))
  }

  /** S4+F11 — decode a Kafka-shaped stream: JSON `value` bytes/string plus
    * (offset, partition) broker metadata → typed observation columns. */
  def decodeKafkaShape(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .select(
        from_json(col("value").cast("string"), Tables.airQualityWireSchema)
          .as("rec"),
        col("offset").as("kafka_offset"),
        col("partition").as("kafka_partition"))
      .select(col("rec.*"), col("kafka_offset"), col("kafka_partition"))

  /** S6 — lineage enrichment: processing timestamp stamped per record
    * (consumer.py:97-100). */
  def enrich(decoded: DataFrame): DataFrame =
    decoded.withColumn("processed_timestamp",
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"))

  /** T1+T3+S5 — checkpointed partitioned parquet sink, 10 s processing-time
    * trigger (producer.py:132's cadence), exactly-once. */
  def sink(enriched: DataFrame, path: String,
           checkpoint: String): DataStreamWriter[Row] =
    enriched.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .outputMode("append")

  /** T10 — stream-static dimension enrichment: join the live stream
    * against a slowly-changing dimension table. The static side joins
    * BROADCAST, so the unbounded stream side never shuffles and carries
    * no join state (unlike stream-stream joins there is nothing to
    * watermark); Structured Streaming re-plans the static side per
    * micro-batch, so a refreshed dimension file is picked up on the
    * next batch without restarting the query. Left join: a stream
    * record with no dimension row passes through with nulls instead of
    * silently dropping (the reference never loses a reading either). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** T4 — batch replay of everything the sink has written (the
    * reference's earliest-offset reread, consumer.py:50). */
  def replay(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Tables.airQualitySchema).parquet(path)
}
