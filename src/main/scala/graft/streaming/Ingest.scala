package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
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

  /** T4 — batch replay of everything the sink has written (the
    * reference's earliest-offset reread, consumer.py:50). */
  def replay(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Tables.airQualitySchema).parquet(path)
}
