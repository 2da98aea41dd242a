package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Sources

/** S21' — the landing-directory sync as a STREAM (r13 verdict ask #7):
  * a `FileStreamSource` discovers newly landed parquet (checkpointed
  * offsets replace s21's manifest — the Auto Loader shape end-to-end)
  * and each micro-batch publishes the next state version through the
  * SAME aggregate/merge kernels the manifest-based
  * [[Sources.incrementalSync]] uses ([[Sources.eventDelta]] /
  * [[Sources.mergeState]]) into the SAME versioned layout — so s22's
  * time travel reads a stream-maintained history identically, and
  * StreamingSpec pins stream ≡ manifest on the same landed waves.
  *
  * Retry discipline: `foreachBatch` may RE-DELIVER a batch id after a
  * failure between the body and the commit. The state write is
  * versioned and immutable, so a blind re-run would publish a
  * duplicate version — double-counting the batch in the history s22
  * serves. The WAP answer: a per-batch marker commits LAST, and a
  * batch id whose marker exists is a no-op — the version count must
  * not advance under replay (spec-pinned). Unlike the fold family
  * this twin needs no [[FoldRestart]] guard: its state lives in the
  * versioned store, not the JVM, so a restart resumes correctly from
  * whatever the markers say is done. */
object IngestSync {

  /** The foreachBatch body — public so the replay spec can re-deliver
    * a committed batch id directly and assert the no-op. */
  def onBatch(stateRoot: String, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val marker = new Path(s"$stateRoot/batches/b$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return // re-delivered batch: WAP no-op
    if (!batch.isEmpty) {
      val versions = Sources.stateVersions(spark, stateRoot)
      val prev = versions.lastOption.map(v =>
        spark.read.parquet(s"$stateRoot/versions/v$v"))
      val merged = Sources.mergeState(prev, Sources.eventDelta(batch))
      val next = versions.lastOption.getOrElse(0) + 1
      merged.write.mode("overwrite").parquet(s"$stateRoot/versions/v$next")
    }
    fs.create(marker, true).close() // commit marker LAST
  }

  /** Drain everything currently landed (Trigger.AvailableNow — the
    * scheduled-ingest posture; a continuous deployment would drop the
    * trigger and keep the same body). The landing dir must hold at
    * least one file at first start: the stream's schema is read from
    * the landed parquet itself, which is also the s21 contract (a sync
    * against nothing is a no-op there too). */
  def start(spark: SparkSession, landing: String, stateRoot: String,
            checkpoint: String): StreamingQuery =
    spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .parquet(landing)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(stateRoot, batch.toDF(), id)
      }
      .start()
}
