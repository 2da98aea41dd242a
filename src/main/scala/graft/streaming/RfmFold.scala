package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A28's streaming twin — live RFM segmentation. The per-user
  * (last_day, freq, cents) triple is a mergeable monoid (max / sum /
  * sum), so the fold's state IS the batch op's own per-user reduction
  * ([[graft.etl.Analyze.rfmPerUser]]): per batch one distributed pass
  * collapses the micro-batch to per-user partials, merged into the
  * state frame by one groupBy (max, sum, sum); serve replays
  * [[graft.etl.Analyze.rfmFromUsers]] — the identical anchor/bucket/
  * census arithmetic — over the folded frame. The recency anchor
  * recomputes from the state's own max day, so it ADVANCES with the
  * stream (the a29' advancing-horizon device): a user who goes quiet
  * drifts into worse R buckets as later batches move the anchor, with
  * no wall clock anywhere.
  *
  * Stream ≡ batch parity is exact and order-immune (all three
  * components ignore arrival order). State is USER-sized, distributed,
  * checkpointed per fold (the TransitionFold discipline). freq/cents
  * are ADDITIVE ⇒ [[onBatch]] carries the batchId and drops
  * foreachBatch retries; restart = [[rebuildFrom]].
  */
class RfmStreamFold extends Serializable {

  private var users: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (ts, user_id, event_type,
    * value, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.etl.Analyze.rfmPerUser(batch)
    val merged = synchronized(users) match {
      case Some(u) => u.unionByName(partials)
        .groupBy(col("user_id"))
        .agg(max(col("last_day")).as("last_day"),
          sum(col("freq")).as("freq"),
          sum(col("cents")).as("cents"))
      case None => partials
    }
    val ck = merged.localCheckpoint(true)
    synchronized { users = Some(ck) }
  }

  /** The foreachBatch body: fold unless this batchId already folded
    * (additive freq/cents must not double on a retry). */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The a28-shaped segment census over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = synchronized(users) match {
    case Some(u) => graft.etl.Analyze.rfmFromUsers(u)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.rfmFromUsers(
        Seq.empty[(Long, Long, Long, Long)]
          .toDF("user_id", "last_day", "freq", "cents"))
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { users = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(users.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
