package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** W9's streaming twin — the live cohort-retention triangle, and the
  * fold family's only member with NO ordering contract at all: the
  * state is the distinct (user, active-week) pair frame
  * ([[graft.ext.WindowFns.userWeeks]] — a SET-UNION monoid, bounded by
  * users × active weeks, the same bound the batch shuffle has), and the
  * serve pass recomputes each user's cohort (min week) from the folded
  * state through [[graft.ext.WindowFns.cohortFromWeeks]] — the
  * byte-identical batch kernel — so a LATE-arriving earlier week
  * retroactively re-cohorts its user exactly as a batch rerun would.
  * Set union is idempotent, so even the replay guard is belt-and-braces
  * (a re-folded batch is a content no-op); it rides [[onBatch]] anyway
  * for family uniformity. State is user-sized and lives as a
  * distributed frame (the TransitionFold discipline), deduplicated and
  * checkpointed per fold; restart = [[rebuildFrom]].
  */
class CohortStreamFold extends Serializable {

  private var pairs: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (ts, user_id, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.ext.WindowFns.userWeeks(batch).distinct()
    val merged = synchronized(pairs) match {
      case Some(p) => p.unionByName(partials).distinct()
      case None => partials
    }
    val ck = merged.localCheckpoint(true)
    synchronized { pairs = Some(ck) }
  }

  /** The foreachBatch body: fold unless this batchId already folded. */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The w9-shaped retention triangle over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = synchronized(pairs) match {
    case Some(p) => graft.ext.WindowFns.cohortFromWeeks(p)
    case None =>
      import spark.implicits._
      graft.ext.WindowFns.cohortFromWeeks(
        Seq.empty[(Long, Long)].toDF("user_id", "week"))
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { pairs = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(pairs.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
