package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A29's streaming twin — the live Kaplan-Meier retention monitor. The
  * batch op's state shape is already streaming-ready: a29 reduces the
  * corpus to per-user (first_day, last_day) activity spans, and spans
  * are a MERGEABLE MONOID — min of firsts, max of lasts — so the fold
  * accumulates one users-bounded frame and every batch merge is the
  * same [[graft.etl.Analyze.userSpans]] reduction the batch query
  * runs. Serving replays [[graft.etl.Analyze.survivalFromSpans]] — the
  * IDENTICAL kernel — over the folded frame, so the censoring window,
  * the died-out guard, and the exp(Σ ln) fold are the batch op's own
  * and parity is exact by construction.
  *
  * State is a DataFrame, not a driver structure (the ActiveUsersFold
  * discipline): the spans frame lives distributed, eager
  * `localCheckpoint` per fold truncates the accumulated-union lineage
  * (the g1 fixpoint device), and its size is bounded by |users|
  * whatever the event volume. Min/max make the fold IDEMPOTENT — a
  * replayed micro-batch merges to a content no-op — so no batchId
  * replay guard is needed. Restart is [[rebuildFrom]] over the landed
  * corpus: one distributed reduction, exact because the landed events
  * carry every user's true first and last activity.
  *
  * One live-semantics note the spec pins: the anchor day (and with it
  * the censoring window) comes from the FOLDED CORPUS' own max day,
  * exactly as in batch — so as the stream advances, the anchor
  * advances, and a user who looked censored in an early serve
  * resolves to a churn event once the anchor moves past their last
  * activity + 7. A monitor that wants a frozen anchor should snapshot
  * the serve, not the fold. */
class SurvivalStreamFold extends Serializable {

  private var spans: Option[DataFrame] = None

  /** Fold one micro-batch of raw events (ts, user_id, ...): batch-local
    * distributed reduction, then monoid-merge into the state frame. */
  def foldBatch(batch: DataFrame): Unit = {
    val p = graft.etl.Analyze.userSpans(batch)
    synchronized {
      val merged = spans.fold(p) { prev =>
        prev.unionByName(p)
          .groupBy(col("user_id")).agg(
            min(col("first_day")).as("first_day"),
            max(col("last_day")).as("last_day"))
      }.localCheckpoint(true)
      spans = Some(merged)
    }
  }

  /** The a29 report over everything folded so far, through the SAME
    * kernel as the batch query. */
  def serve(): DataFrame = synchronized {
    val s = spans.getOrElse(
      throw new IllegalStateException("no batches folded yet"))
    graft.etl.Analyze.survivalFromSpans(s)
  }

  /** The accumulated per-user spans frame — exposed for specs. */
  def stateFrame: Option[DataFrame] = synchronized(spans)

  /** Rebuild from the landed corpus (the restart recipe): one
    * distributed reduction, no driver-side row traffic. */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { spans = None }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(spans.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        foldBatch(batch.toDF())
      }
      .start()
  }
}
