package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A22's streaming twin — the fold tier's fifth leg, ACTIVE-USER
  * windows: per micro-batch the (day, user) pairs dedup DISTRIBUTED and
  * fold into one accumulated pair frame, served through the identical
  * window-explode kernel as batch a22
  * ([[graft.etl.Analyze.activeUsersFromPairs]]). The batch op's whole
  * design — dedup bounded by users×days, never events — already IS the
  * streaming state shape, which is why this twin needs no new serving
  * math at all.
  *
  * State is a DataFrame, not a driver structure: the pair frame lives
  * distributed (eager `localCheckpoint` per fold truncates the
  * accumulated-union lineage, the g1 fixpoint discipline), bounded by
  * |users| × |days| whatever the event volume — a 100 TB/day stream
  * folds to the same frame size as a trickle with the same population.
  * Set semantics make the fold IDEMPOTENT (union+distinct of a replayed
  * micro-batch is a content no-op), so unlike the additive
  * [[QuantileStreamFold]] no batchId replay guard is needed.
  *
  * Restart follows the sibling folds' contract: the pair frame is
  * outside the streaming checkpoint; recovery is one distributed
  * dedup over the landed (already-sunk) events ([[rebuildFrom]]) —
  * exact, because the state is a set and the landed corpus carries
  * every (day, user) at least once. Pinned stream ≡ batch (and
  * rebuild ≡ continuous) in StreamingSpec.
  */
class ActiveUsersStreamFold extends Serializable {

  private var pairs: Option[DataFrame] = None

  /** Fold one micro-batch of raw events (ts, user_id, ...): batch-local
    * distributed dedup, then set-merge into the accumulated frame. */
  def foldBatch(batch: DataFrame): Unit = {
    val p = batch
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    synchronized {
      val merged = pairs.fold(p)(_.unionByName(p)).distinct()
        .localCheckpoint(true)
      pairs = Some(merged)
    }
  }

  /** DAU/WAU/stickiness over everything the stream has carried — the
    * a22 serve, through the SAME kernel as the batch query. */
  def serve(): DataFrame = synchronized {
    val du = pairs.getOrElse(
      throw new IllegalStateException("no batches folded yet"))
    graft.etl.Analyze.activeUsersFromPairs(du)
  }

  /** The accumulated (d, user_id) state frame — exposed for specs. */
  def stateFrame: Option[DataFrame] = synchronized(pairs)

  /** Rebuild from the landed corpus (the restart recipe): one
    * distributed dedup, no driver-side row traffic. */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { pairs = None }
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
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        foldBatch(batch.toDF())
      }
      .start()
  }
}
