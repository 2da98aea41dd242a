package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** W12's streaming twin — the concurrency curve maintained LIVE over a
  * stream of session spans (start_s, end_s). The batch sweep-line's
  * first half is already a sum-reduction of ±1 deltas
  * ([[graft.ext.WindowFns.spanDeltas]] — associative, commutative,
  * map-side combinable), i.e. a natural stateful fold: each micro-batch
  * reduces its own spans to (t, net, n_starts) distributed, and the
  * accumulated delta frame merges by integer addition. Serving runs the
  * SAME curve synthesis as batch w12
  * ([[graft.ext.WindowFns.curveFromDeltas]] — carry-ins, phantom-peak
  * guard, densified hour lattice), so stream and batch can never
  * disagree on overlap semantics; parity on planted intervals crossing
  * micro-batch boundaries is pinned in StreamingSpec.
  *
  * State is bounded by DISTINCT ACTIVE SECONDS in the stream's time
  * range (two deltas per span collapse onto the per-second grid), never
  * by span count — a million sessions starting the same second fold to
  * one row. The frame lives distributed, eager-checkpointed per fold
  * (the g1 lineage-truncation discipline).
  *
  * Addition double-counts on replay, so like [[QuantileStreamFold]]
  * (and unlike the set-semantics [[ActiveUsersStreamFold]]) the
  * foreachBatch body carries the batchId and drops re-deliveries.
  * Restart: the delta frame is outside the streaming checkpoint;
  * recovery is one distributed re-reduction of the landed spans
  * ([[rebuildFrom]]) — exact by associativity.
  */
class ConcurrencyStreamFold extends Serializable {

  private var deltas: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of spans: reduce distributed, merge by sum. */
  def foldBatch(spans: DataFrame): Unit = {
    val d = graft.ext.WindowFns.spanDeltas(spans)
    synchronized {
      val merged = deltas.fold(d)(cur => cur.unionByName(d)
          .groupBy(col("t"))
          .agg(sum(col("net")).as("net"),
            sum(col("n_starts")).as("n_starts")))
        .localCheckpoint(true)
      deltas = Some(merged)
    }
  }

  /** The foreachBatch body: fold unless this batchId already folded (a
    * retry re-delivers the same id; additive nets must not double). */
  def onBatch(spans: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(spans)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The per-hour concurrency curve over everything the stream has
    * carried — the w12 serve, through the SAME synthesis kernel. */
  def serve(): DataFrame = synchronized {
    val d = deltas.getOrElse(
      throw new IllegalStateException("no batches folded yet"))
    graft.ext.WindowFns.curveFromDeltas(d)
  }

  /** Rebuild from the landed span corpus (the restart recipe): one
    * distributed re-reduction, no driver-side row traffic. */
  def rebuildFrom(landedSpans: DataFrame): Unit = {
    synchronized { deltas = None; lastBatchId = -1L }
    foldBatch(landedSpans)
  }

  /** Wire a streaming span frame into the fold. */
  def start(spans: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(deltas.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    spans.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
