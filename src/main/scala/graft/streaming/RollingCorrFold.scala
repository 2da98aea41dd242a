package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** W14's streaming twin — the live rolling cross-correlation matrix.
  * The r12 batch refactor made the twin trivial by design: w14's corpus
  * reduction now quantizes values to the exact ×10⁴ integer basis
  * PER EVENT and reduces to (Σ v4, n) per (series, hour)
  * ([[graft.ext.WindowFns.hourlyMeanPartials]]) — and that pair is an
  * ADDITIVE MONOID, so micro-batch partials merge by plain integer
  * addition, fully ORDER-IMMUNE (unlike w13's hold-until-next twin, a
  * late or out-of-order event folds identically here — hourly sums
  * don't care when their rows arrive). The serve pass replays
  * [[graft.ext.WindowFns.rollingCorrFromHourly]] — the identical kernel
  * the batch query runs: hourly mean, pair alignment, the five
  * exact-long windowed moments, the one-float Pearson expression —
  * over the folded state, so stream ≡ batch parity is exact by
  * construction (the w15'/a26' shared-kernel discipline).
  *
  * Driver state is series × observed hours of two longs. Addition is a
  * monoid ⇒ [[onBatch]] carries the batchId and drops foreachBatch
  * retries; restart = [[rebuildFrom]] over the landed corpus, exact by
  * additivity.
  */
class RollingCorrStreamFold extends Serializable {

  // (series, hour) -> (Σ v4, n)
  private val state =
    scala.collection.mutable.Map.empty[(String, Long), (Long, Long)]
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (ts, event_type, value, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.ext.WindowFns.hourlyMeanPartials(batch).collect()
    synchronized {
      partials.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        val (s0, n0) = state.getOrElse(k, (0L, 0L))
        state(k) = (s0 + r.getLong(2), n0 + r.getLong(3))
      }
    }
  }

  /** The foreachBatch body: fold unless this batchId already folded. */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The w14-shaped report over everything folded so far, through the
    * byte-identical batch kernel (means, windows, Pearson, rounding). */
  def serve(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hourly = synchronized {
      state.toSeq.map { case ((t, h), (s, n)) => (t, h, s, n) }
    }.toDF("event_type", "hour_idx", "v4sum", "n")
    graft.ext.WindowFns.rollingCorrFromHourly(hourly)
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { state.clear(); lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(state.nonEmpty),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
