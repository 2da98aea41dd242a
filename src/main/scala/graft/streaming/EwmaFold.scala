package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** W15's streaming twin — the live EWMA volume baseline. The batch
  * op's whole design is already the streaming state shape: w15 reduces
  * the corpus to the (series, hour) exact-cents frame and runs the
  * power-of-two weight arithmetic ON that frame, and hourly cents are
  * ADDITIVE — a per-hour long that merges across micro-batches by plain
  * addition. So the fold's state IS the batch op's intermediate, and
  * the serve pass replays [[graft.ext.WindowFns.ewmaFromHourly]] — the
  * IDENTICAL kernel the batch query runs — over the folded state, which
  * makes stream ≡ batch parity exact by construction (the
  * a22'/a26'/seasonalReport shared-kernel discipline), not approximate.
  *
  * Per micro-batch: ONE distributed pass
  * ([[graft.ext.WindowFns.hourlyCents]], the same map-side-combined
  * reduction) collapsed to per-(series, hour) partials; driver state is
  * bounded by series × ALL OBSERVED hours — the map keeps every
  * (series, hour) key ever folded, the same cardinality the batch op's
  * own hourly profile frame has over the full corpus. That is exactly
  * what full-corpus batch parity requires; a long-lived deployment that
  * only serves the recent tail would add a retention trim (drop hours
  * older than the serve horizon), intentionally diverging from
  * full-history parity. Addition is a monoid ⇒ [[onBatch]]
  * carries the batchId and drops foreachBatch retries (the QuantileFold
  * exactly-once device); restart = [[rebuildFrom]] over the landed
  * corpus, exact by additivity.
  */
class EwmaStreamFold extends Serializable {

  private val state = scala.collection.mutable.Map.empty[(String, Long), Long]
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (ts, event_type, value, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.ext.WindowFns.hourlyCents(batch).collect()
    synchronized {
      partials.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        state(k) = state.getOrElse(k, 0L) + r.getLong(2)
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

  /** The w15-shaped report over everything folded so far: the folded
    * hourly state re-enters the BATCH kernel, so every weight, round,
    * and gap-renormalization rule is the batch op's own. */
  def serve(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hourly = synchronized {
      state.toSeq.map { case ((t, h), c) => (t, h, c) }
    }.toDF("event_type", "hour_idx", "cents")
    graft.ext.WindowFns.ewmaFromHourly(hourly)
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
