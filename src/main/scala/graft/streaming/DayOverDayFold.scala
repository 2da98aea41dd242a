package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** W16's streaming twin — the live day-over-day hourly comparison.
  * Identical state shape to [[EwmaStreamFold]] (w16 and w15 share the
  * batch hourly-cents kernel, so their folds share the state design):
  * per-(series, hour) exact cents merge across micro-batches by plain
  * addition, and the serve pass replays
  * [[graft.ext.WindowFns.dayOverDayFromHourly]] — the byte-identical
  * batch kernel (the hour−24 equi-join, NULL-on-no-prior/zero-prior
  * rules) — over the folded state. Stream ≡ batch parity is exact by
  * construction; order-immune (hourly sums don't care when rows
  * arrive). Driver state is series × all observed hours; [[onBatch]]
  * carries the batchId and drops foreachBatch retries; restart =
  * [[rebuildFrom]], exact by additivity.
  */
class DayOverDayStreamFold extends Serializable {

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

  /** The w16-shaped report over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hourly = synchronized {
      state.toSeq.map { case ((t, h), c) => (t, h, c) }
    }.toDF("event_type", "hour_idx", "cents")
    graft.ext.WindowFns.dayOverDayFromHourly(hourly)
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
