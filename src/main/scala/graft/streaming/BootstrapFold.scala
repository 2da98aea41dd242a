package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** A43's streaming twin — the live bootstrap-CI. State is the batch
  * op's own reductions ([[graft.etl.Analyze.bootstrapReplicaSums]] +
  * [[graft.etl.Analyze.bootstrapRawSums]]): |types|·B weighted-cent
  * counters plus 2 raw counters per type, all additive monoids —
  * bounded BY CONSTRUCTION at any corpus size (the t24/a41
  * discipline), and valid incrementally BECAUSE the replica weights
  * are a pure function of (event_id, replica) — a Poisson draw keyed
  * by the row, not by arrival order, so folding a new batch is
  * exactly extending every replica's resample with the new rows'
  * draws. serve replays [[graft.etl.Analyze.bootstrapCiFromSums]] —
  * the identical replica-mean + percentile chain the batch query runs
  * — so stream ≡ batch parity is exact by construction at every point
  * in the stream.
  *
  * SUM is not idempotent, so the [[onBatch]] batchId guard is
  * correctness: a re-delivered batch would double its rows' weights
  * in every replica and silently narrow the interval. Restart =
  * [[rebuildFrom]] over the landed corpus (one batch-kernel pass). */
class BootstrapFold extends Serializable {

  private var reps: Map[(String, Int), (Long, Long)] = Map.empty
  private var raw: Map[String, (Long, Long)] = Map.empty
  private var lastBatchId = -1L
  private var folded = false

  /** Fold one micro-batch of raw events (event_type, event_id, value). */
  def foldBatch(batch: DataFrame): Unit = {
    val pr = graft.etl.Analyze.bootstrapReplicaSums(batch)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))) // |types|·B rows
    val pw = graft.etl.Analyze.bootstrapRawSums(batch)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    synchronized {
      reps = pr.foldLeft(reps) { case (m, (k, (wc, wn))) =>
        val (a, b) = m.getOrElse(k, (0L, 0L)); m.updated(k, (a + wc, b + wn))
      }
      raw = pw.foldLeft(raw) { case (m, (k, (n, sc))) =>
        val (a, b) = m.getOrElse(k, (0L, 0L)); m.updated(k, (a + n, b + sc))
      }
      folded = true
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

  /** The a43-shaped CI card over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (r, w) = synchronized((reps, raw))
    graft.etl.Analyze.bootstrapCiFromSums(
      r.toSeq.map { case ((t, b), (wc, wn)) => (t, b, wc, wn) }
        .toDF("event_type", "b", "wc", "wn"),
      w.toSeq.map { case (t, (n, sc)) => (t, n, sc) }
        .toDF("event_type", "n_events", "sc"))
  }

  /** Rebuild from the landed corpus (the restart recipe). `landed`
    * must hold MARKER-COMMITTED batches only ([[FoldRestart.guard]]'s
    * contract, advisor r16): the reset batch-id guard means the
    * checkpoint's re-delivered final batch folds AGAIN after this —
    * correct iff those rows are not already in `landed`. The replica
    * sums are exact-integer SUMs, so a violation would not error; it
    * would silently narrow the served CI. */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized {
      reps = Map.empty; raw = Map.empty; lastBatchId = -1L; folded = false
    }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    FoldRestart.guard(checkpoint, synchronized(folded),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
