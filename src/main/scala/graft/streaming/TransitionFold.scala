package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A25's streaming twin — the live first-order Markov transition
  * matrix. The batch kernel is one lag window per user
  * ([[graft.etl.Analyze.transitionPairs]]); the ONLY thing a stream
  * adds is the pair that straddles a micro-batch boundary (user's last
  * event of batch N, first event of batch N+1). So the fold is:
  * batch-internal pairs via the SHARED kernel, boundary pairs via a
  * users-sized carry join, counts merged additively.
  *
  * State splits by size class, each stored where it belongs:
  * - transition counts: ≤ |types|² cells — a driver map (the a18/t9
  *   bounded-collect discipline), merged additively per batch;
  * - per-user last event: USER-sized, so it lives as a DISTRIBUTED
  *   frame (the ActiveUsersFold discipline — a driver map here would
  *   cap the design at driver memory), eagerly checkpointed per fold
  *   to truncate the union lineage. The boundary join is user-keyed
  *   and AQE-handled; nothing event-sized ever accumulates.
  *
  * Additive counts ⇒ a foreachBatch RETRY must not double-fold:
  * [[onBatch]] carries the batchId and drops replays (the QuantileFold
  * exactly-once device). Ordering contract (the CUSUM/locf
  * discipline): transitions are order-DEFINED by event_id — ids must
  * be monotone per user across batches; out-of-order delivery belongs
  * to the ingest layer's sort/dedup (t1–t8). Restart = [[rebuildFrom]]
  * over the landed corpus: one batch-kernel pass, exact because with
  * no prior carry the batch-internal pairs ARE all pairs.
  */
class TransitionStreamFold extends Serializable {

  private val counts =
    scala.collection.mutable.Map.empty[(String, String), Long]
  private var lastByUser: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (event_id, user_id,
    * event_type, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val b = batch.select(col("event_id"), col("user_id"), col("event_type"))
      .localCheckpoint(true) // consumed three times below
    // batch-internal adjacency through the SHARED batch kernel
    val internal = graft.etl.Analyze.transitionPairs(b).collect()
    // per-user first/last of THIS batch ((event_id) order, one agg)
    val ends = b.groupBy(col("user_id")).agg(
      min_by(col("event_type"), col("event_id")).as("first_type"),
      max(col("event_id")).as("last_id"),
      max_by(col("event_type"), col("event_id")).as("last_type"))
      .localCheckpoint(true)
    synchronized {
      internal.foreach { r =>
        val k = (r.getString(0), r.getString(1))
        counts(k) = counts.getOrElse(k, 0L) + r.getLong(2)
      }
      // boundary pairs: carried last event → this batch's first event
      lastByUser.foreach { carry =>
        val boundary = carry
          .join(ends.select(col("user_id"), col("first_type")), "user_id")
          .groupBy(col("last_type").as("prev_type"),
            col("first_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .collect()
        boundary.foreach { r =>
          val k = (r.getString(0), r.getString(1))
          counts(k) = counts.getOrElse(k, 0L) + r.getLong(2)
        }
      }
      // roll the carry forward: users seen this batch take their new
      // last; unseen users keep the old one (max_by on event_id under
      // the monotone-id contract picks exactly that)
      val batchLast = ends.select(col("user_id"), col("last_id"),
        col("last_type"))
      val merged = lastByUser.fold(batchLast)(_.unionByName(batchLast)
          .groupBy(col("user_id")).agg(
            max(col("last_id")).as("last_id"),
            max_by(col("last_type"), col("last_id")).as("last_type")))
        .localCheckpoint(true)
      lastByUser = Some(merged)
    }
  }

  /** The foreachBatch body: fold unless this batchId already folded
    * (additive counts must not double on a retry). */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The a25-shaped report over everything folded so far, through the
    * SAME report kernel as the batch query. */
  def serve(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    val pairs = counts.toSeq.map { case ((p, n), c) => (p, n, c) }
      .toDF("prev_type", "next_type", "n")
    graft.etl.Analyze.transitionReport(pairs)
  }

  /** Rebuild from the landed corpus (the restart recipe): one pass of
    * the batch kernel — no carry, so internal pairs are ALL pairs. */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { counts.clear(); lastByUser = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(counts.nonEmpty || lastByUser.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
