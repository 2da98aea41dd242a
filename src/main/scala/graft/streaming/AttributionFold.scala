package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A30's streaming twin — live last-touch attribution. The batch op's
  * one corpus window ("most recent preceding non-purchase touch per
  * user") crosses micro-batch boundaries in exactly one way: a purchase
  * early in batch N+1 whose crediting touch happened in batch N. So the
  * fold carries ONE row per user — their latest non-purchase touch so
  * far — and folds it in FRONT of each batch through the batch op's own
  * credit kernel ([[graft.etl.Analyze.attributionCredits]]): the
  * carried touch is a genuine earlier event under the in-order
  * contract, so the shared window pass assigns boundary credits by the
  * identical rule it assigns interior ones. Carried rows are
  * non-purchase by construction, so no purchase is ever double-credited.
  *
  * State splits by size class (the TransitionFold discipline): the
  * channel census (≤|types| cells of additive (n, cents)) is a driver
  * map; the per-user last-touch carry is USER-sized and lives as a
  * distributed frame, eagerly checkpointed per fold. Serve replays
  * [[graft.etl.Analyze.attributionReport]] over the folded census —
  * the share denominator recomputes from the merged counts, so stream
  * ≡ batch parity is exact. Ordering contract: per-user (ts, event_id)
  * must be monotone across batches (the TwapFold statement); within a
  * batch, order is free. [[onBatch]] drops foreachBatch retries;
  * restart = [[rebuildFrom]] (no carry ⇒ interior credits are ALL
  * credits).
  */
class AttributionStreamFold extends Serializable {

  private val census =
    scala.collection.mutable.Map.empty[String, (Long, Long)]
  private var lastTouch: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events
    * (event_id, ts, user_id, event_type, value). */
  def foldBatch(batch: DataFrame): Unit = {
    val cols = Seq(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val b = batch.select(cols: _*)
    val all = synchronized(lastTouch) match {
      case Some(carry) => carry.select(cols: _*).unionByName(b)
      case None => b
    }
    val allCk = all.localCheckpoint(true) // credits + carry both read it
    val credits = graft.etl.Analyze.attributionCensus(
      graft.etl.Analyze.attributionCredits(allCk)).collect()
    // roll the carry: latest non-purchase event per user of carry ∪ batch
    val touches = allCk.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("s"))
      .select(col("s.event_id").as("event_id"), col("s.ts").as("ts"),
        col("user_id"), col("s.event_type").as("event_type"),
        col("s.value").as("value"))
      .localCheckpoint(true)
    synchronized {
      credits.foreach { r =>
        val k = r.getString(0)
        val (n0, c0) = census.getOrElse(k, (0L, 0L))
        census(k) = (n0 + r.getLong(1), c0 + r.getLong(2))
      }
      lastTouch = Some(touches)
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

  /** The a30-shaped report over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = synchronized {
      census.toSeq.map { case (ch, (n, c)) => (ch, n, c) }
    }.toDF("channel", "n_purchases", "cents")
    graft.etl.Analyze.attributionReport(rows)
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { census.clear(); lastTouch = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(lastTouch.isDefined || census.nonEmpty),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
