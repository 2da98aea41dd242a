package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A36's streaming twin — the live multi-metric experiment panel with
  * BH correction. The state is the batch op's own per-(user, metric)
  * count reduction ([[graft.etl.Analyze.userMetricCounts]]): an
  * additive monoid, merged by groupBy-sum per micro-batch — exact at
  * any arrival order. serve replays
  * [[graft.etl.Analyze.bhPanelFromCounts]] — the identical arm split,
  * integer moments, A&S normal tail, and BH rank/step-up windows the
  * batch query runs — so stream ≡ batch parity is exact by
  * construction at every point. The panel-level consequence of
  * liveness: a batch that adds events to ONE metric can flip another
  * metric's sig_bh (the family threshold moves with every p) — the
  * cross-metric coupling a per-metric fold could not express.
  *
  * State is (users × metrics)-sized and lives as a distributed frame
  * (the AbTestStreamFold discipline), eagerly checkpointed per fold.
  * SUM is not idempotent — the [[onBatch]] batchId guard is
  * correctness. Restart = [[rebuildFrom]] over the landed corpus. */
class MetricPanelFold extends Serializable {

  private var counts: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (user_id, event_type). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.etl.Analyze.userMetricCounts(batch)
    val merged = synchronized(counts) match {
      case Some(u) => u.unionByName(partials)
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("c")).as("c"))
      case None => partials
    }
    val ck = merged.localCheckpoint(true)
    synchronized { counts = Some(ck) }
  }

  /** The foreachBatch body: fold unless this batchId already folded —
    * the guard is CORRECTNESS (sum double-counts on replay). */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The a36-shaped BH panel over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = synchronized(counts) match {
    case Some(u) => graft.etl.Analyze.bhPanelFromCounts(u)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.bhPanelFromCounts(Seq.empty[(Long, String, Long)]
        .toDF("user_id", "event_type", "c"))
  }

  /** The a37-shaped power/MDE card over the SAME folded state — one
    * per-(user, metric) count reduction serves both live readouts
    * (verdicts AND the power to believe them; the a33/a34
    * shared-state pattern). */
  def serveMde(spark: SparkSession): DataFrame = synchronized(counts) match {
    case Some(u) => graft.etl.Analyze.powerMdeFromCounts(u)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.powerMdeFromCounts(Seq.empty[(Long, String, Long)]
        .toDF("user_id", "event_type", "c"))
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { counts = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    FoldRestart.guard(checkpoint, synchronized(counts.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
