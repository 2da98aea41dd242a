package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A33's streaming twin — the live rank-sum experiment readout.
  * Per-user purchase revenue in exact integer CENTS is an additive
  * monoid, so the fold's state IS the batch op's own per-user
  * reduction ([[graft.etl.Analyze.userValueCents]]): per batch, one
  * distributed pass collapses the micro-batch to (user_id, cents)
  * partials, which merge into the state frame by groupBy-sum — exact
  * at any arrival order because the cents grid carries no float (the
  * a20/Welford discipline, here trivially: long addition commutes).
  * serve replays [[graft.etl.Analyze.mannWhitneyFromUsers]] — the
  * identical arm split, binning, and half-unit rank arithmetic the
  * batch query runs — over the folded frame, so stream ≡ batch parity
  * is exact by construction at every point in the stream.
  *
  * State is USER-sized and lives as a distributed frame (the
  * AbTestStreamFold discipline), eagerly checkpointed per fold.
  * Unlike a27's max, SUM is NOT idempotent — the [[onBatch]] batchId
  * guard is load-bearing here: a re-delivered batch would double a
  * user's revenue where it could not re-flip a converted bit.
  * Restart = [[rebuildFrom]] over the landed corpus. */
class MannWhitneyFold extends Serializable {

  private var users: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (user_id, event_type, value). */
  def foldBatch(batch: DataFrame): Unit = {
    val partials = graft.etl.Analyze.userValueCents(batch)
    val merged = synchronized(users) match {
      case Some(u) => u.unionByName(partials)
        .groupBy(col("user_id"))
        .agg(sum(col("cents")).as("cents"))
      case None => partials
    }
    val ck = merged.localCheckpoint(true)
    synchronized { users = Some(ck) }
  }

  /** The foreachBatch body: fold unless this batchId already folded —
    * the guard is CORRECTNESS here (sum double-counts on replay). */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val replay = synchronized(batchId <= lastBatchId)
    if (!replay) {
      foldBatch(batch)
      synchronized { lastBatchId = batchId }
    }
  }

  /** The a33-shaped rank-sum card over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = synchronized(users) match {
    case Some(u) => graft.etl.Analyze.mannWhitneyFromUsers(u)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.mannWhitneyFromUsers(
        Seq.empty[(Long, Long)].toDF("user_id", "cents"))
  }

  /** The a34-shaped KS card over the SAME folded state — one per-user
    * cents reduction serves both live experiment readouts (rank-sum
    * for location, ECDF gap for any distribution change). */
  def serveKs(spark: SparkSession): DataFrame = synchronized(users) match {
    case Some(u) => graft.etl.Analyze.ksTestFromUsers(u)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.ksTestFromUsers(
        Seq.empty[(Long, Long)].toDF("user_id", "cents"))
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { users = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    FoldRestart.guard(checkpoint, synchronized(users.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
