package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A31's streaming twin — live frequent-path mining. A 3-step path can
  * straddle a micro-batch boundary in two ways (two carried events +
  * one new, or one carried + two new), and both collapse to the same
  * device: carry each user's last TWO events and fold them in FRONT of
  * the next batch through the batch op's own two-lag window kernel
  * ([[graft.etl.Analyze.pathTriples]]). Every triple in the union
  * contains at least one NEW event (two carried rows alone cannot form
  * a triple), and every interior-or-boundary new triple forms exactly
  * once — no double counting, by construction rather than by dedup.
  *
  * State is the batch op's own mergeable intermediate: per-(path, user)
  * traversal counts ([[graft.etl.Analyze.pathUserCounts]]) — additive
  * across batches, and the ONE shape from which both report numbers
  * recompute exactly (n_paths = Σ n, n_users = row count per path).
  * Both state pieces are potentially user-sized, so both live as
  * DISTRIBUTED frames (the TransitionFold discipline), eagerly
  * checkpointed per fold: the (path, user) frame is bounded by users ×
  * distinct-paths-per-user (the same bound the batch shuffle has), the
  * carry by 2 rows per user. Serve replays
  * [[graft.etl.Analyze.pathReport]] over the folded frame. Ordering
  * contract: event_id monotone per user across batches (the a25'/w13'
  * statement). [[onBatch]] drops foreachBatch retries; restart =
  * [[rebuildFrom]] (no carry ⇒ interior triples are ALL triples).
  */
class PathStreamFold extends Serializable {

  private var pairs: Option[DataFrame] = None
  private var carry2: Option[DataFrame] = None
  private var lastBatchId = -1L

  /** Fold one micro-batch of raw events (event_id, user_id,
    * event_type, ...). */
  def foldBatch(batch: DataFrame): Unit = {
    val cols = Seq(col("event_id"), col("user_id"), col("event_type"))
    val b = batch.select(cols: _*)
    val all = synchronized(carry2) match {
      case Some(c) => c.select(cols: _*).unionByName(b)
      case None => b
    }
    val allCk = all.localCheckpoint(true) // triples + next carry read it
    val newPairs = graft.etl.Analyze.pathUserCounts(
      graft.etl.Analyze.pathTriples(allCk))
    val merged = synchronized(pairs) match {
      case Some(p) => p.unionByName(newPairs)
        .groupBy(col("step1"), col("step2"), col("step3"), col("user_id"))
        .agg(sum(col("n")).as("n"))
      case None => newPairs
    }
    val mergedCk = merged.localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val nextCarry = allCk
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .localCheckpoint(true)
    synchronized {
      pairs = Some(mergedCk)
      carry2 = Some(nextCarry)
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

  /** The a31-shaped report over everything folded so far. */
  def serve(spark: SparkSession): DataFrame = synchronized(pairs) match {
    case Some(p) => graft.etl.Analyze.pathReport(p)
    case None =>
      import spark.implicits._
      graft.etl.Analyze.pathReport(Seq.empty[(String, String, String, Long, Long)]
        .toDF("step1", "step2", "step3", "user_id", "n"))
  }

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { pairs = None; carry2 = None; lastBatchId = -1L }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(pairs.isDefined || carry2.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}
