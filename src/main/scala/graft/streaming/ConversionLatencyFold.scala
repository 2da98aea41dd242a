package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** W17's streaming twin — the live conversion-latency card, closing the
  * funnel family (w8/w8'/w17). Unlike the in-order `funnelStream`
  * state machine, this fold is EXACT UNDER ARBITRARY ARRIVAL ORDER
  * (the w9' set-union discipline): state is the compacted per-user
  * funnel-relevant event set, and serving replays the batch op's OWN
  * [[graft.ext.WindowFns.conversionLatency]] kernel over it — parity
  * by construction, late data absorbed retroactively exactly as a
  * batch rerun would absorb it.
  *
  * The state bound comes from a sufficiency argument on the funnel
  * semantics (v = min view; c = min click ≥ v; p = min purchase ≥ c,
  * all per user). As more data arrives, v, c and p can only DECREASE,
  * so the only rows that can ever influence a future answer are:
  *   - the current minimum view (future views only lower v further);
  *   - clicks ≤ c (a click > c can never become the minimum eligible
  *     click: c itself stays eligible under any lower v and is
  *     smaller) — ALL clicks while c is still null, since any of them
  *     may become eligible once a low-enough view lands;
  *   - purchases ≤ p, by the same argument against c (all of them
  *     while p is null).
  * Everything else is provably dead and drops at each fold, so state
  * is per-user (1 view + eligible-frontier clicks/purchases), not the
  * event history. Set-union state makes the fold IDEMPOTENT — a
  * replayed micro-batch distincts away to a content no-op — so no
  * batchId replay guard is needed; restart is [[rebuildFrom]] over the
  * landed corpus (one distributed pass). Eager `localCheckpoint` per
  * fold truncates the accumulated-union lineage (the SurvivalFold
  * discipline). */
class ConversionLatencyFold extends Serializable {

  /** Compacted (user_id, event_type, ts) state — a DataFrame, never a
    * driver structure. */
  private var ev: Option[DataFrame] = None

  def foldBatch(batch: DataFrame): Unit = {
    val rel = batch
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
    synchronized {
      val merged = ev.fold(rel.distinct())(prev =>
        prev.unionByName(rel).distinct())
      ev = Some(compacted(merged).localCheckpoint(true))
    }
  }

  /** Drop rows that can never influence any future serve (the
    * sufficiency rule above), using the batch kernel's OWN stage frame
    * as the frontier — the compaction can't drift from the semantics
    * it protects. */
  private def compacted(events: DataFrame): DataFrame =
    events
      .join(graft.ext.WindowFns.funnelStages(events), Seq("user_id"), "left")
      .filter(
        (col("event_type") === "view" && col("ts") === col("v")) ||
          (col("event_type") === "click" &&
            (col("c").isNull || col("ts") <= col("c"))) ||
          (col("event_type") === "purchase" &&
            (col("p").isNull || col("ts") <= col("p"))))
      .select(col("user_id"), col("event_type"), col("ts"))

  /** The w17 card over everything folded so far, through the batch
    * query's identical kernel (funnelStages → latency card). */
  def serve(): DataFrame = synchronized {
    val e = ev.getOrElse(
      throw new IllegalStateException("no batches folded yet"))
    graft.ext.WindowFns.conversionLatency(e)
  }

  /** The compacted state frame — exposed for specs (size bounds). */
  def stateFrame: Option[DataFrame] = synchronized(ev)

  /** Rebuild from the landed corpus (the restart recipe). */
  def rebuildFrom(landed: DataFrame): Unit = {
    synchronized { ev = None }
    foldBatch(landed)
  }

  /** Wire a streaming events frame into the fold. */
  def start(events: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    // refuse to resume a used checkpoint with an empty fold
    // (FoldRestart doc); `landed` is the rebuild corpus
    FoldRestart.guard(checkpoint, synchronized(ev.isDefined),
      landed.map(l => () => rebuildFrom(l)))
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        foldBatch(batch.toDF())
      }
      .start()
  }
}
