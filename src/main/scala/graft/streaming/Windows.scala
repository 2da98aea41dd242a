package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One click/purchase event for the streaming as-of enrichment. */
case class ClickPurchase(user_id: Long, ts: Timestamp, event_type: String)

/** Streaming as-of output: a purchase with the most recent click
  * at-or-before it by the same user (None when no click precedes). */
case class AsOfRow(user_id: Long, p_ts: Timestamp,
                   last_click: Option[Timestamp])

/** Per-user as-of state: the latest click event-time seen so far. */
case class AsOfState(lastClickMs: Long)

/** Per-user funnel state: first-reach event-times per stage (None until
  * reached). Three optional longs per live user — bounded state. */
case class FunnelState(viewMs: Option[Long], clickMs: Option[Long],
                       purchaseMs: Option[Long])

/** One funnel stage transition: emitted the FIRST time a user reaches a
  * stage (stage ∈ view | click | purchase). */
case class StageReached(user_id: Long, stage: String, ts: Timestamp)

/** Event-time windowing and stateful streaming semantics (SURVEY §2.9
  * T6-T9). All transforms are `DataFrame => DataFrame` on a streaming
  * frame with an event-time column `ts` — shared by MemoryStream tests and
  * any production source. State is keyed by (window, group) so it
  * partitions across executors; watermarks bound state size, which is what
  * makes these safe on an unbounded 100 TB/day stream.
  */
object Windows {

  /** W19'/ST13 — the watermark CONSUMER (r14 verdict ask #4): hourly
    * per-type counts whose `withWatermark` horizon is not folklore but
    * the number [[graft.ext.WindowFns.watermarkHorizon]] derived from
    * the corpus's own lateness audit (w18 measures, w19 chooses, this
    * op EXECUTES the choice). Pass
    * [[graft.ext.WindowFns.chosenHorizonSeconds]] of the landed
    * arrival log; StreamingSpec pins on planted lateness that the
    * horizon admits/drops exactly the shares the w19 card predicts —
    * the full read-the-card-set-the-horizon loop, executable. */
  def latenessBoundedCounts(events: DataFrame, horizonS: Long): DataFrame =
    events
      .withWatermark("ts", s"$horizonS seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))

  /** T6+T7 — 1-hour tumbling event-time aggregate with a 10-minute
    * watermark (late rows beyond the watermark are dropped; state for
    * closed windows is evicted). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** W10' — LIVE OHLC bars: the batch resample's streaming twin, same
    * ordered-aggregate device (`min_by`/`max_by` over a (unix_micros,
    * event_id) struct — declarative aggregates whose partial buffers
    * merge, which is exactly what streaming state update needs; a
    * window-function formulation could not run incrementally at all).
    * Event-time tumbling windows keyed like the batch kernel's
    * hour_idx; O(1) state per open bar. Emitted through the same
    * column shape as [[graft.ext.WindowFns.ohlcBars]] so StreamingSpec
    * pins stream ≡ batch on the same rows (the w6'/w8'/as-of parity
    * discipline). */
  def ohlcStream(events: DataFrame): DataFrame = {
    val orderKey = struct(expr("unix_micros(ts)").as("us"), col("event_id"))
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), orderKey).as("open"),
        round(max(col("value")), 2).as("high"),
        round(min(col("value")), 2).as("low"),
        max_by(col("value"), orderKey).as("close"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(
        col("event_type"),
        floor(unix_timestamp(col("window.start")) / 3600L).cast("long")
          .as("hour_idx"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("value_sum"))
  }

  /** W11' — the LOCF resample's LIVE leg: the per-(type, hour)
    * last-observation frame maintained incrementally — `max_by` over
    * the same (unix_micros, event_id) struct as the batch kernel, so a
    * late-arriving earlier observation can never steal "last" from a
    * truly-later one (the pick is ORDER-defined, not arrival-defined;
    * that is the whole point of the struct). This is exactly the
    * `hourly` frame [[graft.ext.WindowFns.locfFill]] builds its grid
    * over — the non-gap rows of the batch output — pinned stream ≡
    * batch in StreamingSpec. The grid synthesis + carry-forward stays a
    * batch presentation over the accumulated hourly table: gaps are
    * DEFINED by hours that never got state, which a per-key stream
    * operator cannot emit incrementally (nothing arrives to trigger
    * them); serving fills from the live hourly frame on read. O(1)
    * state per open (type, hour) cell, watermark-evicted. */
  def locfStream(events: DataFrame): DataFrame = {
    val orderKey = struct(expr("unix_micros(ts)").as("us"), col("event_id"))
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(max_by(col("value"), orderKey).as("obs"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        floor(unix_timestamp(col("window.start")) / 3600L).cast("long")
          .as("hour_idx"),
        round(col("obs"), 2).as("obs_value"),
        col("n_events"))
  }

  /** T9a — 10-minute sliding window, 5-minute slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** T9b — session windows: activity separated by >5 minutes of silence
    * starts a new session. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("session_value"))

  /** T9c — stateful streaming dedup: drops reoccurrences of the same key
    * while the first occurrence is within the watermark (bounded state —
    * plain dropDuplicates on a stream would grow state forever). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** T11 — watermarked stream-stream interval join: correlate two live
    * streams (e.g. actions with the alert that preceded them) where the
    * right event must land within [0, maxDelay] AFTER the left. Both
    * sides carry watermarks and the join condition bounds the time
    * range, so each side's buffered state evicts once the watermark
    * passes the interval — without BOTH constraints Spark must buffer a
    * stream forever, which no cluster survives. Inner join: unmatched
    * rows age out of state and emit nothing. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   maxDelay: String = "10 minutes"): DataFrame = {
    // Prefix every column per side (the watermark metadata survives the
    // rename) so the join condition is unambiguous.
    val l = left.withWatermark("ts", "10 minutes")
      .select(left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.withWatermark("ts", "10 minutes")
      .select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      "inner")
  }

  /** T11b — the LEFT OUTER leg of the watermarked interval join: same
    * key + [0, maxDelay] time bound, but a left row that finds no match
    * EMITS with nulls once the watermark proves no match can still
    * arrive — the "alert with no action taken" row, which the inner
    * join silently ages out. The null-padded emission is deferred BY
    * DESIGN until the watermark passes the interval's end (emitting
    * earlier could contradict a late-but-valid match); both state
    * stores stay bounded exactly as in the inner case. Same watermark +
    * time-bound requirements — Spark rejects an unbounded outer
    * stream-stream join outright rather than buffering forever. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
                        maxDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", "10 minutes")
      .select(left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.withWatermark("ts", "10 minutes")
      .select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      "left_outer")
  }

  /** The LIVE formulation of the j6 as-of enrichment
    * ([[graft.ext.Joins.asOfEnrich]]'s batch kernel): each purchase is
    * emitted with the latest click at-or-before it by the same user.
    * State is ONE event-time per user (`flatMapGroupsWithState`, keyed
    * and partitioned by user across executors) — bounded by the live
    * user population and evicted by event-time timeout when a user goes
    * silent past the TTL, never by stream length. Within a micro-batch
    * rows replay in (ts, click-before-purchase) order, the batch
    * kernel's exact tie discipline (the as-of is inclusive); ACROSS
    * micro-batches correctness relies on per-key event-time arrival
    * order (a Kafka per-key-ordered topic's contract) — a click arriving
    * after a later purchase was already emitted cannot retro-enrich it,
    * the same trade every streaming as-of makes. StreamingSpec pins
    * stream ≡ batch kernel on identical rows, split across batches. */
  def asOfEnrichStream(events: Dataset[ClickPurchase],
                       stateTtlMs: Long = 30L * 60 * 1000): Dataset[AsOfRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[ClickPurchase], state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r =>
              (r.ts.getTime, if (r.event_type == "click") 0 else 1))
            var lastClick: Option[Long] = state.getOption.map(_.lastClickMs)
            val out = ordered.flatMap {
              case r if r.event_type == "click" =>
                // max, not overwrite: a late click inside the watermark
                // (NOT dropped) must never regress state already ahead
                // of it — the as-of answer is the LATEST qualifying
                // click, whatever order they arrived in
                lastClick = Some(lastClick.fold(r.ts.getTime)(_ max r.ts.getTime))
                None
              case r if r.event_type == "purchase" =>
                // a late purchase must not be enriched by a click that
                // is AFTER it (an output the batch kernel can never
                // produce, and gap math downstream would go negative)
                Some(AsOfRow(user, r.ts,
                  lastClick.filter(_ <= r.ts.getTime).map(new Timestamp(_))))
              case _ => None
            }
            lastClick.foreach(ms => state.update(AsOfState(ms)))
            if (ordered.nonEmpty)
              state.setTimeoutTimestamp(ordered.last.ts.getTime + stateTtlMs)
            out.iterator
          }
      }
  }

  /** The LIVE conversion funnel (w8's batch kernel as a per-user state
    * machine): emits a [[StageReached]] row the FIRST time a user
    * reaches each ordered stage — view, then click at-or-after the
    * first view, then purchase at-or-after that click. A stream
    * consumer (dashboard counter, alerting rule) folds these
    * transitions incrementally instead of re-scanning history. State is
    * three optional event-times per live user, keyed/partitioned by
    * user and evicted by event-time timeout; within a micro-batch rows
    * replay in (ts, stage-rank) order — the batch kernel's exact tie
    * discipline — and across batches correctness relies on per-key
    * arrival order, the same contract as [[asOfEnrichStream]].
    * StreamingSpec pins the transition set ≡ the batch
    * `funnelStages` frame on identical rows split across batches. */
  def funnelStream(events: Dataset[ClickPurchase],
                   stateTtlMs: Long = 30L * 60 * 1000): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    def rank(t: String) = t match {
      case "view" => 0; case "click" => 1; case _ => 2
    }
    events
      .filter((r: ClickPurchase) =>
        r.event_type == "view" || r.event_type == "click" ||
          r.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[ClickPurchase], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r => (r.ts.getTime, rank(r.event_type)))
            var s = state.getOption.getOrElse(FunnelState(None, None, None))
            val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
            ordered.foreach { r =>
              val ms = r.ts.getTime
              r.event_type match {
                case "view" if s.viewMs.isEmpty =>
                  s = s.copy(viewMs = Some(ms))
                  out += StageReached(user, "view", r.ts)
                case "click" if s.clickMs.isEmpty &&
                  s.viewMs.exists(_ <= ms) =>
                  s = s.copy(clickMs = Some(ms))
                  out += StageReached(user, "click", r.ts)
                case "purchase" if s.purchaseMs.isEmpty &&
                  s.clickMs.exists(_ <= ms) =>
                  s = s.copy(purchaseMs = Some(ms))
                  out += StageReached(user, "purchase", r.ts)
                case _ => ()
              }
            }
            state.update(s)
            if (ordered.nonEmpty)
              state.setTimeoutTimestamp(ordered.last.ts.getTime + stateTtlMs)
            out.iterator
          }
      }
  }

  /** T6+T8 — the reference's persisted location summary
    * (spark_processor.py:210-217) as a LIVE event-time aggregate over the
    * observation stream: per (hourly window, location) count + rounded
    * means. Rows finalize as the watermark closes windows; a memory-sink
    * query over this stream IS the dashboard's snapshot table, replacing
    * the reference's write-whole-summary-then-TTL-cache loop
    * (dashboard.py:37) with incremental state. */
  def liveLocationSummary(observations: DataFrame): DataFrame =
    observations
      .withColumn("ts",
        to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("location"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("temp_c")), 2).as("avg_temp"),
        round(avg(col("pm2_5")), 2).as("avg_pm25"))
      .select(col("window.start").as("window_start"), col("location"),
        col("n"), col("avg_temp"), col("avg_pm25"))
}
