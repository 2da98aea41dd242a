package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sensor reading keyed by location (the reference's per-city AQI
  * observation, reduced to the fields alerting needs). */
case class Reading(location: String, ts: Timestamp, value: Double)

/** Alert emitted once per upward threshold crossing. */
case class ThresholdAlert(location: String, ts: Timestamp,
                          value: Double, threshold: Double)

/** Per-key alerting state: are we currently above the threshold? */
case class AlertState(above: Boolean)

/** T9 — stateful threshold alerting via `flatMapGroupsWithState` (the
  * reference names threshold alerts as future work, README.md:49; SURVEY
  * §2.9 lists it as the arbitrary-state tier).
  *
  * Edge-triggered, not level-triggered: an alert fires only when a key
  * RISES through the threshold — a sensor pinned above it alerts once,
  * not once per reading. State is one boolean per key, partitioned by the
  * group key across executors, and evicted by event-time timeout when a
  * key goes silent past the TTL — on an unbounded stream with a churning
  * key population (sensors come and go), unbounded keyed state is the
  * thing that kills the job; the timeout bounds it.
  */
object Alerts {

  /** Alert stream for readings rising through `threshold`. Requires the
    * input to be a streaming Dataset; the 10-minute watermark both drops
    * late data and drives state eviction (`stateTtlMs` past the last
    * event seen for the key). */
  def thresholdAlerts(readings: Dataset[Reading], threshold: Double,
                      stateTtlMs: Long = 30L * 60 * 1000): Dataset[ThresholdAlert] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.location)
      .flatMapGroupsWithState[AlertState, ThresholdAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (loc: String, rows: Iterator[Reading], state: GroupState[AlertState]) =>
          if (state.hasTimedOut) {
            // Key went silent past the TTL — evict. If it comes back
            // above the threshold it re-alerts, which is the operational
            // intent: a fresh episode, not a continuation.
            state.remove()
            Iterator.empty
          } else {
            // Within a micro-batch rows are unordered — replay in event
            // time so crossing detection is deterministic.
            val ordered = rows.toSeq.sortBy(_.ts.getTime)
            var above = state.getOption.exists(_.above)
            val alerts = ordered.flatMap { r =>
              val crossed = !above && r.value > threshold
              above = r.value > threshold
              if (crossed) Some(ThresholdAlert(loc, r.ts, r.value, threshold))
              else None
            }
            state.update(AlertState(above))
            if (ordered.nonEmpty)
              state.setTimeoutTimestamp(ordered.last.ts.getTime + stateTtlMs)
            alerts.iterator
          }
      }
  }
}
