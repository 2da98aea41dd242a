package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.WindowFns

/** W10 OHLC bars: open/close must be order-DEFINED (earliest/latest by
  * (micros, event_id)), not partition-order luck, and the plan must be a
  * single partial-aggregated hash shuffle — no window, no corpus sort. */
class OhlcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    // one bar: hour 2024-01-01 00:xx, type "m"
    (0L, ts("2024-01-01 00:05:00"), "m", 10.0),
    (1L, ts("2024-01-01 00:01:00"), "m", 7.0),   // earliest → open
    (2L, ts("2024-01-01 00:30:00"), "m", 99.5),  // high
    (3L, ts("2024-01-01 00:59:00"), "m", 3.25),  // latest → close, low
    // same-microsecond tie: event_id breaks it deterministically
    (4L, ts("2024-01-01 01:00:00"), "m", 5.0),   // open of hour 1 (id 4 < 5)
    (5L, ts("2024-01-01 01:00:00"), "m", 6.0),   // close of hour 1
    // other type, own bar
    (6L, ts("2024-01-01 00:10:00"), "x", 1.0)
  ).toDF("event_id", "ts", "event_type", "value")

  test("hand-computed bars: open/high/low/close/count/sum per (type, hour)") {
    val out = WindowFns.ohlcBars(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))))
      .toMap
    val h0 = 473352L // floor(epoch('2024-01-01 00:00')/3600), UTC session
    assert(out(("m", h0)) == ((7.0, 99.5, 3.25, 3.25, 4L, 119.75)))
    assert(out(("m", h0 + 1)) == ((5.0, 6.0, 5.0, 6.0, 2L, 11.0)))
    assert(out(("x", h0)) == ((1.0, 1.0, 1.0, 1.0, 1L, 1.0)))
    assert(out.size == 3)
  }

  test("open/close are (micros, event_id)-defined even when input order is reversed") {
    val reversed = events.orderBy(col("event_id").desc).repartition(4)
    val a = WindowFns.ohlcBars(events).collect().map(_.toSeq).toSet
    val b = WindowFns.ohlcBars(reversed).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("plan: one hash aggregate pass, no Window, no corpus Sort before the agg") {
    val plan = WindowFns.ohlcBars(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "OHLC must not plan a window")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    // one hash-partition shuffle for the agg + the presentation range sort
    assert(shuffles <= 2, s"too many exchanges:\n$plan")
    assert(plan.contains("partial_min_by") || plan.contains("partial_"),
      "aggregation must be map-side partial")
  }

  // ---- W11 LOCF forward-fill (shares this suite: same planted-events
  // discipline, same hour-bucket + (micros, event_id) pick semantics) ----

  private val gappy = Seq(
    // type "m": observed hours h0 and h0+3; h0+1, h0+2 are gaps
    (0L, ts("2024-01-01 00:10:00"), "m", 4.0),
    (1L, ts("2024-01-01 00:50:00"), "m", 7.0),   // last in h0 → carried
    (2L, ts("2024-01-01 03:30:00"), "m", 9.0),
    // type "x": first observation at h0+2 → h0, h0+1 LEADING nulls
    (3L, ts("2024-01-01 02:15:00"), "x", 1.5)
  ).toDF("event_id", "ts", "event_type", "value")

  test("LOCF: gaps carry the last observation; leading gaps stay null; fills never cross types") {
    val h0 = 473352L
    val out = WindowFns.locfFill(gappy).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4), r.getLong(5))))
      .toMap
    // complete 4-hour lattice × 2 types
    assert(out.size == 8)
    assert(out(("m", h0))     == ((Some(7.0), Some(7.0), false, 2L)))
    assert(out(("m", h0 + 1)) == ((None, Some(7.0), true, 0L)))      // filled
    assert(out(("m", h0 + 2)) == ((None, Some(7.0), true, 0L)))      // filled
    assert(out(("m", h0 + 3)) == ((Some(9.0), Some(9.0), false, 1L)))
    // x's leading hours: nothing observed yet, fill must stay null —
    // and must NOT leak m's 7.0 across the type boundary
    assert(out(("x", h0))     == ((None, None, true, 0L)))
    assert(out(("x", h0 + 1)) == ((None, None, true, 0L)))
    assert(out(("x", h0 + 2)) == ((Some(1.5), Some(1.5), false, 1L)))
    assert(out(("x", h0 + 3)) == ((None, Some(1.5), true, 0L)))
  }

  test("LOCF within-hour pick is the LAST observation by (micros, event_id)") {
    val tied = Seq(
      (10L, ts("2024-01-01 00:00:00"), "m", 1.0),
      (12L, ts("2024-01-01 00:30:00"), "m", 3.0),  // same micros as 11...
      (11L, ts("2024-01-01 00:30:00"), "m", 2.0)   // ...id 12 wins
    ).toDF("event_id", "ts", "event_type", "value")
    val row = WindowFns.locfFill(tied).collect().head
    assert(row.getDouble(2) == 3.0 && row.getDouble(3) == 3.0)
  }

  // ---- W12 sweep-line concurrency (planted intervals, kernel-level) ----

  test("concurrency curve: overlaps, per-second tie collapsing, hour bucketing (W12)") {
    // A[0,10] B[5,20] overlap → peak 2; C[100,110] alone; D[3590,7300]
    // spans hours 0→2 (hour 1 has no delta points, but D runs through
    // it — the densified curve reports the carried level 1, not an
    // absent row); E[7200,7210] overlaps D's tail → hour-2 peak 2
    val spans = Seq((0L, 10L), (5L, 20L), (100L, 110L), (3590L, 7300L),
      (7200L, 7210L)).toDF("start_s", "end_s")
    val out = WindowFns.concurrencyCurve(spans).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((4L, 2L)), 1L -> ((0L, 1L)), 2L -> ((1L, 2L))))
  }

  test("concurrency peak honors the carry-in when an hour only ever descends (W12)") {
    // both sessions start in hour 0 and END in hour 2: hour 2's deltas
    // are all -1, so its peak is the CARRY-IN (2), never a point level;
    // hour 1 is delta-free mid-session — densified at the carried 2
    val spans = Seq((0L, 7400L), (10L, 7500L)).toDF("start_s", "end_s")
    val out = WindowFns.concurrencyCurve(spans).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toList == List((0L, 2L, 2L), (1L, 0L, 2L), (2L, 0L, 2L)))
  }

  test("concurrency: a session ending at the hour boundary gives the next hour NO phantom peak (W12)") {
    // [0, 3599]'s -1 delta lands exactly at t=3600 (hour 1's first
    // second): hour 1 never holds the carry-in level, so its peak is 0 —
    // greatest(carry_in, points) unguarded would report 1
    val spans = Seq((0L, 3599L)).toDF("start_s", "end_s")
    val out = WindowFns.concurrencyCurve(spans).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((1L, 1L)), 1L -> ((0L, 0L))), s"got $out")
  }

  test("concurrency curve is deterministic under repartition (W12)") {
    val spans = Seq((0L, 10L), (5L, 20L), (100L, 110L), (3590L, 7300L),
      (7200L, 7210L)).toDF("start_s", "end_s")
    val a = WindowFns.concurrencyCurve(spans).collect().map(_.toSeq).toSeq
    val b = WindowFns.concurrencyCurve(spans.repartition(7)).collect()
      .map(_.toSeq).toSeq
    assert(a == b)
  }

  test("TWAP: hold-until-next pro-rata hours, covered-but-eventless hour, tail drops (W13)") {
    // type m: reading 10 at 00:30 holds until 02:15 — 1800 s of hour 0,
    // ALL of hour 1 (an hour with zero events must still report: the
    // w11 lattice lesson), 900 s of hour 2; reading 20 at 02:15 holds
    // 1800 s; reading 40 at 02:45 is the tail and holds NOTHING.
    // type x: a single reading has no horizon → no rows at all.
    // type y: same-timestamp pair → zero-length segment drops → no rows.
    val ev = Seq(
      (0L, ts("2024-01-01 00:30:00"), "m", 10.0),
      (1L, ts("2024-01-01 02:15:00"), "m", 20.0),
      (2L, ts("2024-01-01 02:45:00"), "m", 40.0),
      (3L, ts("2024-01-01 00:10:00"), "x", 5.0),
      (4L, ts("2024-01-01 00:20:00"), "y", 1.0),
      (5L, ts("2024-01-01 00:20:00"), "y", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = WindowFns.twapBars(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val h0 = 473352L
    assert(out.size == 3, s"only m-hours report: $out")
    assert(out(("m", h0)) == ((1L, 10.0, 1800.0)))
    assert(out(("m", h0 + 1)) == ((1L, 10.0, 3600.0)))
    // hour 2: 10 for 900 s then 20 for 1800 s → 45000/2700 = 16.6667
    assert(out(("m", h0 + 2)) == ((2L, 16.6667, 2700.0)))
  }

  test("TWAP diverges from the per-event mean exactly when sampling density correlates with level (W13)") {
    // burst sampling during a spike: nine readings at 50 packed into
    // one minute, one reading at 10 holding the other 59 minutes of the
    // hour (plus a sentinel next reading to close the last segment).
    // Naive per-event mean ≈ 46; TWAP stays near 10 — the number the
    // hour actually averaged.
    val burst = (0 until 9).map(i =>
      (i.toLong, ts(f"2024-01-01 00:00:${i * 6}%02d"), "m", 50.0))
    val quiet = Seq((9L, ts("2024-01-01 00:01:00"), "m", 10.0),
      (10L, ts("2024-01-01 01:00:00"), "m", 10.0))
    val out = WindowFns.twapBars((burst ++ quiet)
      .toDF("event_id", "ts", "event_type", "value")).collect()
    val h0 = out.filter(_.getLong(1) == 473352L).head
    assert(h0.getDouble(3) < 11.0,
      s"TWAP ${h0.getDouble(3)} must sit near the held value 10")
    assert(h0.getDouble(4) == 3600.0)
  }

  test("rolling correlation: exact ±1 on linear pairs, full-window contract (W14)") {
    // 25 aligned hourly readings: B = 2A+3 (r ≡ +1), C = 30−A (r ≡ −1);
    // 24-row windows ⇒ exactly 2 full windows per pair, partials at the
    // series head are excluded by the n = 24 contract
    val ev = (0 until 25).flatMap { h =>
      val t = ts(f"2024-01-01 00:00:00")
      val base = java.sql.Timestamp.from(
        t.toInstant.plusSeconds(h * 3600L))
      Seq((h * 3L, base, "A", (h + 1).toDouble),
        (h * 3L + 1, base, "B", 2.0 * (h + 1) + 3),
        (h * 3L + 2, base, "C", 30.0 - (h + 1)))
    }.toDF("event_id", "ts", "event_type", "value")
    val out = WindowFns.rollingCorr(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.size == 3)
    assert(out(("A", "B")) == ((2L, 1.0, 1.0, 1.0)))
    assert(out(("A", "C")) == ((2L, -1.0, -1.0, -1.0)))
    assert(out(("B", "C")) == ((2L, -1.0, -1.0, -1.0)))
  }

  test("TWAP two-level segmenting: a hold spanning day blocks — including an " +
    "EMPTY middle block — reassembles through the boundary path (W13)") {
    // One segment from day-1 23:30 to day-3 00:30: it crosses TWO block
    // boundaries and day 2 has no events at all, so the per-block lead
    // window never sees it — only the ends-frame lag (which must skip
    // the absent block, not stop at it) can close this hold. 26 hour
    // rows, value 2.0 throughout, 30-min edges, 24 full interior hours.
    val ev = Seq(
      (0L, ts("2024-01-01 23:30:00"), "m", 2.0),
      (1L, ts("2024-01-03 00:30:00"), "m", 4.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val rows = WindowFns.twapBars(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 26, s"expected 26 hour rows, got ${rows.length}")
    assert(rows.forall { case (_, n, tw, _) => n == 1L && tw == 2.0 },
      rows.mkString(", "))
    val hours = rows.map(_._1)
    assert(hours.max - hours.min == 25, "hour span must be contiguous")
    assert(rows.head._4 == 1800.0 && rows.last._4 == 1800.0)
    assert(rows.drop(1).dropRight(1).forall(_._4 == 3600.0))
  }

  test("EWMA baseline: strictly-prior weights, gap renormalization, burst ratio (W15)") {
    // Lags 1..24 — the baseline is strictly prior history. type m,
    // consecutive hours, cents 100/100/500: hour 0 has NO history →
    // NULL baseline/ratio; hour 1's baseline is hour 0 alone → ewma
    // 1.0, burst 1.0; the burst hour's baseline is
    // (2²³·100+2²²·100)/(2²³+2²²) = 100 cents → ewma 1.0, burst 5.0 —
    // the 5× spike reads as 5×, the property the r11 lag-0 form
    // (which capped the ratio below 2) could not deliver. Hour 0 sums
    // TWO events (0.6+0.4) — pins the hourly cents sum. type x: hours
    // 0, 10, 40 — h10's tail holds only lag-10's h0 (den renormalizes
    // over present hours), h40's 24-hour tail (hours 16..39) is empty
    // → NULL, and the current hour never feeds its own baseline.
    val ev = Seq(
      (0L, ts("2024-01-01 00:10:00"), "m", 0.6),
      (1L, ts("2024-01-01 00:40:00"), "m", 0.4),
      (2L, ts("2024-01-01 01:30:00"), "m", 1.0),
      (3L, ts("2024-01-01 02:30:00"), "m", 5.0),
      (4L, ts("2024-01-01 00:30:00"), "x", 1.0),
      (5L, ts("2024-01-01 10:30:00"), "x", 3.0),
      (6L, ts("2024-01-02 16:30:00"), "x", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val rows = WindowFns.ewmaBaseline(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), d(r, 3), d(r, 4))))
    val m = rows.filter(_._1._1 == "m").sortBy(_._1._2).map(_._2).toSeq
    assert(m == Seq((100L, None, None), (100L, Some(1.0), Some(1.0)),
      (500L, Some(1.0), Some(5.0))), m.mkString(", "))
    val x = rows.filter(_._1._1 == "x").sortBy(_._1._2).map(_._2).toSeq
    assert(x == Seq((100L, None, None), (300L, Some(1.0), Some(3.0)),
      (200L, None, None)), x.mkString(", "))
  }

  test("EWMA plan: ONE corpus agg; explode and windows ride the hourly profile (W15)") {
    val ev = Seq((0L, ts("2024-01-01 00:10:00"), "m", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val plan = WindowFns.ewmaBaseline(ev).queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      "hourly reduction must be map-side partial")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 6, s"too many exchanges:\n$plan")
  }

  test("day-over-day: same-clock-hour comparison, NULL on no-prior and zero-prior (W16)") {
    // m: day-1 10:00 = 100¢, day-2 10:00 = 150¢ → +50%; day-1 11:00 =
    // 0¢ (a zero-volume hour), day-2 11:00 = 80¢ → NULL (x/0 guard);
    // day-2 12:00 has no same-hour-yesterday row at all → NULL. A
    // row-lag formulation would wrongly compare 12:00 against 11:00.
    val ev = Seq(
      (0L, ts("2024-01-01 10:30:00"), "m", 1.0),
      (1L, ts("2024-01-02 10:30:00"), "m", 1.5),
      (2L, ts("2024-01-01 11:30:00"), "m", 0.0),
      (3L, ts("2024-01-02 11:30:00"), "m", 0.8),
      (4L, ts("2024-01-02 12:30:00"), "m", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = WindowFns.dayOverDay(ev).collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -999.0 else r.getDouble(4))).toSeq
    // sorted by hour: d1 10:00, d1 11:00, d2 10:00, d2 11:00, d2 12:00
    // (-1/-999 are null sentinels — Scala numeric == on NaN is never
    // true, even boxed, so NULL must not map to NaN here)
    assert(out == Seq(
      (100L, -1L, -999.0), (0L, -1L, -999.0),
      (150L, 100L, 50.0), (80L, 0L, -999.0),
      (200L, -1L, -999.0)), out.mkString(", "))
  }

  test("LOCF plan: corpus is touched by ONE partial hash agg; the window runs grid-side") {
    val qe = WindowFns.locfFill(gappy).queryExecution
    val plan = qe.executedPlan.toString
    // the only Window operates after the grid join (input = broadcast-joined
    // lattice), so exactly one Window is fine — but the corpus-side agg
    // must still be partial (map-side combined)
    assert(plan.contains("partial_max_by") || plan.contains("partial_"),
      "hourly reduction must be map-side partial")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 6, s"too many exchanges:\n$plan")
  }
}
