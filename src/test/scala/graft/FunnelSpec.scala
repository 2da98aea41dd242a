package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.WindowFns

/** w8's one semantic hazard is ORDER: a step only counts if it happens
  * at-or-after the previous step's first occurrence. The oracle SQL
  * re-states the same rule, so a both-sides-wrong drift would hash-match
  * — these planted rows pin the truth independently. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("steps advance only in order; ties qualify inclusively") {
    val rows = Seq(
      // u1: clean view → click → purchase: converts
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      // u2: click BEFORE first view — funnel stops at view, the later
      // purchase must not count either
      (2L, t("2024-01-01 10:00:00"), "click"),
      (2L, t("2024-01-01 10:01:00"), "view"),
      (2L, t("2024-01-01 10:02:00"), "purchase"),
      // u3: view then purchase, no click: stops after view
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:01:00"), "purchase"),
      // u4: click only — never enters the funnel
      (4L, t("2024-01-01 10:00:00"), "click"),
      // u5: click at the EXACT ts of the first view — inclusive, counts;
      // purchase at the exact ts of that click — also counts
      (5L, t("2024-01-01 10:00:00"), "view"),
      (5L, t("2024-01-01 10:00:00"), "click"),
      (5L, t("2024-01-01 10:00:00"), "purchase"),
      // noise kind is filtered before the window
      (1L, t("2024-01-01 09:00:00"), "scroll")
    ).toDF("user_id", "ts", "event_type")
    val got = WindowFns.funnelCard(rows)
      .as[(Long, Long, Long, Double)].collect().head
    // views: u1,u2,u3,u5; click-after-view: u1,u5; purchase: u1,u5
    assert(got == ((4L, 2L, 2L, 50.0)))
  }

  test("lateness audit: per-user arrival frontier, bucket boundaries " +
    "inclusive, cross-user interleaving invisible, shares per metric (W18)") {
    import spark.implicits._
    // user 1's arrival log (event_id order): 10:00, 10:05, then 10:04
    // (exactly 60 s behind the frontier — the ≤60 boundary is
    // inclusive), then 09:00 (3900 s — past the hour), then 10:06
    // (frontier advances, in order). user 2 interleaves in event_id but
    // its frontier is its OWN: both events in order.
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (6L, t("2024-01-01 08:00:00"), 2L, "click"),
      (2L, t("2024-01-01 10:05:00"), 1L, "view"),
      (3L, t("2024-01-01 10:04:00"), 1L, "view"),
      (4L, t("2024-01-01 09:00:00"), 1L, "view"),
      (7L, t("2024-01-01 08:30:00"), 2L, "click"),
      (5L, t("2024-01-01 10:06:00"), 1L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = WindowFns.latenessAudit(rows)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("click", "in_order", 2L, 0L, 100.0),
      ("view", "in_order", 3L, 0L, 60.0),
      ("view", "late_1m", 1L, 60L, 20.0),
      ("view", "late_over_1h", 1L, 3900L, 20.0)), s"got $got")
  }

  test("conversion latency: converters only, exact percentiles, stage split (W17)") {
    // u1 converts in 60+60 s; u2 converts in 600+1200 s; u3 views but
    // never converts — must NOT dilute the latency stats; u4's click
    // precedes its view (broken funnel) — also out.
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      (2L, t("2024-01-01 11:00:00"), "view"),
      (2L, t("2024-01-01 11:10:00"), "click"),
      (2L, t("2024-01-01 11:30:00"), "purchase"),
      (3L, t("2024-01-01 12:00:00"), "view"),
      (4L, t("2024-01-01 13:01:00"), "click"),
      (4L, t("2024-01-01 13:02:00"), "view"),
      (4L, t("2024-01-01 13:03:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = WindowFns.conversionLatency(rows)
      .as[(Long, Double, Double, Long, Double, Double)].collect().head
    // totals: u1 120 s, u2 1800 s → p50 = interpolated midpoint 960,
    // p90 = 120 + 0.9·1680 = 1632, max 1800; stage means over the TWO
    // converters: view→click (60+600)/2 = 330, click→purchase
    // (60+1200)/2 = 630
    assert(got == ((2L, 960.0, 1632.0, 1800L, 330.0, 630.0)), got.toString)
  }

  test("a view-free slice reports NULL conversion, not a division artifact") {
    val rows = Seq((1L, t("2024-01-01 10:00:00"), "click"),
      (1L, t("2024-01-01 10:01:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = WindowFns.funnelCard(rows).collect().head
    assert(got.getLong(0) == 0L)     // n_view
    assert(got.isNullAt(3), s"conversion_pct should be null: $got")
  }

  test("one hash exchange feeds the windows and the per-user aggregate") {
    val df = SparkEntry.queries("w8_funnel")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    // user_id hash for windows+groupBy, then the single-row global agg's
    // merge exchange — anything more means a window stopped sharing
    assert(shuffles <= 2, s"w8: $shuffles shuffle exchanges:\n$p")
    assert(!p.contains("Join"), s"w8 joins:\n$p")
  }
}
