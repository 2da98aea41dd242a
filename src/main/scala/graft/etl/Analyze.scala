package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's five analysis aggregates (A1-A5) re-expressed over the
  * driver testdata. The reference groups air-quality observations by
  * `location` (spark_processing/spark_processor.py:156-189, :210-217); our
  * fact stream is `events`, whose low-cardinality dimension is
  * `event_type` — same shape: grouped hash aggregation with partial
  * (map-side) combine, one shuffle on the group key.
  *
  * All outputs are fully ordered with tie-breakers and float aggregates are
  * round(_, 2) for cross-engine determinism (the reference rounds the same
  * way, spark_processor.py:159-161).
  */
object Analyze {

  /** A1 — per-location multi-aggregate temperature summary
    * (spark_processor.py:156-163): avg/min/max/count per group. */
  def a1LocationStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(avg(col("value")), 2).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"),
        count(lit(1)).as("reading_count"))
      .orderBy(col("event_type"))

  /** A2/A9/O1 — grouped count, sorted desc by the aggregate
    * (spark_processor.py:166-170's AQI distribution). */
  def a2GroupCountDesc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))

  /** A3 — global no-group aggregate, 5 rounded means
    * (spark_processor.py:173-180). */
  def a3GlobalMeans(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      round(avg(col("l_quantity")), 2).as("avg_qty"),
      round(avg(col("l_extendedprice")), 2).as("avg_price"),
      round(avg(col("l_discount")), 2).as("avg_discount"),
      round(avg(col("l_tax")), 2).as("avg_tax"),
      count(lit(1)).as("n"))

  /** A4 — hourly pattern: per event-hour count + mean, ordered by key
    * (spark_processor.py:183-189). */
  def a4HourlyPattern(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("hour"))

  /** A5 — two-key grouped summary: the reference's persisted
    * location×AQI-category table (spark_processor.py:210-217), with the
    * AQI bucket derived via the F1 CASE WHEN. */
  def a5TwoKeySummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("aqi_category", graft.functions.AirQuality.aqiCategory(col("value")))
      .groupBy(col("event_type"), col("aqi_category"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("event_type"), col("aqi_category"))

  /** A6 — distinct counts (dashboard.py:181 nunique). */
  def a6DistinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"))

  /** A7 — total count (dashboard.py:187 len(df)). */
  def a7TotalCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n_rows"))

  /** A8 — column means incl. a JSON-extracted measure (dashboard.py:192-199;
    * F11 json path). */
  def a8ColumnMeans(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .agg(
        round(avg(col("value")), 2).as("avg_value"),
        round(avg(col("k")), 2).as("avg_k"))

  /** A9 — value_counts over documents.lang (dashboard.py:281). */
  def a9ValueCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lang"))

  /** A10 — min/max range in one aggregate (dashboard.py:330-335). */
  def a10MinMaxRange(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      round(max(col("value")) - min(col("value")), 2).as("value_range"),
      round(min(col("value")), 2).as("min_value"),
      round(max(col("value")), 2).as("max_value"))

  /** A11 — equi-width histogram binning (dashboard.py:319). */
  def a11Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(floor(col("value") / 25).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** A12 — approx distinct at scale (HLL) side-by-side with exact.
    * approx_count_distinct is engine-specific → rows-only check (no oracle). */
  def a12ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"))

  /** A13 — rollup over two keys with subtotal rows; group keys coalesced to
    * 'ALL' so ordering is engine-independent (Spark sorts NULLS FIRST,
    * DuckDB NULLS LAST). */
  def a13Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** A14 — exact percentiles with linear interpolation (matches DuckDB
    * quantile_cont). percentile_approx would not hash-match an oracle. */
  def a14Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 2).as("p75"))
      .orderBy(col("l_returnflag"))

  /** A44 — approximate percentiles at scale, side-by-side with exact
    * (a12's HLL treatment lifted to the quantile tier): a14's exact
    * `percentile` buffers every value per group — at 100 TB that is
    * the operator a user must NOT reach for, and this card is the
    * migration evidence. `approx_percentile` (Greenwald–Khanna) keeps
    * a bounded mergeable sketch per group (state ~ accuracy, not
    * corpus), combines map-side, and its error contract is on RANK,
    * not value: with accuracy 1000 the reported p50 sits within ±0.1%
    * of the true rank. The card reports both plus the value gap, so
    * the switch from a14 is a read-off, not a leap of faith.
    * Deterministic on fixed data (no sampling) → rows-only with a
    * PropertySpec rank-error pin (the a12 discipline: engine-specific
    * sketch, CHECKED accuracy claim). */
  def a44ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 2).as("p50_exact"),
        round(expr("approx_percentile(l_quantity, 0.5D, 1000)"), 2)
          .as("p50_approx"),
        round(expr("percentile(l_quantity, 0.99)"), 2).as("p99_exact"),
        round(expr("approx_percentile(l_quantity, 0.99D, 1000)"), 2)
          .as("p99_approx"),
        count(lit(1)).as("n"))
      .withColumn("p50_gap",
        round(abs(col("p50_approx") - col("p50_exact")), 2))
      .withColumn("p99_gap",
        round(abs(col("p99_approx") - col("p99_exact")), 2))
      .orderBy(col("l_returnflag"))

  /** A15 — bivariate statistics per group: Pearson correlation, sample
    * covariance, and both sample stddevs of (quantity, extendedprice).
    * The correlation-matrix primitive a feature-engineering pass runs;
    * all four are single-pass mergeable aggregates (partial + final, no
    * extra shuffle beyond the group-by). */
  def a15Correlation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"))
      .orderBy(col("l_returnflag"))

  /** ONE body for the a16/a17 subtotal summaries — only the grouping-set
    * choice differs, so the agg/coalesce/order shape cannot drift apart.
    * Determinism device as in A13: group keys coalesced to 'ALL' (no
    * real event type or AQI bucket collides with it), fully ordered. One
    * shuffle: Spark expands the grouping sets map-side and aggregates
    * them in a single Expand + HashAggregate pass. */
  private def subtotalSummary(spark: SparkSession, dir: String)(
      group: DataFrame => org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    group(
      Tables.events(spark, dir)
        .withColumn("aqi_category",
          graft.functions.AirQuality.aqiCategory(col("value"))))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("aqi_category"), lit("ALL")).as("aqi_category"),
        col("n"), col("avg_value"))
      .orderBy(col("event_type"), col("aqi_category"))

  /** A16 — full cube over (event_type, aqi_category): every subtotal
    * combination of the reference's persisted two-key summary
    * (spark_processor.py:210-217 generalized — the A13 rollup's missing
    * half). */
  def a16Cube(spark: SparkSession, dir: String): DataFrame =
    subtotalSummary(spark, dir)(_.cube(col("event_type"), col("aqi_category")))

  /** A17 — explicit GROUPING SETS: exactly the two single-key subtotal
    * sets (per event_type, per AQI bucket) with no grand total and no
    * cross product — the piece of A13 that neither rollup nor cube can
    * express (rollup adds the grand total, cube the cross). */
  def a17GroupingSets(spark: SparkSession, dir: String): DataFrame =
    subtotalSummary(spark, dir)(_.groupingSets(
      Seq(Seq(col("event_type")), Seq(col("aqi_category"))),
      col("event_type"), col("aqi_category")))

  /** A18 — EQUI-DEPTH histogram (k buckets of ~equal row count) over
    * a continuous column, computed WITHOUT a global sort: the textbook
    * `ntile(k) OVER (ORDER BY v)` formulation funnels the whole corpus
    * through one ordering — the d22 anti-pattern — so instead the
    * boundaries come from d29's bounded-histogram device generalized:
    * quantize values to a VALUE-RANGE-bounded grid (price/100 → a few
    * thousand bins regardless of corpus size), map-side-combined bin
    * counts, driver prefix-sum picks the k−1 boundary bins (first bin
    * whose cumulative count reaches ceil(i·N/k)), then one corpus pass
    * assigns buckets by comparing against ≤ k−1 boundary LITERALS
    * (codegen'd when-chain, no join, no sort) and aggregates per
    * bucket. Boundary rows bucket LOW (a bin never splits), so depths
    * are equal up to bin granularity — the trade every sort-free
    * equi-depth makes, and exactly reproducible by the oracle. Floats
    * report min/max/avg (never sum: a 2-dp rounded SUM of ~10⁵ doubles
    * sits inside cross-engine accumulation noise; avg divides it back
    * out). */
  def a18EquidepthHist(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val binned = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") / 100).cast("long").as("bin"),
        col("l_extendedprice").as("v"))
    // bounded collect: bins ≤ price-range/100 (a few thousand), by value
    // range not corpus size — the d29/t9 collect discipline
    val hist = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bounds = equidepthBounds(hist, k)
    val bucket = bounds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col("bin") > b, 1).otherwise(0)
    }
    binned.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("v")), 2).as("min_v"),
        round(max(col("v")), 2).as("max_v"),
        round(avg(col("v")), 2).as("avg_v"))
      .orderBy(col("bucket"))
  }

  /** The a18 fence device as driver arithmetic over a collected
    * value-range-bounded histogram: equal-depth bucket UPPER bounds
    * (k−1 of them, grid-bin units; a bin may repeat when it straddles
    * several depth targets — callers' `when(bin > b)` folds count the
    * repeat, keeping Spark and every oracle's count-of-bounds replay in
    * lockstep). Shared by a18's histogram and s18's z-order layout so
    * the two can never bucket differently. */
  private[graft] def equidepthBounds(hist: Seq[(Long, Long)],
                                     k: Int): Seq[Long] = {
    val n = hist.iterator.map(_._2).sum
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cum = 0L
    hist.foreach { case (bin, c) =>
      cum += c
      while (bounds.size < k - 1 &&
        cum >= math.ceil((bounds.size + 1).toDouble * n / k).toLong)
        bounds += bin
    }
    bounds.toSeq
  }

  /** The a44 readout over a value-range-bounded grid histogram — the
    * approximate-percentile serve arithmetic for the a18 grid family's
    * streaming fold ([[graft.streaming.QuantileStreamFold]]): the
    * served value is the UPPER EDGE of the first bin whose cumulative
    * count reaches ceil(p·n) — rank-exact to the grain, so the true
    * percentile lies within one `grain` below the served value (the
    * grid's accuracy contract, checked in StreamingSpec the way
    * PropertySpec checks a44's GK rank bound). Driver arithmetic over
    * a ≤bins-row histogram, like [[equidepthBounds]] — one shared
    * kernel so a stream serve and a batch one-pass replay can never
    * disagree. None on an empty histogram (no rows yet = no order
    * statistics, not a throw). */
  private[graft] def gridApproxPercentile(hist: Seq[(Long, Long)],
      p: Double, grain: Double): Option[Double] = {
    require(p > 0.0 && p <= 1.0, s"percentile p must be in (0,1], got $p")
    val n = hist.iterator.map(_._2).sum
    if (n == 0) None
    else {
      val target = math.ceil(p * n).toLong
      var cum = 0L
      hist.iterator
        .map { case (bin, c) => cum += c; (bin, cum) }
        .find(_._2 >= target)
        .map { case (bin, _) => (bin + 1) * grain }
    }
  }

  /** The id-midpoint SPLIT device, shared (r17 verdict ask #4): a
    * one-row `(split)` frame at the midpoint of `id`'s span, meant to
    * ride beside every row via `crossJoin(broadcast(...))` so the
    * "older half vs newer half" generation boundary is computed
    * distributed — one min/max aggregate, never a driver action at
    * query-construction time. `(d0 + d1 + 1) div 2` keeps the integer
    * arithmetic BIGINT-exact on both engines (the DuckDB twin spells
    * it `(min(id) + max(id) + 1) // 2`). One definition for the six
    * consumers that previously replicated it — t26/t28's doc_id
    * halves, a35/a39's day-span boundary, sim28/sim30's vec_id
    * generations — so the split convention cannot drift per card. */
  private[graft] def idMidpoint(df: DataFrame,
                                id: org.apache.spark.sql.Column): DataFrame =
    df.agg(min(id).as("d0"), max(id).as("d1"))
      .select(expr("(d0 + d1 + 1) div 2").as("split"))

  /** A19 — robust outlier detection: per event type, the median/MAD
    * fence (|x − median| > 3·1.4826·MAD, the normal-consistent robust
    * z-score) — the anomaly gate mean/stddev rules fail on because
    * outliers drag their own threshold; median/MAD are 50%-breakdown
    * estimators. Exact interpolated percentiles (the a14 convention:
    * Spark `percentile` ≡ DuckDB `quantile_cont`; approx would not
    * hash-match) — note a14's caveat applies: exact per-group
    * percentiles buffer a group's values on its reducer, fine for
    * low-cardinality groups; a corpus-scale variant computes the two
    * medians on a18's value-range-bounded grid instead. The per-type
    * median/MAD tables are tiny and broadcast back; the corpus makes
    * three streaming passes and never shuffles by anything but the
    * 5-row type key. */
  def a19RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withDev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = withDev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("median"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(col("dev") > lit(3 * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** The algebraic per-source stats an incremental pipeline maintains:
    * every column is mergeable by combination (count/sum → sum,
    * min → min, max → max), which is exactly what makes a20's
    * no-rescan update sound. Derived stats (avg) are NOT maintained —
    * they recompute from merged primitives at read time, the
    * materialized-view discipline. */
  private[graft] def sourceStats(df: DataFrame): DataFrame =
    df.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  /** Merge two stats tables by combination — stats-table-sized work
    * (|sources| rows a side), the corpus is never touched. */
  private[graft] def mergeSourceStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"))
      .agg(sum(col("n")).as("n"),
        sum(col("total_chars")).as("total_chars"),
        min(col("min_id")).as("min_id"),
        max(col("max_id")).as("max_id"))
      .select(col("source"), col("n"), col("total_chars"),
        col("min_id"), col("max_id"),
        round(col("total_chars").cast("double") / col("n"), 2)
          .as("avg_chars"))
      .orderBy(col("source"))

  /** A20 — incremental aggregate maintenance (the materialized-view
    * verb): yesterday's persisted per-source stats + today's batch →
    * merged stats WITHOUT rescanning the corpus. At 100 TB the base
    * stats table is |sources| rows, the update costs one scan of the
    * BATCH only, and correctness rests on the algebraic-merge identity
    * merge(agg(A), agg(B)) = agg(A ∪ B) — pinned for arbitrary splits
    * in AnalyzeSpec, and the registered query's DuckDB oracle IS the
    * full recompute over the whole corpus (d18's batch convention:
    * doc_id mod [[graft.ext.Curate.BenchMod]] is today's arrival). */
  def a20IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isBatch = col("doc_id") % graft.ext.Curate.BenchMod === 0
    mergeSourceStats(sourceStats(docs.filter(!isBatch)),
      sourceStats(docs.filter(isBatch)))
  }

  /** A21 — per-group trend regression: OLS slope/intercept/R² of value
    * over time per event type — the drift detector a sensor fleet runs
    * ("is this channel creeping upward?"), and the trend number the
    * reference's dashboard eyeballs from a raw plot.
    *
    * The determinism device: corpus-wide regressions over raw doubles
    * are NOT engine-exact (Σxy accumulates in engine-specific order),
    * so both axes rescale to EXACT integers first — x = epoch-hour
    * offset from the group's min hour (≤ ~10⁴ for a year), y =
    * round(value·100) (the data's native 2-dp grain as a long). Every
    * OLS moment (n, Σx, Σy, Σxy, Σx², Σy²) is then an exact integer
    * sum — order-immune and overflow-safe by construction (Σx²·n ≲ 10¹⁴)
    * — and slope/R² are a handful of exact-integer double divisions,
    * identical on both engines before the final round. One map-side-
    * combined aggregate per group; the min-hour offset table is
    * group-cardinality-sized and broadcasts back. */
  def a21TrendRegression(spark: SparkSession, dir: String): DataFrame =
    trendRegression(Tables.events(spark, dir))

  /** The integer-moment OLS kernel over a caller-supplied events-shaped
    * frame — split out so PropertySpec can pin exact-line recovery
    * (slope/intercept/R²=1) and the rescale round-trip on planted
    * rows. */
  private[graft] def trendRegression(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600L).cast("long").as("h"),
        round(col("value") * 100, 0).cast("long").as("y"))
    val minH = e.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
    val xy = e.join(broadcast(minH), Seq("event_type"))
      .withColumn("x", col("h") - col("h0"))
    val m = xy.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // slope in value-units per hour: the y/100 rescale divides straight
    // back out of the integer moments
    val nD = col("n").cast("double")
    val cov = nD * col("sxy") - col("sx").cast("double") * col("sy")
    val varX = nD * col("sxx") - col("sx").cast("double") * col("sx")
    val varY = nD * col("syy") - col("sy").cast("double") * col("sy")
    // explicit degenerate-variance guards (the funnelCard x/0 lesson,
    // sharpened by ANSI mode ERRORING on double division by zero): a
    // single-hour group has no slope to report, a constant-y group has
    // no variance to explain — NULL on both engines, never an
    // engine-specific Inf/NaN/exception
    m.select(col("event_type"), col("n"),
        when(varX === 0.0, lit(null).cast("double"))
          .otherwise(round(cov / varX / 100.0, 6)).as("slope_per_hour"),
        when(varX === 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("sy") / 100.0 - cov / varX * col("sx") / 100.0) / nD, 4))
          .as("intercept"),
        when(varX * varY === 0.0, lit(null).cast("double"))
          .otherwise(round(cov * cov / (varX * varY), 6)).as("r2"))
      .orderBy(col("event_type"))
  }

  /** A22 — DAU / trailing-7-day WAU / stickiness: the product-analytics
    * staple (how many distinct users act per day, per trailing week,
    * and their ratio — the retention pulse every growth dashboard
    * leads with). The naive sliding COUNT(DISTINCT) re-scans seven
    * days of raw events per output day; the Spark-first shape dedups
    * ONCE to (day, user) — bounded by users × active-days, typically
    * orders of magnitude under the event count — then turns the
    * sliding window into a bounded EXPLODE: each active (day, user)
    * covers the 7 trailing windows it can influence, a second dedup
    * collapses multi-day actives per window, and both counts are plain
    * map-side-combined aggregates. No window function, no 7× raw-event
    * re-scan; the ×7 blowup rides the deduped pair frame, not the
    * corpus. Output restricted to days with activity (inner join). */
  def a22ActiveUsers(spark: SparkSession, dir: String): DataFrame =
    activeUsers(Tables.events(spark, dir))

  /** The DAU/WAU kernel over a caller-supplied (ts, user_id) frame —
    * injectable so the trailing-window semantics pin on planted rows. */
  private[graft] def activeUsers(events: DataFrame): DataFrame =
    activeUsersFromPairs(
      events.select(to_date(col("ts")).as("d"), col("user_id")).distinct())

  /** The serve half over an ALREADY-DEDUPED (d, user_id) pair frame —
    * which is precisely the bounded state the live twin
    * ([[graft.streaming.ActiveUsersStreamFold]]) accumulates, so stream
    * and batch serve through ONE kernel and can never drift. */
  private[graft] def activeUsersFromPairs(du: DataFrame): DataFrame = {
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(d, date_add(d, 6))")).as("wd"),
        col("user_id"))
      .distinct()
      .groupBy(col("wd")).agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("d") === wau("wd"))
      // ISO string, not DateType: the two engines' native date carriers
      // differ at the driver-compare layer (datetime.date vs
      // datetime64); a formatted day key compares byte-identically
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  /** A23 — rolling z-score anomaly detection: each reading scored
    * against the TRAILING window of its own series (20 rows, current
    * row EXCLUDED — an outlier must not inflate its own baseline), the
    * live-monitor verb behind the reference's alerting domain and the
    * robust cousin a19 computes globally. Per-type report: readings
    * scored, anomalies at |z| > 3, and the worst excursion.
    *
    * Scale shape (r12 rework — the w13 two-level device generalized to
    * ROW-count windows): a per-type-only window serializes the corpus
    * sort over |types| partitions. Instead (1) rows get a GLOBAL
    * per-type index without a global sort — intra-block row_numbers
    * over (type, id-range block), parallel, plus per-(type, block)
    * cumulative offsets from one window over the bounded block frame,
    * broadcast back; (2) the rolling window re-partitions by (type,
    * INDEX block of 4096): each row scores in its own index block, and
    * every row in a block's last 20 indices ALSO rides into the next
    * block as a flagged context copy, so the −20..−1 frame sees exactly
    * the global trailing rows — types × blocks parallelism, results
    * byte-identical (same rows, same frame ORDER, so even the float
    * fold matches; the oracle is untouched). Rows with fewer than 10
    * baseline points or zero variance are excluded BEFORE scoring (the
    * d29/a21 degenerate-guard discipline — engines disagree on x/0).
    * z rounds(4) before the threshold compare so both engines flag the
    * identical row set. */
  def a23RollingAnomaly(spark: SparkSession, dir: String): DataFrame =
    rollingAnomaly(Tables.events(spark, dir))

  private[graft] def rollingAnomaly(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // id-range block width for the parallel index pass, scaled to the
    // observed id span so the block COUNT is capped at 4096 (advisor
    // r12: a fixed 65536-wide block makes the broadcast offsets frame
    // O(corpus/65536) rows — unbounded at scale; capping blocks keeps
    // it ≤ types×4096 rows at ANY corpus size, a true 'bounded block
    // frame'). Results are block-width-invariant — the pass just
    // reconstructs the exact global per-type index — so only the
    // parallelism/broadcast trade moves; the one extra min/max agg is
    // a column-stats-cheap scan paid once per invocation.
    val span = events.agg(min(col("event_id")), max(col("event_id"))).head()
    val idBlock =
      if (span.isNullAt(0)) 65536L
      else math.max(65536L, (span.getLong(1) - span.getLong(0)) / 4096L + 1)
    val ixBlock = 4096L  // index blocks for the parallel rolling pass
    val trail = 20
    val base = events.select(col("event_type"), col("event_id"), col("value"))
      .withColumn("blk", expr(s"event_id div ${idBlock}L"))
    val wIntra = Window.partitionBy(col("event_type"), col("blk"))
      .orderBy(col("event_id"))
    val indexed0 = base.withColumn("intra", row_number().over(wIntra))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = indexed0.groupBy(col("event_type"), col("blk"))
      .agg(max(col("intra")).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("event_type"), col("blk"), col("off"))
    val indexed = indexed0
      .join(broadcast(offsets), Seq("event_type", "blk"))
      .withColumn("idx", col("off") + col("intra") - 1)
      .select(col("event_type"), col("event_id"), col("value"), col("idx"))
    // one explode, not a two-leg union: a union would re-derive the
    // whole index pipeline per leg (ReusedExchange dedupes the shuffle
    // but not the window/join recomputation above it)
    val fanned = indexed
      .withColumn("home", expr(s"idx div ${ixBlock}L"))
      .withColumn("copies",
        when(expr(s"idx % ${ixBlock}L") >= ixBlock - trail,
          array(struct(col("home").as("rblk"), lit(false).as("ctx")),
            struct((col("home") + 1).as("rblk"), lit(true).as("ctx"))))
          .otherwise(array(
            struct(col("home").as("rblk"), lit(false).as("ctx")))))
      .select(col("event_type"), col("event_id"), col("value"), col("idx"),
        explode(col("copies")).as("c"))
      .select(col("event_type"), col("event_id"), col("value"), col("idx"),
        col("c.rblk").as("rblk"), col("c.ctx").as("ctx"))
    val wRoll = Window.partitionBy(col("event_type"), col("rblk"))
      .orderBy(col("idx")).rowsBetween(-trail, -1)
    fanned
      .withColumn("mu", avg(col("value")).over(wRoll))
      .withColumn("sd", stddev_samp(col("value")).over(wRoll))
      .withColumn("n_base", count(col("value")).over(wRoll))
      .filter(!col("ctx") && col("n_base") >= 10 && col("sd") > 0)
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** A24 — CUSUM changepoint detection (Page 1954): the sequential
    * drift alarm a23's pointwise z-score cannot raise — a sustained
    * small shift (say +0.8σ for 50 readings) never trips a |z|>3 gate,
    * but its CUSUM climbs linearly until the alarm fires. Standard
    * tabular form with slack k=0.5σ and decision threshold h=4σ, both
    * sides: S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − k), S⁻ᵢ likewise on −xᵢ.
    *
    * The recurrence LOOKS inherently sequential (each S needs its
    * predecessor), but it has a closed form every engine's running
    * windows can compute: with Pᵢ = Σⱼ≤ᵢ(xⱼ−k),
    *   S⁺ᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ)
    * — a running SUM and a running MIN, two cumulative window columns
    * over the same (event_type, event_id) order. No driver loop, no
    * UDF with carried state, no mapPartitions: the whole detector is
    * four codegen window expressions per side, partition-parallel
    * across series.
    *
    * Cross-engine float discipline: μ/σ round(6) before standardizing,
    * the standardized x rounds(6) before the prefix sum (both engines
    * then accumulate IDENTICAL doubles in IDENTICAL frame order —
    * running frames evaluate sequentially in both), S rounds(4) before
    * the h-threshold compare so the alarm row set cannot drift on a
    * ulp. Zero-variance series are dropped (x/0). */
  def a24CusumChangepoint(spark: SparkSession, dir: String): DataFrame =
    cusumChangepoint(Tables.events(spark, dir))

  /** The two-sided CUSUM window pass over a frame carrying
    * (event_type, event_id, x) plus per-type carry-in columns
    * `s0_hi`/`s0_lo` (lit(0.0) for a from-scratch batch run). The
    * carry generalizes the prefix-min identity:
    *   Sᵢ = Pᵢ − min(−S₀, 0, min_{j≤i} Pⱼ)
    * (at S₀=0 this collapses to the textbook closed form) — which is
    * what lets the STREAMING twin fold each micro-batch with one
    * distributed window pass instead of a sequential driver loop.
    * Shared by batch a24 and [[graft.streaming.CusumStreamFold]] so
    * the two legs cannot drift. */
  private[graft] def cusumWindows(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("p_hi", sum(col("x") - lit(0.5)).over(run))
      .withColumn("p_lo", sum(-col("x") - lit(0.5)).over(run))
      .withColumn("s_hi",
        round(col("p_hi") -
          least(-col("s0_hi"), lit(0.0), min(col("p_hi")).over(run)), 4))
      .withColumn("s_lo",
        round(col("p_lo") -
          least(-col("s0_lo"), lit(0.0), min(col("p_lo")).over(run)), 4))
  }

  private[graft] def cusumChangepoint(events: DataFrame): DataFrame = {
    val stats = events.groupBy(col("event_type")).agg(
      round(avg(col("value")), 6).as("mu"),
      round(stddev_samp(col("value")), 6).as("sd"))
    cusumReport(events, stats)
  }

  /** Fixed-reference CUSUM (the process-control mode: standardize
    * against a TRAINED baseline instead of the full series) — what the
    * live twin [[graft.streaming.CusumStreamFold]] monitors against;
    * exposed batch-side so stream ≡ batch parity pins exactly. */
  private[graft] def cusumChangepointWithRef(events: DataFrame,
      ref: Map[String, (Double, Double)]): DataFrame = {
    import events.sparkSession.implicits._
    val stats = ref.toSeq.map { case (t, (mu, sd)) => (t, mu, sd) }
      .toDF("event_type", "mu", "sd")
    cusumReport(events, stats)
  }

  private def cusumReport(events: DataFrame, stats: DataFrame): DataFrame = {
    val scored = cusumWindows(events
      .join(broadcast(stats.filter(col("sd") > 0)), "event_type")
      .withColumn("x", round((col("value") - col("mu")) / col("sd"), 6))
      .withColumn("s0_hi", lit(0.0))
      .withColumn("s0_lo", lit(0.0)))
    // Per-SIDE alarm accounting, not a merged flag: under full-series
    // standardization a level shift alarms BOTH sides — the pre-shift
    // regime sits below the long-run mean exactly as far as the
    // post-shift regime sits above it — so a changepoint localizes as
    // "low-side alarm in the before, high-side alarm in the after".
    // One merged first_alarm_id would always point at whichever regime
    // came first and say nothing about the shift direction.
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(max(col("s_hi")), 4).as("max_s_hi"),
        round(max(col("s_lo")), 4).as("max_s_lo"),
        sum(when(col("s_hi") > 4.0, 1L).otherwise(0L)).as("n_hi_alarms"),
        sum(when(col("s_lo") > 4.0, 1L).otherwise(0L)).as("n_lo_alarms"),
        min(when(col("s_hi") > 4.0, col("event_id"))).as("first_hi_alarm_id"),
        min(when(col("s_lo") > 4.0, col("event_id"))).as("first_lo_alarm_id"))
      .orderBy(col("event_type"))
  }

  /** A25 — event-transition matrix (first-order Markov over each user's
    * event sequence): P(next event type | current), the navigation/
    * behavior model product analytics reads beside w8's fixed funnel —
    * w8 asks "did users follow THIS path", a25 surfaces which paths
    * exist and their strengths, plus self-loop rates (repetitive
    * behavior) for free.
    *
    * Scale shape: ONE window shuffle partitioned by user_id (per-user
    * sequences are independent; a hot user serializes only their own
    * lag chain), then the pair frame collapses to at most |types|²
    * rows via a map-side-combined count; the probability divides two
    * exact longs per cell. No self-join on the event table (the lag
    * window IS the adjacency), no driver state. */
  def a25EventTransitions(spark: SparkSession, dir: String): DataFrame =
    eventTransitions(Tables.events(spark, dir))

  private[graft] def eventTransitions(events: DataFrame): DataFrame =
    transitionReport(transitionPairs(events))

  /** The adjacency extraction: one lag window per user, collapsed to
    * (prev_type, next_type, n) — at most |types|² rows. Shared with the
    * streaming twin [[graft.streaming.TransitionStreamFold]], whose
    * batch-internal counting is exactly this pass. */
  private[graft] def transitionPairs(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(seq))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The report over an already-counted (prev_type, next_type, n) pair
    * frame — row probabilities divide exact longs, so batch and stream
    * serve identical floats from identical counts. */
  private[graft] def transitionReport(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(totals), 4))
      .select(col("prev_type"), col("next_type"), col("n"), col("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** A26 — seasonal-profile anomaly detection: score each reading
    * against its series' OWN hour-of-day baseline (the μ/σ of that
    * event_type at that clock hour across the corpus). The third leg of
    * the anomaly tier, closing the family: a19 fences against the
    * GLOBAL distribution (a diurnal peak looks anomalous every day),
    * a23 against the trailing WINDOW (a slow-onset daily pattern walks
    * the baseline up), a26 against the SEASON — "is 95 at 3am normal
    * FOR 3am" is the question a monitoring system actually asks of
    * periodic telemetry (air quality is strongly diurnal: reference
    * dashboard.py's hourly charts exist precisely because of it).
    *
    * Scale shape: the profile is a map-side-combined aggregate down to
    * |types| × 24 cells — broadcast back over the corpus (never a
    * shuffle of events); scoring is pure per-row arithmetic; the report
    * re-collapses to the same 24-cell grid. Two corpus passes total
    * (profile + score), zero event-sized shuffles. Degenerate guard:
    * zero-variance cells are excluded before scoring (x/0, the a23
    * discipline). Float discipline: μ/σ round(6) before standardizing,
    * z rounds(4) before the |z|>3 compare — both engines flag the
    * identical row set. */
  def a26SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomaly(Tables.events(spark, dir))

  private[graft] def seasonalAnomaly(events: DataFrame): DataFrame = {
    val hod = events.withColumn("hod", hour(col("ts")))
    val prof = hod.groupBy(col("event_type"), col("hod")).agg(
      round(avg(col("value")), 6).as("mu"),
      round(stddev_samp(col("value")), 6).as("sd"))
    seasonalReport(hod, prof)
  }

  /** Fixed-reference seasonal scoring (the live-monitor mode: the
    * profile comes from a TRAINED baseline, not the scored data — a
    * stream cannot standardize by statistics it hasn't seen yet);
    * exposed batch-side so [[graft.streaming.SeasonalStreamFold]]'s
    * parity pin is exact. Ref keys are (event_type, hour-of-day). */
  private[graft] def seasonalAnomalyWithRef(events: DataFrame,
      ref: Map[(String, Int), (Double, Double)]): DataFrame = {
    import events.sparkSession.implicits._
    val prof = ref.toSeq.map { case ((t, h), (mu, sd)) => (t, h, mu, sd) }
      .toDF("event_type", "hod", "mu", "sd")
    seasonalReport(events.withColumn("hod", hour(col("ts"))), prof)
  }

  /** The scoring + report kernel over a (…, hod) frame and a
    * (event_type, hod, mu, sd) profile — shared by the self-profiled
    * batch query, the fixed-reference mode, and the streaming fold's
    * per-batch pass, so the three legs cannot drift. */
  private[graft] def seasonalReport(hod: DataFrame,
      prof: DataFrame): DataFrame =
    hod.join(broadcast(prof.filter(col("sd") > 0)), Seq("event_type", "hod"))
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
      .groupBy(col("event_type"), col("hod"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("mu")), 4).as("mu"),
        round(first(col("sd")), 4).as("sd"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy(col("event_type"), col("hod"))

  /** A27 — A/B experiment readout (two-proportion z-test): split users
    * into arms by the SAME deterministic IdHash assignment d16 uses for
    * train/val/test, take per-user conversion (≥1 purchase event), and
    * report arm sizes, rates, the pooled-variance z statistic, and the
    * |z| > 1.96 verdict — the experiment card every product decision
    * reads, and the statistical floor under d16's split machinery
    * (assignment alone says nothing; the test says whether the arms
    * actually differ). Under the null (IdHash arms are exchangeable)
    * this is also a standing A/A harness: significance should appear
    * ~5% of the time, so a persistent large |z| flags a BROKEN split.
    *
    * Scale + float shape: one map-side-combined per-user conversion
    * aggregate (users-sized), one |arms|-row aggregate, then the
    * statistic assembles via broadcast-singleton crossJoin (the j9
    * audit-row shape, census-allowlisted). Counts stay exact longs to
    * the end; rates and z are single compound float expressions written
    * IDENTICALLY in both engines (same parenthesization ⇒ same IEEE
    * ops), rounds(4); degenerate pooled variance (p̂ = 0 or 1) reports
    * NULL z rather than x/0. */
  def a27AbTest(spark: SparkSession, dir: String): DataFrame =
    abTest(Tables.events(spark, dir))

  private[graft] def abTest(events: DataFrame): DataFrame =
    abTestFromUsers(userConversions(events))

  /** The corpus reduction behind a27: per-user converted-ever flags —
    * ONE map-side-combined aggregate, and an OR (max) MONOID, so the
    * frame merges across micro-batches and is the live fold's state
    * shape ([[graft.streaming.AbTestStreamFold]]). */
  private[graft] def userConversions(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))

  /** The arm split + two-proportion z arithmetic over a caller-supplied
    * (user_id, converted) frame — shared verbatim by batch and the
    * fold's serve pass. */
  /** The deterministic 50/50 arm split shared by a27 and a32 — the
    * SAME IdHash assignment d16's splits ride, extracted so the two
    * experiment readouts can never disagree on who is in which arm. */
  private[graft] def armCol: Column =
    when(graft.functions.IdHash.bucket(col("user_id"), 100) < 50, "A")
      .otherwise("B")

  private[graft] def abTestFromUsers(usersIn: DataFrame): DataFrame = {
    val users = usersIn.withColumn("arm", armCol)
    val arms = users.groupBy(col("arm")).agg(
      count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n_users").as("n_a"), col("n_conv").as("c_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n_users").as("n_b"), col("n_conv").as("c_b"))
    a.crossJoin(broadcast(b))
      .withColumn("p_pool",
        (col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("se", sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .withColumn("z",
        when(col("se") === 0.0, lit(null).cast("double"))
          .otherwise(round((col("c_a").cast("double") / col("n_a") -
            col("c_b").cast("double") / col("n_b")) / col("se"), 4)))
      .select(col("n_a"), col("c_a"),
        round(col("c_a").cast("double") / col("n_a"), 4).as("rate_a"),
        col("n_b"), col("c_b"),
        round(col("c_b").cast("double") / col("n_b"), 4).as("rate_b"),
        col("z"), (abs(coalesce(col("z"), lit(0.0))) > 1.96)
          .as("significant"))
  }

  /** A28 — RFM segmentation (recency / frequency / monetary — the
    * classic customer-value partition marketing and lifecycle tooling
    * run first): per user, days since last activity (recency, anchored
    * to the corpus' own max day — deterministic, no wall clock),
    * event count (frequency), and purchase value (monetary, exact
    * cents), each bucketed 1-3 by fixed thresholds; the report is the
    * segment census with per-segment averages.
    *
    * Scale shape: ONE map-side-combined per-user aggregate (the corpus
    * never shuffles twice), the single-row anchor broadcast onto it
    * (w11 grid device, census-allowlisted), and a ≤27-cell census agg.
    * Integer discipline: days are exact epoch-day longs, money exact
    * cents; the only floats are the report's averages, rounds(2). */
  def a28RfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegments(Tables.events(spark, dir))

  private[graft] def rfmSegments(events: DataFrame): DataFrame =
    rfmFromUsers(rfmPerUser(events))

  /** The corpus reduction behind a28: per-user (last_day, freq, cents)
    * — ONE map-side-combined aggregate whose three columns are a
    * MERGEABLE MONOID (max / sum / sum), making this frame the live
    * fold's state shape ([[graft.streaming.RfmStreamFold]]). */
  private[graft] def rfmPerUser(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      max(expr("unix_timestamp(ts) div 86400")).as("last_day"),
      count(lit(1)).as("freq"),
      coalesce(sum(when(col("event_type") === "purchase",
        round(col("value") * 100, 0).cast("long"))), lit(0L)).as("cents"))

  /** Anchor + bucketing + census over a caller-supplied per-user frame
    * — shared verbatim by batch and the fold's serve pass (the anchor
    * recomputes from the folded state, so it ADVANCES with the stream,
    * the a29 device). */
  private[graft] def rfmFromUsers(perUser: DataFrame): DataFrame = {
    val anchor = perUser.agg(max(col("last_day")).as("anchor_day"))
    perUser.crossJoin(broadcast(anchor))
      .withColumn("recency_d", col("anchor_day") - col("last_day"))
      .withColumn("r", when(col("recency_d") <= 1, 3)
        .when(col("recency_d") <= 7, 2).otherwise(1))
      .withColumn("f", when(col("freq") >= 50, 3)
        .when(col("freq") >= 20, 2).otherwise(1))
      .withColumn("m", when(col("cents") >= 5000, 3)
        .when(col("cents") >= 1000, 2).otherwise(1))
      .withColumn("segment", concat(lit("R"), col("r"), lit("F"), col("f"),
        lit("M"), col("m")))
      .groupBy(col("segment")).agg(
        count(lit(1)).as("n_users"),
        round(avg(col("recency_d")), 2).as("avg_recency_d"),
        round(avg(col("freq")), 2).as("avg_freq"),
        sum(col("cents")).as("cents_total"))
      .orderBy(col("segment"))
  }

  /** A29 — Kaplan-Meier survival curve over user lifetimes (the
    * retention statistician's view, where w9's cohort grid is the
    * marketer's): per observed lifetime day d, the at-risk count, churn
    * events, censored exits, and the product-limit survival estimate
    * S(d) = Π_{k≤d} (1 − deaths_k / at_risk_k). Right-censoring is
    * real here, not decorative: a user whose last activity falls within
    * 7 days of the corpus' final day may simply not have churned yet —
    * counting them as deaths biases S(d) down, the exact error the KM
    * estimator exists to avoid (censored users leave the risk set
    * without contributing a churn event). The anchor is the corpus' own
    * max day (a28's device) — deterministic, no wall clock.
    *
    * Scale + float shape: ONE map-side-combined per-user aggregate
    * (users-sized — the corpus shuffles once), the anchor broadcast
    * onto it (census-allowlisted singleton), then a lifetime-histogram
    * aggregate bounded by the DAY SPAN, on which the running windows
    * operate — a single-partition window over a ≤|days| frame, never
    * the corpus (the a18 boundedness argument). Counts stay exact longs
    * end to end; the product limit runs as exp(Σ ln(1−h_k)) with the
    * summation ordered by day (identical fold order in both engines),
    * and a cumulative died-out flag short-circuits S to exactly 0 when
    * some day's hazard hits 1 (Spark's ln(0) is NULL, DuckDB's is
    * −inf — the flag keeps both engines off that edge), rounds(4). */
  def a29SurvivalCurve(spark: SparkSession, dir: String): DataFrame =
    survivalCurve(Tables.events(spark, dir))

  private[graft] def survivalCurve(events: DataFrame): DataFrame =
    survivalFromSpans(userSpans(events))

  /** The corpus reduction behind a29: per-user (first_day, last_day)
    * activity spans — ONE map-side-combined aggregate. Split out
    * because min/max spans are a MERGEABLE MONOID, which makes this
    * frame the live fold's state shape
    * ([[graft.streaming.SurvivalStreamFold]] re-aggregates unioned
    * partials through this same reduction). */
  private[graft] def userSpans(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      min(expr("unix_timestamp(ts) div 86400")).as("first_day"),
      max(expr("unix_timestamp(ts) div 86400")).as("last_day"))

  /** The KM arithmetic over a caller-supplied spans frame — shared
    * verbatim by the batch query and the streaming fold's serve pass
    * (the w15/seasonalReport shared-kernel discipline). */
  private[graft] def survivalFromSpans(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the spans frame feeds TWO subtrees (the anchor and the exits
    // histogram): eager checkpoint so the reduction runs ONCE, not
    // once per consumer (the d35/g6 twice-consumed device)
    val perUser = spans.localCheckpoint(true)
    val anchor = perUser.agg(max(col("last_day")).as("anchor_day"))
    val u = perUser.crossJoin(broadcast(anchor))
      .select((col("last_day") - col("first_day")).as("lifetime"),
        (col("last_day") >= col("anchor_day") - 7).as("censored"))
    val byDay = u.groupBy(col("lifetime").as("day")).agg(
      count(lit(1)).as("exits"),
      sum(when(col("censored"), 0L).otherwise(1L)).as("deaths"),
      sum(when(col("censored"), 1L).otherwise(0L)).as("censored_exits"))
    val ord = Window.orderBy(col("day"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the risk-set total is just Σ exits over the days histogram — a
    // window over the ≤|days| frame, not a third corpus aggregate
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byDay
      .withColumn("n_total", sum(col("exits")).over(all))
      .withColumn("at_risk",
        col("n_total") - coalesce(sum(col("exits")).over(prior), lit(0L)))
      .withColumn("died_out",
        max((col("deaths") === col("at_risk")).cast("int")).over(upTo))
      .withColumn("log_surv",
        sum(when(col("deaths") < col("at_risk"),
          log(lit(1.0) - col("deaths").cast("double") / col("at_risk")))
          .otherwise(lit(0.0))).over(upTo))
      .select(col("day"), col("at_risk"), col("deaths"),
        col("censored_exits"),
        when(col("died_out") === 1, lit(0.0))
          .otherwise(round(exp(col("log_surv")), 4)).as("survival"))
      .orderBy(col("day"))
  }

  /** A30 — last-touch conversion attribution: every purchase credits
    * the user's most recent PRECEDING non-purchase event type (their
    * "channel"), and the report is the per-channel credit census —
    * purchases, exact revenue cents, and credit share. The question
    * marketing actually asks of the funnel (w8 says how many users
    * convert; this says WHICH behavior gets the credit when they do);
    * purchases with no preceding touch in the corpus report under
    * '(none)' rather than vanishing — stated contract, a row consumers
    * must see to know their attribution window truncates.
    *
    * Scale + determinism shape: ONE hash shuffle on user_id serves the
    * carry window (`last(..., ignoreNulls)` over the (ts, event_id)-
    * ordered user partition — deterministic under ties by the w10
    * tie-break), then the census aggregate is map-side combined and
    * ≤|types| rows; the share denominator is a window over THAT
    * bounded frame (the a29 device), never a second corpus pass.
    * Counts and cents stay exact longs; share is one division,
    * rounds(4). */
  def a30Attribution(spark: SparkSession, dir: String): DataFrame =
    lastTouchAttribution(Tables.events(spark, dir))

  private[graft] def lastTouchAttribution(events: DataFrame): DataFrame =
    attributionReport(attributionCensus(attributionCredits(events)))

  /** Per-purchase credit assignment: each purchase row paired with its
    * user's most recent PRECEDING non-purchase touch ((ts, event_id)
    * order) — the one corpus-window pass. Split out because the
    * boundary between batches is exactly a per-user carried touch row
    * ([[graft.streaming.AttributionStreamFold]] folds the carried touch
    * in FRONT of each batch through this same kernel). */
  private[graft] def attributionCredits(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val carry = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(carry))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("(none)")).as("channel"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
  }

  /** The additive census — ≤|types| cells of (n, cents); merges across
    * micro-batches by plain addition. */
  private[graft] def attributionCensus(credits: DataFrame): DataFrame =
    credits.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))

  /** Report arithmetic over a caller-supplied census frame — the share
    * denominator is a window over the ≤|types| census, never a second
    * corpus pass; shared verbatim by batch and the fold's serve. */
  private[graft] def attributionReport(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    census
      .withColumn("share",
        round(col("n_purchases").cast("double")
          / sum(col("n_purchases")).over(all), 4))
      .orderBy(col("channel"))
  }

  /** A31 — frequent-path mining (top second-order journeys): the 20
    * most-travelled 3-step event-type sequences across all user
    * streams, with traversal counts AND distinct-traveller counts —
    * the "what do users actually do" discovery card between w8 (did
    * users follow THIS fixed path) and a25 (one-step transition
    * strengths): a25's first-order matrix cannot distinguish
    * view→click→purchase from view→click→view, which is exactly the
    * difference a product team acts on. n_users rides beside n_paths
    * because a path travelled 10k times by 40 bot-like users and one
    * travelled 10k times by 9k users are different findings.
    *
    * Scale shape: ONE window shuffle partitioned by user_id (the a25
    * adjacency device, two lag taps on the same sorted pass — a
    * self-join formulation would shuffle the corpus three times); the
    * path frame collapses map-side to ≤|types|³ cells for n_paths,
    * and n_users dedups (path, user) pairs — bounded by users ×
    * distinct-paths-per-user, far under the event count; top-20 is
    * TakeOrderedAndProject. Counts exact longs; ordering fully
    * tie-broken on the path triple. */
  def a31PathMining(spark: SparkSession, dir: String): DataFrame =
    pathMining(Tables.events(spark, dir))

  private[graft] def pathMining(events: DataFrame): DataFrame =
    pathReport(pathUserCounts(pathTriples(events)))

  /** One row per path traversal (user kept): the two-lag-tap window
    * pass. Split out because a micro-batch boundary only needs the
    * user's last TWO events carried in front of the next batch to make
    * this same kernel produce exactly the boundary-crossing triples
    * ([[graft.streaming.PathStreamFold]]). */
  private[graft] def pathTriples(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .withColumn("p1", lag(col("event_type"), 1).over(seq))
      .withColumn("p2", lag(col("event_type"), 2).over(seq))
      .filter(col("p2").isNotNull)
      .select(col("user_id"), col("p2").as("step1"), col("p1").as("step2"),
        col("event_type").as("step3"))
  }

  /** The additive per-(path, user) traversal counts — the state shape
    * that makes BOTH report numbers mergeable: n_paths is the sum of
    * these counts, n_users the number of these rows per path. */
  private[graft] def pathUserCounts(triples: DataFrame): DataFrame =
    triples.groupBy(col("step1"), col("step2"), col("step3"),
      col("user_id")).agg(count(lit(1)).as("n"))

  /** Top-20 report over a caller-supplied (path, user, n) frame —
    * shared verbatim by batch and the fold's serve. */
  private[graft] def pathReport(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("step1"), col("step2"), col("step3"))
      .agg(sum(col("n")).as("n_paths"), count(lit(1)).as("n_users"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)

  /** A32 — sequential A/B monitoring, the peeking problem made
    * explicit (Armitage et al. 1969 measured it; group-sequential
    * designs à la O'Brien-Fleming 1979 are the classical fix; Johari
    * et al. 2017 its always-valid modern form). a27 reads ONE
    * two-proportion z at the end of the experiment; a live product
    * team reads the dashboard EVERY DAY, and under daily peeking the
    * naive |z| > 1.96 rule's false-positive rate inflates several-fold
    * — the most common way experiments "win". The card: one row per
    * analysis day with cumulative arm enrollments (a user enrolls at
    * their FIRST event day) and conversions (first purchase day), the
    * pooled z at that day, the naive verdict, and the
    * O'Brien-Fleming-style boundary 1.96/√t (t = information fraction
    * = cumulative enrollments / final enrollments) with ITS verdict —
    * a z that crosses 1.96 on day 3 but never clears the early
    * boundary is exactly the experiment a27 alone would mis-call.
    *
    * Scale + determinism shape: ONE map-side-combined per-user
    * aggregate (both days are MIN-monoids — the live fold's state,
    * [[graft.streaming.SeqAbStreamFold]]), checkpointed once for its
    * two consumers (enrollment and conversion deltas — the a29
    * twice-consumed device), a day-keyed delta aggregate bounded by
    * the DAY SPAN, and single-partition windows over that ≤|days|
    * frame, never the corpus (the a18/a29 boundedness argument).
    * Counts stay exact longs; z and the boundary are the only floats,
    * rounds(4), and both verdicts compare the ROUNDED values so the
    * booleans cannot sit on a cross-engine ulp. */
  /** A33 — Mann–Whitney U rank-sum test between the experiment arms
    * over per-user purchase REVENUE: the continuous-metric companion
    * to a27's two-proportion z. A revenue metric is heavy-tailed and
    * zero-inflated — a t-test's normality assumption is exactly wrong
    * there, and a27's conversion flag cannot see a treatment that
    * moves HOW MUCH converters spend. The rank test is the standard
    * nonparametric readout (Mann & Whitney 1947), tie-corrected
    * normal approximation.
    *
    * Scale shape: the corpus collapses ONCE to per-user cents (an
    * additive monoid over exact integer cents — the ×100 grid, so
    * aggregation order cannot drift the sum — and the live fold's
    * state shape, [[graft.streaming.MannWhitneyFold]]); users bin to
    * whole currency units (the d29/a18 bounded-grid device: the
    * registered statistic is the BINNED U, deterministic and
    * engine-replayable; the sole window runs over the BIN frame,
    * value-range-bounded, never user-sized). Rank arithmetic stays in
    * INTEGER half-units (`midrank2` = 2·rank): every distributed sum
    * is exact-integer and order-immune; floats appear only in the
    * final scalar z / effect-size expressions, parenthesized
    * identically to the DuckDB oracle. Arm split = the SAME IdHash
    * assignment a27/a32 ride ([[armCol]]), so the three experiment
    * readouts can never disagree on who is in which arm. */
  def a33MannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitney(Tables.events(spark, dir))

  private[graft] def mannWhitney(events: DataFrame): DataFrame =
    mannWhitneyFromUsers(userValueCents(events))

  /** The corpus reduction behind a33: per-user purchase revenue in
    * exact integer cents — an additive monoid, the fold's state. */
  private[graft] def userValueCents(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L))
        .as("cents"))

  private[graft] def mannWhitneyFromUsers(usersIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = usersIn.withColumn("arm", armCol)
      .withColumn("bin", expr("cents div 100"))
    val hist = users.groupBy(col("bin")).agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
      .withColumn("t", col("na") + col("nb"))
    // the ONE ordered window runs over the bin frame — bounded by the
    // currency grid, not the user count
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("cumb", coalesce(sum(col("t")).over(w), lit(0L)))
      // midrank in HALF-UNITS: 2·midrank = 2·cumBefore + t + 1 stays
      // integer through ties, so the rank-sum aggregate is exact
      .withColumn("midrank2",
        lit(2L) * col("cumb") + col("t") + lit(1L))
    val g = ranked.agg(
      sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
      sum(col("na") * col("midrank2")).as("ra2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tie_sum"))
    val n = col("n_a") + col("n_b")
    val uA = round((col("ra2") - col("n_a") * (col("n_a") + 1))
      / lit(2.0), 1)
    g.select(col("n_a"), col("n_b"), uA.as("u_a"), col("tie_sum"))
      .withColumn("mu", col("n_a") * col("n_b") / lit(2.0))
      .withColumn("sigma", sqrt(col("n_a") * col("n_b") / lit(12.0) *
        ((n + lit(1L)) - col("tie_sum") / (n * (n - lit(1.0))))))
      .select(col("n_a"), col("n_b"), col("u_a"),
        when(col("sigma") === 0.0, lit(null).cast("double"))
          .otherwise(round((col("u_a") - col("mu")) / col("sigma"), 4))
          .as("z"),
        round(lit(1.0) - lit(2.0) * col("u_a")
          / (col("n_a") * col("n_b")), 4).as("effect_r"))
      .withColumn("significant",
        abs(coalesce(col("z"), lit(0.0))) > 1.96)
  }

  /** A34 — two-sample Kolmogorov–Smirnov test between the arms over
    * the same per-user revenue metric as a33: D = max ECDF gap. The
    * two tests answer DIFFERENT questions and a real experiment reads
    * both — Mann–Whitney is powered for location shift ("did spend
    * move up?"), KS for ANY distribution change (a treatment that
    * widens the spread or splits the population moves D while leaving
    * the rank-sum untouched). Shares a33's entire reduction: per-user
    * exact cents (the same fold state serves both live readouts —
    * [[graft.streaming.MannWhitneyFold.serveKs]]), whole-unit bins,
    * the one bounded-bin-frame window.
    *
    * Exactness: D is computed as an INTEGER numerator max —
    * |cumA·n_b − cumB·n_a| — over the bin frame, divided once at the
    * end, so the statistic is order-immune with zero float
    * accumulation (long-safe to ~10⁹ users per arm; past that the
    * numerator ratio moves to double). The asymptotic p uses the
    * first Smirnov term 2·exp(−2·ne·D²) on the ROUNDED D, so both
    * engines feed libm the identical input. */
  def a34KsTest(spark: SparkSession, dir: String): DataFrame =
    ksTest(Tables.events(spark, dir))

  private[graft] def ksTest(events: DataFrame): DataFrame =
    ksTestFromUsers(userValueCents(events))

  private[graft] def ksTestFromUsers(usersIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = usersIn.withColumn("arm", armCol)
      .withColumn("bin", expr("cents div 100"))
    val hist = users.groupBy(col("bin")).agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val g = hist
      .withColumn("cum_a", sum(col("na")).over(wCum))
      .withColumn("cum_b", sum(col("nb")).over(wCum))
      .withColumn("n_a", sum(col("na")).over(wAll))
      .withColumn("n_b", sum(col("nb")).over(wAll))
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .as("dnum"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
    val d = round(col("dnum").cast("double") / (col("n_a") * col("n_b")), 4)
    g.select(col("n_a"), col("n_b"), d.as("d_stat"))
      .withColumn("ne", col("n_a").cast("double") * col("n_b")
        / (col("n_a") + col("n_b")))
      .select(col("n_a"), col("n_b"), col("d_stat"),
        round(least(lit(1.0), lit(2.0) *
          exp(lit(-2.0) * col("ne") * col("d_stat") * col("d_stat"))), 4)
          .as("p_value"))
      .withColumn("significant", col("p_value") < 0.05)
  }

  /** A35 — CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    * 2013): the experiment readout that uses PRE-experiment behaviour
    * to shrink the variance of the revenue metric. The corpus day span
    * splits in half — the first half is the covariate window (X =
    * per-user pre-period purchase cents), the second the experiment
    * window (Y = post-period cents); Y_cuped = Y − θ·(X − X̄) with
    * θ = cov(X,Y)/var(X) estimated POOLED across arms (unbiased under
    * randomization — the paper's own recommendation), and the card
    * reads the raw and adjusted two-sample z side by side plus the
    * realized variance-reduction fraction ρ²: on a metric where
    * pre-period spend predicts post-period spend, the same experiment
    * needs (1−ρ²)× the users for the same power — the planted spec's
    * whole point is one corpus that reads NOT significant raw and
    * clearly significant adjusted.
    *
    * Scale + determinism shape: ONE per-user conditional-sum aggregate
    * (two exact-cents additive monoids — the live fold's state,
    * [[graft.streaming.CupedFold]]); users bin to whole currency units
    * per axis (the a33/d29 bounded-grid device — the registered
    * statistic is the BINNED CUPED) and every distributed moment is an
    * exact-integer sum over the (arm, xbin, ybin) histogram, so
    * aggregation order cannot drift a bit (long-safe to bin·√n ~ 3e9;
    * past that the second moments move to DECIMAL(38,0)). Floats
    * appear only in the final ONE-ROW scalar θ/z/ρ² expressions,
    * parenthesized identically to the DuckDB oracle, with θ rounded
    * to 6 dp BEFORE reuse so both engines adjust by the identical
    * scalar. Arm split = the SAME IdHash assignment every experiment
    * readout rides ([[armCol]]). */
  def a35Cuped(spark: SparkSession, dir: String): DataFrame =
    cuped(Tables.events(spark, dir))

  private[graft] def cuped(events: DataFrame): DataFrame = {
    // deterministic pre/post boundary: the midpoint of the corpus day
    // span (a real deployment passes the experiment start date — the
    // fold does exactly that)
    val span = idMidpoint(events, expr("unix_timestamp(ts) div 86400"))
    cupedFromUsers(userPrePostCents(
      events.crossJoin(broadcast(span)), col("split")))
  }

  /** The corpus reduction behind a35: per-user (pre, post) purchase
    * cents around the split day — two additive monoids, the fold's
    * state. `split` is a joined column (batch) or a literal (the
    * fold's fixed experiment start). */
  private[graft] def userPrePostCents(events: DataFrame,
                                      split: Column): DataFrame =
    events
      .withColumn("day", expr("unix_timestamp(ts) div 86400"))
      .groupBy(col("user_id")).agg(
        sum(when(col("event_type") === "purchase" && col("day") < split,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("pre_cents"),
        sum(when(col("event_type") === "purchase" && col("day") >= split,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("post_cents"))

  private[graft] def cupedFromUsers(usersIn: DataFrame): DataFrame = {
    val users = usersIn.withColumn("arm", armCol)
      .withColumn("xb", expr("pre_cents div 100"))
      .withColumn("yb", expr("post_cents div 100"))
    // bounded by the currency grid², never user-sized
    val hist = users.groupBy(col("arm"), col("xb"), col("yb"))
      .agg(count(lit(1)).as("c"))
    def s(a: String, e: Column) =
      sum(when(col("arm") === a, e).otherwise(0L))
    val g = hist.agg(
      s("A", col("c")).as("n_a"), s("B", col("c")).as("n_b"),
      s("A", col("c") * col("xb")).as("sx_a"),
      s("A", col("c") * col("yb")).as("sy_a"),
      s("B", col("c") * col("xb")).as("sx_b"),
      s("B", col("c") * col("yb")).as("sy_b"),
      s("A", col("c") * col("xb") * col("xb")).as("sxx_a"),
      s("A", col("c") * col("xb") * col("yb")).as("sxy_a"),
      s("A", col("c") * col("yb") * col("yb")).as("syy_a"),
      s("B", col("c") * col("xb") * col("xb")).as("sxx_b"),
      s("B", col("c") * col("xb") * col("yb")).as("sxy_b"),
      s("B", col("c") * col("yb") * col("yb")).as("syy_b"))
    // ONE-ROW scalar math from here down; every sum above is exact
    // integer, so both engines start from identical inputs
    val m = g
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("sx", col("sx_a") + col("sx_b"))
      .withColumn("sy", col("sy_a") + col("sy_b"))
      .withColumn("covn", col("n").cast("double")
        * (col("sxy_a") + col("sxy_b"))
        - col("sx").cast("double") * col("sy"))
      .withColumn("varxn", col("n").cast("double")
        * (col("sxx_a") + col("sxx_b"))
        - col("sx").cast("double") * col("sx"))
      .withColumn("varyn", col("n").cast("double")
        * (col("syy_a") + col("syy_b"))
        - col("sy").cast("double") * col("sy"))
      .withColumn("theta", when(col("varxn") > 0.0,
        round(col("covn") / col("varxn"), 6)))
      .withColumn("var_reduction",
        when(col("varxn") > 0.0 && col("varyn") > 0.0,
          round(col("covn") * col("covn")
            / (col("varxn") * col("varyn")), 4)))
      // a covariate with no variance degrades CUPED to the raw test
      .withColumn("th", coalesce(col("theta"), lit(0.0)))
    val v = m
      .withColumn("mx_a",
        col("sx_a").cast("double") / expr("nullif(n_a, 0)"))
      .withColumn("my_a",
        col("sy_a").cast("double") / expr("nullif(n_a, 0)"))
      .withColumn("mx_b",
        col("sx_b").cast("double") / expr("nullif(n_b, 0)"))
      .withColumn("my_b",
        col("sy_b").cast("double") / expr("nullif(n_b, 0)"))
      .withColumn("mxp", col("sx").cast("double") / expr("nullif(n, 0)"))
      .withColumn("adj_a",
        col("my_a") - col("th") * (col("mx_a") - col("mxp")))
      .withColumn("adj_b",
        col("my_b") - col("th") * (col("mx_b") - col("mxp")))
      .withColumn("vy_a", col("syy_a").cast("double")
        / expr("nullif(n_a, 0)") - col("my_a") * col("my_a"))
      .withColumn("vy_b", col("syy_b").cast("double")
        / expr("nullif(n_b, 0)") - col("my_b") * col("my_b"))
      .withColumn("va_a",
        (col("syy_a") - lit(2.0) * col("th") * col("sxy_a")
          + col("th") * col("th") * col("sxx_a"))
          / expr("nullif(n_a, 0)")
          - (col("my_a") - col("th") * col("mx_a"))
          * (col("my_a") - col("th") * col("mx_a")))
      .withColumn("va_b",
        (col("syy_b") - lit(2.0) * col("th") * col("sxy_b")
          + col("th") * col("th") * col("sxx_b"))
          / expr("nullif(n_b, 0)")
          - (col("my_b") - col("th") * col("mx_b"))
          * (col("my_b") - col("th") * col("mx_b")))
      .withColumn("se_raw",
        sqrt(col("vy_a") / col("n_a") + col("vy_b") / col("n_b")))
      .withColumn("se_cuped",
        sqrt(col("va_a") / col("n_a") + col("va_b") / col("n_b")))
    v.select(col("n_a"), col("n_b"), col("theta"), col("var_reduction"),
      round(col("my_a") - col("my_b"), 4).as("diff_raw"),
      round(col("adj_a") - col("adj_b"), 4).as("diff_cuped"),
      when(col("se_raw") > 0.0,
        round((col("my_a") - col("my_b")) / col("se_raw"), 4))
        .as("z_raw"),
      when(col("se_cuped") > 0.0,
        round((col("adj_a") - col("adj_b")) / col("se_cuped"), 4))
        .as("z_cuped"))
      .withColumn("sig_raw",
        abs(coalesce(col("z_raw"), lit(0.0))) > 1.96)
      .withColumn("sig_cuped",
        abs(coalesce(col("z_cuped"), lit(0.0))) > 1.96)
  }

  /** A36 — the multi-metric experiment panel with Benjamini–Hochberg
    * FDR control (Benjamini & Hochberg 1995): one two-sample z per
    * metric (per-user event counts, one metric per event type) and the
    * step-up correction across the panel at q = 0.05. This is the
    * multiple-comparisons discipline every experiment platform applies
    * (Kohavi et al., "Trustworthy Online Controlled Experiments"): a
    * dashboard reading m metrics at naive p < 0.05 false-positives on
    * ~m/20 of them per experiment — the planted spec's corpus has a
    * metric that is "significant" naively and correctly NOT after BH.
    *
    * The two-sided p comes from the Abramowitz–Stegun 7.1.26 erfc
    * polynomial (max error 1.5e-7 — far below the q-threshold scale),
    * evaluated on the ROUNDED z so both engines feed libm identical
    * inputs; the panel frame is |event_types|-sized, so the BH sort
    * and step-up cummax are label-space windows, never corpus-sized
    * (the a18 boundedness argument). Per-user counts and per-(metric,
    * arm) moment sums are exact integers — no binning needed, the
    * metric IS a count. NULL-variance metrics carry NULL z/p and sit
    * outside the BH family (m counts only testable metrics). */
  def a36BhPanel(spark: SparkSession, dir: String): DataFrame =
    bhPanel(Tables.events(spark, dir))

  private[graft] def bhPanel(events: DataFrame): DataFrame = {
    // per-user per-metric counts (additive monoid — the fold's state)
    val uc = userMetricCounts(events)
    bhPanelFromCounts(uc)
  }

  /** The corpus reduction behind a36: per-(user, event_type) event
    * counts — an additive monoid, the fold's state. */
  private[graft] def userMetricCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))

  /** Two-sided normal tail 2·(1−Φ(|z|)) = erfc(|z|/√2) via the
    * Abramowitz–Stegun 7.1.26 polynomial — both engines carry the
    * same five constants and the same parenthesization, so the
    * scalar is engine-replayable. Input must already be rounded. */
  private[graft] def normTwoSided(z: Column): Column = {
    val x = abs(z) / sqrt(lit(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736)
      + t * (lit(1.421413741) + t * (lit(-1.453152027)
      + t * lit(1.061405429)))))
    round(poly * exp(-(x * x)), 6)
  }

  /** A39 — difference-in-differences: the experiment readout for a
    * NON-randomized rollout, where arms differ before treatment and a
    * raw post-period compare would credit pre-existing gaps to the
    * change. DiD subtracts each arm's own pre-period baseline — the
    * estimator is the mean of per-user (post − pre) deltas, compared
    * across arms — so any time-invariant arm difference cancels by
    * construction (the parallel-trends assumption is the price, which
    * is why the card prints both arm deltas, not just their gap).
    * Completes the experiment console: a27 compares conversion, a35
    * adjusts variance with a covariate, a39 handles the biased-split
    * case both assume away.
    *
    * Scale + determinism shape: the corpus reduces through a35's OWN
    * per-user exact-cents reduction ([[userPrePostCents]] — shared
    * state, so a39 and a35 cannot disagree on membership or split
    * day); deltas and both moments are exact longs; the z/p chain is
    * one-row scalar math off the single aggregate (A&S 7.1.26 via
    * [[normTwoSided]], pinned against table values). Zero pooled
    * variance → NULL z/p, not a division artifact. Streaming twin:
    * [[graft.streaming.CupedFold.serveDid]] replays this kernel off
    * a35's fold state — a fourth readout funded by an existing
    * reduction, the a34/a37/a38 shared-state discipline. */
  def a39Did(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val span = idMidpoint(events, expr("unix_timestamp(ts) div 86400"))
    didFromUsers(userPrePostCents(
      events.crossJoin(broadcast(span)), col("split")))
  }

  private[graft] def didFromUsers(users: DataFrame): DataFrame = {
    def s(a: String, e: Column) =
      sum(when(col("arm") === a, e).otherwise(0L))
    val g = users.withColumn("arm", armCol)
      .withColumn("delta", col("post_cents") - col("pre_cents"))
      .agg(
        s("A", lit(1L)).as("n_a"), s("B", lit(1L)).as("n_b"),
        s("A", col("delta")).as("sd_a"), s("B", col("delta")).as("sd_b"),
        s("A", col("delta") * col("delta")).as("sdd_a"),
        s("B", col("delta") * col("delta")).as("sdd_b"))
    g
      .withColumn("ma", col("sd_a").cast("double") / expr("nullif(n_a, 0)"))
      .withColumn("mb", col("sd_b").cast("double") / expr("nullif(n_b, 0)"))
      .withColumn("va", col("sdd_a").cast("double") / expr("nullif(n_a, 0)")
        - col("ma") * col("ma"))
      .withColumn("vb", col("sdd_b").cast("double") / expr("nullif(n_b, 0)")
        - col("mb") * col("mb"))
      .withColumn("se", sqrt(col("va") / col("n_a") + col("vb") / col("n_b")))
      .withColumn("z", when(col("se") > 0.0,
        round((col("mb") - col("ma")) / col("se"), 4)))
      .withColumn("p_value", normTwoSided(col("z")))
      .select(col("n_a"), col("n_b"),
        round(col("ma"), 4).as("mean_delta_a"),
        round(col("mb"), 4).as("mean_delta_b"),
        round(col("mb") - col("ma"), 4).as("did_cents"),
        col("z"), col("p_value"),
        coalesce(col("p_value") < 0.05, lit(false)).as("significant"))
  }

  /** A40 — winsorized / trimmed means: heavy-tail-robust location
    * estimates per event type. A single whale purchase can move a raw
    * mean by more than a real treatment effect; production metric
    * pipelines winsorize (clamp to the [p1, p99] band) or trim (drop
    * outside it) before any comparison. The card prints raw, both
    * robust variants, and the clamp bounds — the analyst sees exactly
    * what the tails were doing.
    *
    * Scale + determinism: values enter as exact cents; the bounds are
    * a14's exact-interpolation percentiles ROUNDED TO WHOLE CENTS
    * (HALF_UP, both engines) before any row touches them, so the
    * clamp/trim sums are pure integer arithmetic — aggregation order
    * cannot drift a tail. Two passes over the corpus (bounds, then
    * clamped sums) with the |types|-row bounds frame broadcast back;
    * an order statistic is not map-side-mergeable, which is also why
    * this card is batch-only by design (a streaming robust mean rides
    * a18's quantile-fold grid instead). Value-domain assumption
    * (r15 verdict): Spark's exact `percentile` buffer is a
    * distinct-value count map — mergeable, memory O(distinct cents)
    * per event type, fine on a price-like grid; a value domain with
    * unbounded distinct cents should derive bounds from a18's
    * fixed-width grid (or d29's histogram threshold) instead. */
  def a40WinsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
    val bounds = cents.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("c")).as("sc"),
      round(expr("percentile(c, 0.01D)")).cast("long").as("lo_cents"),
      round(expr("percentile(c, 0.99D)")).cast("long").as("hi_cents"))
    cents.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        first(col("n")).as("n"),
        first(col("sc")).as("sc"),
        first(col("lo_cents")).as("lo_cents"),
        first(col("hi_cents")).as("hi_cents"),
        sum(least(greatest(col("c"), col("lo_cents")), col("hi_cents")))
          .as("wsum"),
        sum(when(col("c").between(col("lo_cents"), col("hi_cents")),
          col("c")).otherwise(0L)).as("tsum"),
        sum(when(col("c").between(col("lo_cents"), col("hi_cents")), 1L)
          .otherwise(0L)).as("n_kept"))
      .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
        round(col("sc").cast("double") / (col("n") * 100.0), 4)
          .as("raw_mean"),
        round(col("wsum").cast("double") / (col("n") * 100.0), 4)
          .as("winsorized_mean"),
        round(col("tsum").cast("double") / (col("n_kept") * 100.0), 4)
          .as("trimmed_mean"),
        col("n_kept"))
      .orderBy(col("event_type"))
  }

  /** A41 — Benford first-digit audit: the classic fabricated-data /
    * broken-pipeline detector. Organically-generated positive amounts
    * spread across magnitudes follow P(d) = log10(1 + 1/d); a data
    * drop that truncated a magnitude band, a default value flooding
    * one digit, or synthetic padding all bend the distribution, and
    * the chi-square against Benford prices the bend in one number.
    * The card is an AUDIT — a corpus that genuinely isn't Benford
    * (narrow price bands) reports large chi2 honestly, which is why
    * per-digit observed/expected rows ride beside the statistic.
    *
    * Scale + determinism: one map-side-combinable count per digit (9
    * rows); the first significant digit comes from the CENTS long's
    * leading character (×100 shifts the decimal point, never the
    * leading digit — no float log in the extraction path); expected
    * shares and chi2 are scalar math over the 9-row frame, rounds(4).
    * Streaming twin: [[graft.streaming.BenfordFold]] folds the digit
    * counts (a 9-long additive monoid) and serves this same kernel. */
  def a41Benford(spark: SparkSession, dir: String): DataFrame =
    benfordFromCounts(benfordDigitCounts(Tables.events(spark, dir)))

  /** The corpus reduction: purchase-cents first-digit counts — the
    * fold's whole state (≤9 rows). */
  private[graft] def benfordDigitCounts(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0L)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))

  private[graft] def benfordFromCounts(countsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1))
    val spark = countsIn.sparkSession
    import spark.implicits._
    // all 9 digits always present (a digit with zero observations is
    // evidence, not a missing row)
    val digits = (1 to 9).toDF("digit")
    val counts = digits.join(countsIn, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
    counts
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("share", round(col("n").cast("double") / col("total"), 4))
      .withColumn("benford",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4))
      .withColumn("exp_n",
        col("total") * log10(lit(1.0) + lit(1.0) / col("digit")))
      .withColumn("chi2_term",
        (col("n") - col("exp_n")) * (col("n") - col("exp_n"))
          / col("exp_n"))
      .withColumn("chi2_total", round(sum(col("chi2_term")).over(w), 4))
      .select(col("digit"), col("n"), col("share"), col("benford"),
        col("chi2_total"))
      .orderBy(col("digit"))
  }

  /** A42 — source-concentration card (HHI): per language, how
    * concentrated is the corpus across sources? The
    * Herfindahl–Hirschman index (Σ share²) is the standard one-number
    * answer; a training-data pipeline reads it before sampling —
    * a lang whose HHI ≈ 1 is effectively single-source (its "diversity"
    * is an illusion d43's temperature mix cannot fix), and the top
    * source's share says who dominates. Map-side-combinable counts per
    * (lang, source) — a frame bounded by the label-space product, never
    * corpus-sized; shares and HHI are exact-count ratios rounded(4);
    * the top source breaks count ties toward the LEXICALLY FIRST name
    * so the card is rerun-stable. */
  def a42HhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cs = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang"))
    val ranked = cs
      .withColumn("n_docs", sum(col("c")).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("c").desc, col("source").asc)))
    ranked
      .groupBy(col("lang"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(when(col("rk") === 1, col("source"))).as("top_source"),
        max(when(col("rk") === 1, col("c"))).as("top_n"),
        sum(col("c") * col("c")).as("sum_sq"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        col("top_source"),
        round(col("top_n").cast("double") / col("n_docs"), 4)
          .as("top_share"),
        round(col("sum_sq").cast("double")
          / (col("n_docs") * col("n_docs")), 4).as("hhi"))
      .orderBy(col("lang"))
  }

  /** A43 — bootstrap confidence interval for the mean: the experiment
    * console's first RESAMPLING readout (a33–a42 are all closed-form;
    * a heavy-tailed metric whose normal-theory interval lies needs the
    * percentile bootstrap, which is what metric platforms actually
    * ship for revenue-like quantities). Per event type: B = [[A43Reps]]
    * bootstrap replicas, each reweighting every event by a
    * DETERMINISTIC Poisson(1)-approximation draw — w ∈ 0..5 from
    * [[graft.functions.IdHash]] over (event_id·B + b), thresholds
    * [[A43WeightCuts]] on a 10000 grid matching the Poisson pmf to 4
    * decimals — so both engines (and every rerun) draw the SAME
    * replicas: the classic multinomial bootstrap's Poissonization,
    * exactly the approximation used to bootstrap on MapReduce at
    * scale, made reproducible instead of sampled.
    *
    * Scale + determinism: the explode is a ×B map-side fan-out whose
    * per-(type, replica) weighted cent sums combine map-side — the
    * only shuffle is |types|·B groups, and the replica-mean frame the
    * percentiles read is |types|·B rows, never corpus-sized. All
    * replica sums are exact integers; each replica mean is ONE double
    * division; the CI is the a14 exact-interpolation percentile over
    * ≤B such doubles, rounds(4). Replicas that drew total weight 0
    * drop (P ≈ 0.37^n — impossible at any real n, priced in the
    * spec's degenerate pins). Streaming twin:
    * [[graft.streaming.BootstrapFold]] folds this same reduction (a
    * |types|·B additive monoid) and serves this same card. */
  def a43BootstrapCi(spark: SparkSession, dir: String): DataFrame =
    bootstrapCiFromSums(
      bootstrapReplicaSums(Tables.events(spark, dir)),
      bootstrapRawSums(Tables.events(spark, dir)))

  private[graft] val A43Reps = 64
  /** P(w) for w=0..4 under Poisson(1), cumulative on a 10000 grid
    * (0.3679, 0.7358, 0.9197, 0.9810, 0.9963); the tail is w=5. ONE
    * definition feeds the Spark CASE and the DuckDB oracle text. */
  private[graft] val A43WeightCuts = Seq(3679, 7358, 9197, 9810, 9963)

  /** The corpus reduction both surfaces fold: per (event_type,
    * replica) exact weighted cent sums — |types|·B rows. */
  private[graft] def bootstrapReplicaSums(events: DataFrame): DataFrame = {
    val cuts = A43WeightCuts
    val w = cuts.zipWithIndex.foldRight(lit(cuts.size)) {
      case ((cut, i), rest) => when(col("h") < cut, i).otherwise(rest)
    }
    events.filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .select(col("event_type"), col("event_id"), col("c"),
        explode(sequence(lit(0), lit(A43Reps - 1))).as("b"))
      // wideBucket, not bucket (advisor r16): the % 100003
      // pre-reduction would cap the draw space at 100003 residues —
      // events 100003 ids apart would share their entire replica
      // weight sequence, structurally correlating replicas at corpora
      // ≳10^5 events per type. The wide mix lets the full 63-bit
      // (event_id·B + b) key participate, so the bootstrap stays
      // statistically valid at any corpus the id space can address.
      .withColumn("h", graft.functions.IdHash.wideBucket(
        col("event_id") * A43Reps + col("b"), 10000))
      .withColumn("w", w.cast("long"))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("c")).as("wc"), sum(col("w")).as("wn"))
  }

  /** The raw side of the card: per-type event count + exact cent sum
    * (the fold's second, 2-counter-per-type state). */
  private[graft] def bootstrapRawSums(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("long")
        .as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("sc"))

  private[graft] def bootstrapCiFromSums(sums: DataFrame,
                                         raw: DataFrame): DataFrame = {
    val means = sums.filter(col("wn") > 0L)
      .select(col("event_type"),
        (col("wc").cast("double") / col("wn") / 100.0).as("mean_b"))
    val ci = means.groupBy(col("event_type")).agg(
      round(expr("percentile(mean_b, 0.025D)"), 4).as("ci_lo"),
      round(expr("percentile(mean_b, 0.975D)"), 4).as("ci_hi"))
    raw.join(ci, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        round(col("sc").cast("double") / col("n_events") / 100.0, 4)
          .as("raw_mean"),
        col("ci_lo"), col("ci_hi"),
        round(col("ci_hi") - col("ci_lo"), 4).as("ci_width"))
      .orderBy(col("event_type"))
  }

  /** The shared per-metric statistics frame behind a36 AND a37: per-
    * (metric, arm) exact-integer moments over the per-user counts,
    * the distinct-user arm totals (zero-inflation: a user with no
    * events of a metric still counts in its denominator), and the
    * scalar mean/var/se/z/p chain — |event_types| rows. */
  private[graft] def panelStats(uc: DataFrame): DataFrame = {
    val withArm = uc.withColumn("arm", armCol)
    val armTotals = uc.select(col("user_id")).distinct()
      .withColumn("arm", armCol)
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
    val m = withArm.groupBy(col("event_type")).agg(
      sum(when(col("arm") === "A", col("c")).otherwise(0L)).as("s_a"),
      sum(when(col("arm") === "A", col("c") * col("c")).otherwise(0L))
        .as("s2_a"),
      sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("s_b"),
      sum(when(col("arm") === "B", col("c") * col("c")).otherwise(0L))
        .as("s2_b"))
      .crossJoin(broadcast(armTotals))
    m
      .withColumn("mean_a", col("s_a").cast("double")
        / expr("nullif(n_a, 0)"))
      .withColumn("mean_b", col("s_b").cast("double")
        / expr("nullif(n_b, 0)"))
      .withColumn("var_a", col("s2_a").cast("double")
        / expr("nullif(n_a, 0)") - col("mean_a") * col("mean_a"))
      .withColumn("var_b", col("s2_b").cast("double")
        / expr("nullif(n_b, 0)") - col("mean_b") * col("mean_b"))
      .withColumn("se",
        sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
      .withColumn("z", when(col("se") > 0.0,
        round((col("mean_a") - col("mean_b")) / col("se"), 4)))
      .withColumn("p", normTwoSided(col("z")))
  }

  private[graft] def bhPanelFromCounts(uc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = panelStats(uc)
    // the BH family = testable metrics only; windows run over the
    // |event_types|-sized panel
    // explicit null placement on BOTH window orders: Spark's asc
    // default is NULLS FIRST where DuckDB's is NULLS LAST — an
    // implicit order would shift every rank by the untestable-metric
    // count on one engine only
    val nTests = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val byP = Window.orderBy(
      col("p").asc_nulls_last, col("event_type").asc)
    val stepUp = Window.orderBy(
      col("p").desc_nulls_first, col("event_type").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = v
      .withColumn("m_tests",
        sum(when(col("p").isNotNull, 1L).otherwise(0L)).over(nTests))
      .withColumn("bh_rank",
        when(col("p").isNotNull, row_number().over(byP)))
      .withColumn("bh_threshold", when(col("p").isNotNull,
        round(col("bh_rank").cast("double") * lit(0.05)
          / col("m_tests"), 6)))
      // step-up: reject rank k iff ANY rank j ≥ k clears its threshold
      // (untestable metrics sort FIRST in the desc cummax, so they
      // inherit nothing and contribute nothing)
      .withColumn("sig_bh", when(col("p").isNotNull,
        max(when(col("p") <= col("bh_threshold"), 1).otherwise(0))
          .over(stepUp) === 1).otherwise(false))
    ranked.select(col("event_type").as("metric"), col("n_a"), col("n_b"),
      round(col("mean_a"), 4).as("mean_a"),
      round(col("mean_b"), 4).as("mean_b"),
      col("z"), col("p"), col("bh_rank"), col("bh_threshold"),
      (coalesce(col("p"), lit(1.0)) < 0.05).as("sig_naive"),
      col("sig_bh"))
      .orderBy(col("p").asc_nulls_last, col("metric"))
  }

  /** A37 — power / minimum-detectable-effect card: for every metric in
    * a36's panel, the absolute and relative effect the CURRENT sample
    * could reliably detect (α = 0.05 two-sided, power 0.8 — z-sum
    * 1.96 + 0.8416 = 2.8016), and the per-arm enrollment a 2% lift
    * would need. This is the question a team asks BEFORE the
    * experiment ("is this test even powered for the lift we expect?")
    * and the one a36's verdicts cannot answer after it ("was that
    * non-significant because there is no effect, or because we never
    * had the power to see one?"). MDE = z_sum·se at the observed
    * variances; required n per arm = z_sum²·(var_a+var_b)/Δ² at
    * Δ = 2% of the pooled mean (equal allocation).
    *
    * Shares [[panelStats]] with a36 verbatim — the two cards cannot
    * disagree on a variance — and the fold serves it off the SAME
    * per-(user, metric) count state
    * ([[graft.streaming.MetricPanelFold.serveMde]], the a34
    * shared-state pattern). All distributed sums are a36's exact
    * integers; the z-sum constants are literals in both engines. */
  def a37PowerMde(spark: SparkSession, dir: String): DataFrame =
    powerMde(Tables.events(spark, dir))

  private[graft] def powerMde(events: DataFrame): DataFrame =
    powerMdeFromCounts(userMetricCounts(events))

  private[graft] def powerMdeFromCounts(uc: DataFrame): DataFrame = {
    val v = panelStats(uc)
      .withColumn("mean_pool", (col("s_a") + col("s_b")).cast("double")
        / expr("nullif(n_a + n_b, 0)"))
      .withColumn("mde_abs",
        when(col("se") > 0.0, round(lit(2.8016) * col("se"), 4)))
      .withColumn("target", lit(0.02) * col("mean_pool"))
    v.select(col("event_type").as("metric"), col("n_a"), col("n_b"),
      round(col("mean_pool"), 4).as("mean_pool"),
      col("mde_abs"),
      when(col("mde_abs").isNotNull && col("mean_pool") > 0.0,
        round(col("mde_abs") * lit(100.0) / col("mean_pool"), 4))
        .as("mde_rel_pct"),
      when(col("target") > 0.0 &&
        (col("var_a") + col("var_b")) > 0.0,
        ceil(lit(2.8016) * lit(2.8016) * (col("var_a") + col("var_b"))
          / (col("target") * col("target"))).cast("long"))
        .as("n_per_arm_2pct"))
      .orderBy(col("metric"))
  }

  def a32SequentialAb(spark: SparkSession, dir: String): DataFrame =
    sequentialAb(Tables.events(spark, dir))

  private[graft] def sequentialAb(events: DataFrame): DataFrame =
    sequentialAbFromJourneys(userJourneys(events))

  /** The corpus reduction behind a32: per-user (enrollment day,
    * conversion day) — both min-monoids, so the frame merges across
    * micro-batches and is the fold's state shape. */
  private[graft] def userJourneys(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      min(expr("unix_timestamp(ts) div 86400")).as("enroll_day"),
      min(when(col("event_type") === "purchase",
        expr("unix_timestamp(ts) div 86400"))).as("conv_day"))

  /** The daily monitoring card over a caller-supplied journeys frame —
    * shared verbatim by batch and the fold's serve pass. */
  private[graft] def sequentialAbFromJourneys(j0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = j0.withColumn("arm", armCol).localCheckpoint(true)
    val enr = j.select(col("arm"), col("enroll_day").as("day"),
      lit(1L).as("e"), lit(0L).as("c"))
    val cnv = j.filter(col("conv_day").isNotNull)
      .select(col("arm"), col("conv_day").as("day"),
        lit(0L).as("e"), lit(1L).as("c"))
    val byDay = enr.unionByName(cnv).groupBy(col("day")).agg(
      sum(when(col("arm") === "A", col("e")).otherwise(0L)).as("e_a"),
      sum(when(col("arm") === "A", col("c")).otherwise(0L)).as("dc_a"),
      sum(when(col("arm") === "B", col("e")).otherwise(0L)).as("e_b"),
      sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("dc_b"))
    val upTo = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byDay
      .withColumn("n_a", sum(col("e_a")).over(upTo))
      .withColumn("c_a", sum(col("dc_a")).over(upTo))
      .withColumn("n_b", sum(col("e_b")).over(upTo))
      .withColumn("c_b", sum(col("dc_b")).over(upTo))
      .withColumn("n_final", sum(col("e_a") + col("e_b")).over(all))
      .withColumn("t",
        (col("n_a") + col("n_b")).cast("double") / col("n_final"))
      .withColumn("p_pool", when(col("n_a") > 0 && col("n_b") > 0,
        (col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b"))))
      .withColumn("se", when(col("p_pool").isNotNull,
        sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
      .withColumn("z", when(col("se").isNotNull && col("se") > 0.0,
        round((col("c_a").cast("double") / col("n_a") -
          col("c_b").cast("double") / col("n_b")) / col("se"), 4)))
      .withColumn("of_bound", round(lit(1.96) / sqrt(col("t")), 4))
      .select(col("day"), col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        col("z"), col("of_bound"),
        (abs(coalesce(col("z"), lit(0.0))) > 1.96).as("sig_naive"),
        (abs(coalesce(col("z"), lit(0.0))) > col("of_bound")).as("sig_of"))
      .orderBy(col("day"))
  }

  /** A38 — sample-ratio-mismatch (SRM) guard: per analysis day, does
    * the cumulative arm split still look like the 50/50 the assignment
    * promises? SRM is the experimentation literature's #1 trust check
    * (Fabijan et al. 2019; Kohavi's handbook makes it the first gate):
    * a redirect bug, a bot filter, or a logging drop that touches one
    * arm silently biases EVERY downstream readout, and the cure is to
    * refuse to read the dashboard at all. z = (n_a − n_b)/√n is the
    * 1-dof chi-square in disguise (χ² = z², and the chi-square tail at
    * 1 dof IS the two-sided normal tail — so [[normTwoSided]] serves a
    * third family), alarmed at the literature's p < 0.001 (an SRM
    * threshold looser than that pages teams weekly on noise; tighter
    * misses real bugs).
    *
    * Rides a32's [[userJourneys]] reduction VERBATIM — enrollment day
    * = first event day, the same min-monoid fold state — so the SRM
    * guard and the sequential monitor cannot disagree on who enrolled
    * when ([[graft.streaming.SeqAbStreamFold.serveSrm]] serves it live
    * off the same frame). Counts stay exact longs through the
    * day-bounded cumulative window; z rounds(4) feeds the polynomial
    * tail. */
  def a38SrmGuard(spark: SparkSession, dir: String): DataFrame =
    srmGuard(Tables.events(spark, dir))

  private[graft] def srmGuard(events: DataFrame): DataFrame =
    srmFromJourneys(userJourneys(events))

  private[graft] def srmFromJourneys(j0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = j0.withColumn("arm", armCol)
    val byDay = j.groupBy(col("enroll_day").as("day")).agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("e_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("e_b"))
    val upTo = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_a", sum(col("e_a")).over(upTo))
      .withColumn("n_b", sum(col("e_b")).over(upTo))
      .withColumn("z", round((col("n_a") - col("n_b")).cast("double")
        / sqrt((col("n_a") + col("n_b")).cast("double")), 4))
      .withColumn("p", normTwoSided(col("z")))
      .select(col("day"), col("n_a"), col("n_b"), col("z"), col("p"),
        (col("p") < 0.001).as("srm_alarm"))
      .orderBy(col("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a43_bootstrap_ci" -> a43BootstrapCi,
    "a44_approx_percentiles" -> a44ApproxPercentiles,
    "a39_did" -> a39Did,
    "a40_winsorized_mean" -> a40WinsorizedMean,
    "a41_benford" -> a41Benford,
    "a42_hhi_concentration" -> a42HhiConcentration,
    "a38_srm_guard" -> a38SrmGuard,
    "a37_power_mde" -> a37PowerMde,
    "a36_bh_panel" -> a36BhPanel,
    "a35_cuped" -> a35Cuped,
    "a34_ks_test" -> a34KsTest,
    "a33_mann_whitney" -> a33MannWhitney,
    "a32_sequential_ab" -> a32SequentialAb,
    "a31_path_mining" -> a31PathMining,
    "a30_attribution" -> a30Attribution,
    "a29_survival_curve" -> a29SurvivalCurve,
    "a28_rfm_segments" -> a28RfmSegments,
    "a27_ab_test" -> a27AbTest,
    "a26_seasonal_anomaly" -> a26SeasonalAnomaly,
    "a25_event_transitions" -> a25EventTransitions,
    "a24_cusum_changepoint" -> a24CusumChangepoint,
    "a23_rolling_anomaly" -> a23RollingAnomaly,
    "a22_active_users" -> a22ActiveUsers,
    "a21_trend_regression" -> a21TrendRegression,
    "a20_incremental_agg" -> a20IncrementalAgg,
    "a19_robust_outliers" -> a19RobustOutliers,
    "a18_equidepth_hist" -> a18EquidepthHist,
    "a1_location_stats" -> a1LocationStats,
    "a2_group_count_desc" -> a2GroupCountDesc,
    "a3_global_means" -> a3GlobalMeans,
    "a4_hourly_pattern" -> a4HourlyPattern,
    "a5_two_key_summary" -> a5TwoKeySummary,
    "a6_distinct_count" -> a6DistinctCount,
    "a7_total_count" -> a7TotalCount,
    "a8_column_means" -> a8ColumnMeans,
    "a9_value_counts" -> a9ValueCounts,
    "a10_minmax_range" -> a10MinMaxRange,
    "a11_histogram" -> a11Histogram,
    "a12_approx_distinct" -> a12ApproxDistinct,
    "a13_rollup" -> a13Rollup,
    "a14_percentiles" -> a14Percentiles,
    "a15_correlation" -> a15Correlation,
    "a16_cube" -> a16Cube,
    "a17_grouping_sets" -> a17GroupingSets
  )

  /** ONE definition of the AQI CASE bucket for every oracle that derives
    * it (a5/a16/a17) — a threshold edit cannot drift sibling oracles
    * apart (same device as Dedup.shingleCte). Mirrors
    * [[graft.functions.AirQuality.aqiCategory]]. */
  private val aqiCaseSql =
    """CASE WHEN value <= 12 THEN 'Good'
      |       WHEN value <= 35 THEN 'Moderate'
      |       WHEN value <= 55 THEN 'Unhealthy for Sensitive Groups'
      |       WHEN value <= 150 THEN 'Unhealthy'
      |       WHEN value <= 250 THEN 'Very Unhealthy'
      |       ELSE 'Hazardous' END""".stripMargin

  /** Shared a16/a17 oracle shape — only the GROUP BY clause differs,
    * matching [[subtotalSummary]] on the Spark side. */
  private def subtotalOracle(groupBy: String): String =
    s"""WITH e AS (
      |  SELECT event_type, $aqiCaseSql AS aqi_category, value
      |  FROM events)
      |SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(aqi_category, 'ALL') AS aqi_category,
      |  count(*) AS n, round(avg(value), 2) AS avg_value
      |FROM e GROUP BY $groupBy
      |ORDER BY event_type, aqi_category""".stripMargin

  val oracle: Map[String, String] = Map(
    // a43: the deterministic Poisson-weight draw is IdHash over
    // (event_id·B + b) with ONE shared cut grid (A43WeightCuts) — the
    // Spark CASE and this text both interpolate it, so the replicas
    // cannot drift. Exact integer replica sums; one double division
    // per replica mean; quantile_cont = Spark's exact-interpolation
    // percentile over the B-row frame.
    "a43_bootstrap_ci" ->
      (s"""WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |x AS (
        |  SELECT event_type, c, i AS b,
        |    ${graft.functions.IdHash.wideSql(s"event_id * $A43Reps + i", 10000)}
        |      AS h
        |  FROM e CROSS JOIN (SELECT unnest(range(0, $A43Reps)) AS i)),
        |wt AS (
        |  SELECT event_type, b, c,
        |    CASE ${A43WeightCuts.zipWithIndex.map { case (cut, i) =>
              s"WHEN h < $cut THEN $i" }.mkString(" ")}
        |         ELSE ${A43WeightCuts.size} END AS w
        |  FROM x),
        |r AS (
        |  SELECT event_type, b,
        |    CAST(sum(w * c) AS BIGINT) AS wc,
        |    CAST(sum(w) AS BIGINT) AS wn
        |  FROM wt GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(wc AS DOUBLE) / wn / 100.0 AS mean_b
        |  FROM r WHERE wn > 0),
        |base AS (
        |  SELECT event_type, count(*) AS n_events,
        |    round(CAST(sum(c) AS DOUBLE) / count(*) / 100.0, 4)
        |      AS raw_mean
        |  FROM e GROUP BY 1),
        |ci AS (
        |  SELECT event_type,
        |    round(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
        |    round(quantile_cont(mean_b, 0.975), 4) AS ci_hi
        |  FROM m GROUP BY 1)
        |SELECT base.event_type, n_events, raw_mean, ci_lo, ci_hi,
        |  round(ci_hi - ci_lo, 4) AS ci_width
        |FROM base JOIN ci USING (event_type)
        |ORDER BY base.event_type""".stripMargin),
    // a39 rides a35's sp/u CTEs verbatim (ONE per-user pre/post
    // reduction for the whole experiment console), then exact-long
    // delta moments, the guarded z, and the shared A&S tail
    "a39_did" ->
      (s"""WITH sp AS (
        |  SELECT (min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
        |        + max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 1) // 2
        |    AS split FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |        < (SELECT split FROM sp)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS pre_cents,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |        >= (SELECT split FROM sp)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS post_cents,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |d AS (SELECT arm, post_cents - pre_cents AS delta FROM u),
        |g AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN delta ELSE 0 END)
        |      AS BIGINT) AS sd_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN delta ELSE 0 END)
        |      AS BIGINT) AS sd_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN delta * delta ELSE 0 END)
        |      AS BIGINT) AS sdd_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN delta * delta ELSE 0 END)
        |      AS BIGINT) AS sdd_b
        |  FROM d),
        |m AS (
        |  SELECT *,
        |    CAST(sd_a AS DOUBLE) / nullif(n_a, 0) AS ma,
        |    CAST(sd_b AS DOUBLE) / nullif(n_b, 0) AS mb
        |  FROM g),
        |v AS (
        |  SELECT *,
        |    CAST(sdd_a AS DOUBLE) / nullif(n_a, 0) - ma * ma AS va,
        |    CAST(sdd_b AS DOUBLE) / nullif(n_b, 0) - mb * mb AS vb
        |  FROM m),
        |s AS (SELECT *, sqrt(va / n_a + vb / n_b) AS se FROM v),
        |zt AS (
        |  SELECT *, CASE WHEN se > 0.0
        |    THEN round((mb - ma) / se, 4) END AS z FROM s),
        |v5 AS (SELECT *, abs(z) / sqrt(2.0) AS x FROM zt),
        |v6 AS (SELECT *, 1.0 / (1.0 + 0.3275911 * x) AS t FROM v5),
        |v7 AS (
        |  SELECT *, round(t * (0.254829592 + t * (-0.284496736
        |    + t * (1.421413741 + t * (-1.453152027
        |    + t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |  FROM v6)
        |SELECT n_a, n_b, round(ma, 4) AS mean_delta_a,
        |  round(mb, 4) AS mean_delta_b, round(mb - ma, 4) AS did_cents,
        |  z, p_value, coalesce(p_value < 0.05, false) AS significant
        |FROM v7""").stripMargin,
    // a40: bounds = exact-interpolation percentiles rounded to WHOLE
    // cents before any row is clamped, so every sum is integer-exact
    "a40_winsorized_mean" ->
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(round(quantile_cont(c, 0.01)) AS BIGINT) AS lo_cents,
        |    CAST(round(quantile_cont(c, 0.99)) AS BIGINT) AS hi_cents
        |  FROM c GROUP BY event_type),
        |j AS (
        |  SELECT c.event_type, c.c, b.n, b.sc, b.lo_cents, b.hi_cents
        |  FROM c JOIN b USING (event_type))
        |SELECT event_type, n, lo_cents, hi_cents,
        |  round(CAST(sc AS DOUBLE) / (n * 100.0), 4) AS raw_mean,
        |  round(CAST(sum(least(greatest(c, lo_cents), hi_cents))
        |      AS DOUBLE) / (n * 100.0), 4) AS winsorized_mean,
        |  round(CAST(sum(CASE WHEN c BETWEEN lo_cents AND hi_cents
        |      THEN c ELSE 0 END) AS DOUBLE)
        |    / (sum(CASE WHEN c BETWEEN lo_cents AND hi_cents
        |        THEN 1 ELSE 0 END) * 100.0), 4) AS trimmed_mean,
        |  CAST(sum(CASE WHEN c BETWEEN lo_cents AND hi_cents
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM j GROUP BY event_type, n, sc, lo_cents, hi_cents
        |ORDER BY event_type""".stripMargin,
    // a41: the first significant digit comes off the cents long's
    // leading character (no float log in the extraction); the 9-row
    // ladder always complete via the digit spine
    "a41_benford" ->
      """WITH src AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT)
        |      AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM src WHERE cents > 0 GROUP BY 1),
        |alln AS (SELECT CAST(i AS INT) AS digit
        |         FROM generate_series(1, 9) t(i)),
        |c AS (
        |  SELECT alln.digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        |  FROM alln LEFT JOIN d USING (digit)),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |x AS (
        |  SELECT digit, n,
        |    round(CAST(n AS DOUBLE) / total, 4) AS share,
        |    round(log10(1.0 + 1.0 / digit), 4) AS benford,
        |    (n - total * log10(1.0 + 1.0 / digit))
        |      * (n - total * log10(1.0 + 1.0 / digit))
        |      / (total * log10(1.0 + 1.0 / digit)) AS chi2_term
        |  FROM c CROSS JOIN t)
        |SELECT digit, n, share, benford,
        |  round(sum(chi2_term) OVER (), 4) AS chi2_total
        |FROM x ORDER BY digit""".stripMargin,
    // a42: exact-count shares over the (lang × source) frame; count
    // ties break toward the lexically first source on both engines
    "a42_hhi_concentration" ->
      """WITH cs AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY lang, source),
        |r AS (
        |  SELECT lang, source, c,
        |    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n_docs,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, source ASC) AS rk
        |  FROM cs)
        |SELECT lang, n_docs, CAST(count(*) AS BIGINT) AS n_sources,
        |  max(CASE WHEN rk = 1 THEN source END) AS top_source,
        |  round(CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
        |    / n_docs, 4) AS top_share,
        |  round(CAST(sum(c * c) AS DOUBLE) / (n_docs * n_docs), 4)
        |    AS hhi
        |FROM r GROUP BY lang, n_docs ORDER BY lang""".stripMargin,
    // a30 replays the carry window with the same (ts, event_id) order
    // and row frame; counts/cents are exact longs, share one division
    "a30_attribution" ->
      """WITH seq AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events),
        |p AS (
        |  SELECT coalesce(touch, '(none)') AS channel,
        |    count(*) AS n_purchases,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM seq WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT channel, n_purchases, cents,
        |  round(CAST(n_purchases AS DOUBLE)
        |    / sum(n_purchases) OVER (), 4) AS share
        |FROM p ORDER BY channel""".stripMargin,
    // a29 replays the product limit as exp(running sum of ln terms)
    // ordered by day — same fold order, same guard flag as the Spark
    // side, so the float tail is bit-identical
    "a29_survival_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS first_day,
        |    max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day
        |  FROM events GROUP BY user_id),
        |an AS (SELECT max(last_day) AS anchor_day FROM pu),
        |u AS (
        |  SELECT last_day - first_day AS lifetime,
        |    last_day >= anchor_day - 7 AS censored
        |  FROM pu CROSS JOIN an),
        |byday AS (
        |  SELECT lifetime AS day, count(*) AS exits,
        |    CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
        |      AS deaths,
        |    CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
        |      AS censored_exits
        |  FROM u GROUP BY lifetime),
        |tot AS (SELECT count(*) AS n_total FROM u),
        |risk AS (
        |  SELECT *,
        |    n_total - coalesce(sum(exits) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS at_risk
        |  FROM byday CROSS JOIN tot),
        |surv AS (
        |  SELECT *,
        |    max(CASE WHEN deaths = at_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS died_out,
        |    sum(CASE WHEN deaths < at_risk
        |        THEN ln(1.0 - CAST(deaths AS DOUBLE) / at_risk)
        |        ELSE 0.0 END)
        |      OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS log_surv
        |  FROM risk)
        |SELECT day, CAST(at_risk AS BIGINT) AS at_risk, deaths,
        |  censored_exits,
        |  CASE WHEN died_out = 1 THEN 0.0
        |       ELSE round(exp(log_surv), 4) END AS survival
        |FROM surv ORDER BY day""".stripMargin,
    // a27 replays the IdHash arm split and the pooled z with the SAME
    // parenthesization (identical IEEE op order on both engines)
    "a27_ab_test" ->
      (s"""WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |ar AS (
        |  SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS c
        |  FROM u GROUP BY arm),
        |aa AS (SELECT n AS n_a, c AS c_a FROM ar WHERE arm = 'A'),
        |bb AS (SELECT n AS n_b, c AS c_b FROM ar WHERE arm = 'B'),
        |s AS (
        |  SELECT *, CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |    AS p_pool
        |  FROM aa CROSS JOIN bb),
        |s2 AS (
        |  SELECT *, sqrt(p_pool * (1.0 - p_pool)
        |    * (1.0 / n_a + 1.0 / n_b)) AS se
        |  FROM s)
        |SELECT n_a, c_a, round(CAST(c_a AS DOUBLE) / n_a, 4) AS rate_a,
        |  n_b, c_b, round(CAST(c_b AS DOUBLE) / n_b, 4) AS rate_b,
        |  CASE WHEN se = 0.0 THEN NULL
        |       ELSE round((CAST(c_a AS DOUBLE) / n_a
        |                   - CAST(c_b AS DOUBLE) / n_b) / se, 4)
        |  END AS z,
        |  abs(coalesce(CASE WHEN se = 0.0 THEN NULL
        |       ELSE round((CAST(c_a AS DOUBLE) / n_a
        |                   - CAST(c_b AS DOUBLE) / n_b) / se, 4)
        |  END, 0.0)) > 1.96 AS significant
        |FROM s2""").stripMargin,
    "a28_rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day,
        |    count(*) AS freq,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS cents
        |  FROM events GROUP BY user_id),
        |an AS (SELECT max(last_day) AS anchor_day FROM pu),
        |scored AS (
        |  SELECT anchor_day - last_day AS recency_d, freq, cents,
        |    CASE WHEN anchor_day - last_day <= 1 THEN 3
        |         WHEN anchor_day - last_day <= 7 THEN 2 ELSE 1 END AS r,
        |    CASE WHEN freq >= 50 THEN 3
        |         WHEN freq >= 20 THEN 2 ELSE 1 END AS f,
        |    CASE WHEN cents >= 5000 THEN 3
        |         WHEN cents >= 1000 THEN 2 ELSE 1 END AS m
        |  FROM pu CROSS JOIN an)
        |SELECT 'R' || r || 'F' || f || 'M' || m AS segment,
        |  count(*) AS n_users,
        |  round(avg(recency_d), 2) AS avg_recency_d,
        |  round(avg(freq), 2) AS avg_freq,
        |  CAST(sum(cents) AS BIGINT) AS cents_total
        |FROM scored GROUP BY segment ORDER BY segment""".stripMargin,
    "a26_seasonal_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hod, value
        |  FROM events),
        |prof AS (
        |  SELECT event_type, hod, count(*) AS n,
        |    round(avg(value), 6) AS mu,
        |    round(stddev_samp(value), 6) AS sd
        |  FROM h GROUP BY event_type, hod),
        |scored AS (
        |  SELECT h.event_type, h.hod, prof.mu, prof.sd,
        |    round((h.value - prof.mu) / prof.sd, 4) AS z
        |  FROM h JOIN prof USING (event_type, hod) WHERE prof.sd > 0)
        |SELECT event_type, hod, count(*) AS n,
        |  round(any_value(mu), 4) AS mu,
        |  round(any_value(sd), 4) AS sd,
        |  CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  round(max(abs(z)), 4) AS max_abs_z
        |FROM scored GROUP BY event_type, hod
        |ORDER BY event_type, hod""".stripMargin,
    "a24_cusum_changepoint" ->
      """WITH st AS (
        |  SELECT event_type, round(avg(value), 6) AS mu,
        |    round(stddev_samp(value), 6) AS sd
        |  FROM events GROUP BY event_type),
        |x AS (
        |  SELECT e.event_type, e.event_id,
        |    round((e.value - st.mu) / st.sd, 6) AS x
        |  FROM events e JOIN st USING (event_type) WHERE st.sd > 0),
        |p AS (
        |  SELECT event_type, event_id,
        |    sum(x - 0.5) OVER w AS p_hi,
        |    sum(-x - 0.5) OVER w AS p_lo
        |  FROM x
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT event_type, event_id,
        |    round(p_hi - least(0.0, min(p_hi) OVER w), 4) AS s_hi,
        |    round(p_lo - least(0.0, min(p_lo) OVER w), 4) AS s_lo
        |  FROM p
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, count(*) AS n,
        |  round(max(s_hi), 4) AS max_s_hi,
        |  round(max(s_lo), 4) AS max_s_lo,
        |  CAST(sum(CASE WHEN s_hi > 4.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi_alarms,
        |  CAST(sum(CASE WHEN s_lo > 4.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo_alarms,
        |  min(CASE WHEN s_hi > 4.0 THEN event_id END) AS first_hi_alarm_id,
        |  min(CASE WHEN s_lo > 4.0 THEN event_id END) AS first_lo_alarm_id
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    // a34 replays a33's cents/binning reduction and the integer
    // ECDF-gap numerator; the rounded D feeds libm's exp identically
    // on both engines
    "a34_ks_test" ->
      (s"""WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS cents,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |h AS (
        |  SELECT cents // 100 AS bin,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb
        |  FROM u GROUP BY 1),
        |r AS (
        |  SELECT *,
        |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum_a,
        |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum_b,
        |    sum(na) OVER () AS n_a, sum(nb) OVER () AS n_b
        |  FROM h),
        |g AS (
        |  SELECT CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT)
        |      AS dnum,
        |    CAST(max(n_a) AS BIGINT) AS n_a,
        |    CAST(max(n_b) AS BIGINT) AS n_b
        |  FROM r),
        |s AS (
        |  SELECT n_a, n_b,
        |    round(CAST(dnum AS DOUBLE) / (n_a * n_b), 4) AS d_stat,
        |    CAST(n_a AS DOUBLE) * n_b / (n_a + n_b) AS ne
        |  FROM g)
        |SELECT n_a, n_b, d_stat,
        |  round(least(1.0, 2.0 * exp(-2.0 * ne * d_stat * d_stat)), 4)
        |    AS p_value,
        |  round(least(1.0, 2.0 * exp(-2.0 * ne * d_stat * d_stat)), 4)
        |    < 0.05 AS significant
        |FROM s""").stripMargin,
    // a38 replays a32's journeys reduction, the day-cumulative counts,
    // the (n_a − n_b)/√n z, and the shared A&S tail on the rounded z
    "a38_srm_guard" ->
      (s"""WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm,
        |    min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS enroll_day
        |  FROM events GROUP BY user_id),
        |bd AS (
        |  SELECT enroll_day AS day,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS e_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS e_b
        |  FROM u GROUP BY enroll_day),
        |cum AS (
        |  SELECT day,
        |    CAST(sum(e_a) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(e_b) OVER w AS BIGINT) AS n_b
        |  FROM bd
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |zz AS (
        |  SELECT *, round(CAST(n_a - n_b AS DOUBLE)
        |    / sqrt(CAST(n_a + n_b AS DOUBLE)), 4) AS z
        |  FROM cum),
        |v5 AS (SELECT *, abs(z) / sqrt(2.0) AS x FROM zz),
        |v6 AS (SELECT *, 1.0 / (1.0 + 0.3275911 * x) AS t FROM v5),
        |v7 AS (
        |  SELECT *, round(t * (0.254829592 + t * (-0.284496736
        |    + t * (1.421413741 + t * (-1.453152027
        |    + t * 1.061405429)))) * exp(-(x * x)), 6) AS p
        |  FROM v6)
        |SELECT day, n_a, n_b, z, p, p < 0.001 AS srm_alarm
        |FROM v7 ORDER BY day""").stripMargin,
    // a37 replays a36's moment chain verbatim, then the MDE/power
    // arithmetic (z-sum constants CAST to DOUBLE before multiplying —
    // a decimal-exact square then one conversion could sit an ulp off
    // Spark's double×double product)
    "a37_power_mde" ->
      (s"""WITH uc AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type),
        |at AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM (SELECT user_id,
        |      CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |           THEN 'A' ELSE 'B' END AS arm
        |    FROM (SELECT DISTINCT user_id FROM uc))),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * c ELSE 0 END)
        |      AS BIGINT) AS s2_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT)
        |      AS s_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * c ELSE 0 END)
        |      AS BIGINT) AS s2_b
        |  FROM (SELECT *,
        |      CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |           THEN 'A' ELSE 'B' END AS arm FROM uc)
        |  GROUP BY event_type),
        |mm AS (SELECT m.*, at.n_a, at.n_b FROM m CROSS JOIN at),
        |v1 AS (
        |  SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(n_a, 0) AS mean_a,
        |    CAST(s_b AS DOUBLE) / nullif(n_b, 0) AS mean_b
        |  FROM mm),
        |v2 AS (
        |  SELECT *,
        |    CAST(s2_a AS DOUBLE) / nullif(n_a, 0) - mean_a * mean_a
        |      AS var_a,
        |    CAST(s2_b AS DOUBLE) / nullif(n_b, 0) - mean_b * mean_b
        |      AS var_b
        |  FROM v1),
        |v3 AS (SELECT *, sqrt(var_a / n_a + var_b / n_b) AS se FROM v2),
        |v4 AS (
        |  SELECT *,
        |    CAST(s_a + s_b AS DOUBLE) / nullif(n_a + n_b, 0)
        |      AS mean_pool,
        |    CASE WHEN se > 0.0
        |         THEN round(CAST(2.8016 AS DOUBLE) * se, 4) END
        |      AS mde_abs
        |  FROM v3),
        |v5 AS (
        |  SELECT *, CAST(0.02 AS DOUBLE) * mean_pool AS target FROM v4)
        |SELECT event_type AS metric, n_a, n_b,
        |  round(mean_pool, 4) AS mean_pool, mde_abs,
        |  CASE WHEN mde_abs IS NOT NULL AND mean_pool > 0.0
        |       THEN round(mde_abs * 100.0 / mean_pool, 4) END
        |    AS mde_rel_pct,
        |  CASE WHEN target > 0.0 AND (var_a + var_b) > 0.0
        |       THEN CAST(ceil(CAST(2.8016 AS DOUBLE) * 2.8016
        |         * (var_a + var_b) / (target * target)) AS BIGINT) END
        |    AS n_per_arm_2pct
        |FROM v5 ORDER BY metric""").stripMargin,
    // a36 replays the per-(user, metric) counts, the distinct-user arm
    // totals, the integer moments, the A&S 7.1.26 erfc polynomial on
    // the rounded z, and the BH rank/step-up windows with EXPLICIT
    // null placement (Spark asc defaults NULLS FIRST, DuckDB LAST)
    "a36_bh_panel" ->
      (s"""WITH uc AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type),
        |at AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM (SELECT user_id,
        |      CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |           THEN 'A' ELSE 'B' END AS arm
        |    FROM (SELECT DISTINCT user_id FROM uc))),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * c ELSE 0 END)
        |      AS BIGINT) AS s2_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT)
        |      AS s_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * c ELSE 0 END)
        |      AS BIGINT) AS s2_b
        |  FROM (SELECT *,
        |      CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |           THEN 'A' ELSE 'B' END AS arm FROM uc)
        |  GROUP BY event_type),
        |mm AS (SELECT m.*, at.n_a, at.n_b FROM m CROSS JOIN at),
        |v1 AS (
        |  SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(n_a, 0) AS mean_a,
        |    CAST(s_b AS DOUBLE) / nullif(n_b, 0) AS mean_b
        |  FROM mm),
        |v2 AS (
        |  SELECT *,
        |    CAST(s2_a AS DOUBLE) / nullif(n_a, 0) - mean_a * mean_a
        |      AS var_a,
        |    CAST(s2_b AS DOUBLE) / nullif(n_b, 0) - mean_b * mean_b
        |      AS var_b
        |  FROM v1),
        |v3 AS (SELECT *, sqrt(var_a / n_a + var_b / n_b) AS se FROM v2),
        |v4 AS (
        |  SELECT *, CASE WHEN se > 0.0
        |    THEN round((mean_a - mean_b) / se, 4) END AS z
        |  FROM v3),
        |v5 AS (SELECT *, abs(z) / sqrt(2.0) AS x FROM v4),
        |v6 AS (SELECT *, 1.0 / (1.0 + 0.3275911 * x) AS t FROM v5),
        |v7 AS (
        |  SELECT *, round(t * (0.254829592 + t * (-0.284496736
        |    + t * (1.421413741 + t * (-1.453152027
        |    + t * 1.061405429)))) * exp(-(x * x)), 6) AS p
        |  FROM v6),
        |r AS (
        |  SELECT *,
        |    CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) OVER ()
        |      AS BIGINT) AS m_tests,
        |    CASE WHEN p IS NOT NULL THEN CAST(row_number() OVER (
        |      ORDER BY p ASC NULLS LAST, event_type ASC) AS INT) END
        |      AS bh_rank
        |  FROM v7),
        |r2 AS (
        |  SELECT *, CASE WHEN p IS NOT NULL
        |    THEN round(CAST(bh_rank AS DOUBLE) * 0.05 / m_tests, 6) END
        |    AS bh_threshold
        |  FROM r),
        |r3 AS (
        |  SELECT *, CASE WHEN p IS NOT NULL THEN
        |      max(CASE WHEN p <= bh_threshold THEN 1 ELSE 0 END) OVER (
        |        ORDER BY p DESC NULLS FIRST, event_type DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |    ELSE FALSE END AS sig_bh
        |  FROM r2)
        |SELECT event_type AS metric, n_a, n_b,
        |  round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b,
        |  z, p, bh_rank, bh_threshold,
        |  coalesce(p, 1.0) < 0.05 AS sig_naive, sig_bh
        |FROM r3 ORDER BY p ASC NULLS LAST, metric""").stripMargin,
    // a35 replays the midpoint split, the exact-cents pre/post
    // reduction, the whole-unit 2-D binning, and the exact-integer
    // moment sums; floats appear only in the one-row scalar θ/z/ρ²
    // chain, parenthesized identically to the Spark column tree, with
    // θ rounded to 6 dp before reuse on both engines
    "a35_cuped" ->
      (s"""WITH sp AS (
        |  SELECT (min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
        |        + max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 1) // 2
        |    AS split FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |        < (SELECT split FROM sp)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS pre_cents,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |        >= (SELECT split FROM sp)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS post_cents,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |h AS (
        |  SELECT arm, pre_cents // 100 AS xb, post_cents // 100 AS yb,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM u GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * xb ELSE 0 END)
        |      AS BIGINT) AS sx_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * yb ELSE 0 END)
        |      AS BIGINT) AS sy_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * xb ELSE 0 END)
        |      AS BIGINT) AS sx_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * yb ELSE 0 END)
        |      AS BIGINT) AS sy_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * xb * xb ELSE 0 END)
        |      AS BIGINT) AS sxx_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * xb * yb ELSE 0 END)
        |      AS BIGINT) AS sxy_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN c * yb * yb ELSE 0 END)
        |      AS BIGINT) AS syy_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * xb * xb ELSE 0 END)
        |      AS BIGINT) AS sxx_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * xb * yb ELSE 0 END)
        |      AS BIGINT) AS sxy_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN c * yb * yb ELSE 0 END)
        |      AS BIGINT) AS syy_b
        |  FROM h),
        |g2 AS (
        |  SELECT *, n_a + n_b AS n, sx_a + sx_b AS sx, sy_a + sy_b AS sy
        |  FROM g),
        |m AS (
        |  SELECT *,
        |    CAST(n AS DOUBLE) * (sxy_a + sxy_b)
        |      - CAST(sx AS DOUBLE) * sy AS covn,
        |    CAST(n AS DOUBLE) * (sxx_a + sxx_b)
        |      - CAST(sx AS DOUBLE) * sx AS varxn,
        |    CAST(n AS DOUBLE) * (syy_a + syy_b)
        |      - CAST(sy AS DOUBLE) * sy AS varyn
        |  FROM g2),
        |m2 AS (
        |  SELECT *,
        |    CASE WHEN varxn > 0.0 THEN round(covn / varxn, 6) END
        |      AS theta,
        |    CASE WHEN varxn > 0.0 AND varyn > 0.0
        |         THEN round(covn * covn / (varxn * varyn), 4) END
        |      AS var_reduction
        |  FROM m),
        |m3 AS (
        |  SELECT *, coalesce(theta, 0.0) AS th FROM m2),
        |v1 AS (
        |  SELECT *,
        |    CAST(sx_a AS DOUBLE) / nullif(n_a, 0) AS mx_a,
        |    CAST(sy_a AS DOUBLE) / nullif(n_a, 0) AS my_a,
        |    CAST(sx_b AS DOUBLE) / nullif(n_b, 0) AS mx_b,
        |    CAST(sy_b AS DOUBLE) / nullif(n_b, 0) AS my_b,
        |    CAST(sx AS DOUBLE) / nullif(n, 0) AS mxp
        |  FROM m3),
        |v2 AS (
        |  SELECT *,
        |    my_a - th * (mx_a - mxp) AS adj_a,
        |    my_b - th * (mx_b - mxp) AS adj_b,
        |    CAST(syy_a AS DOUBLE) / nullif(n_a, 0) - my_a * my_a AS vy_a,
        |    CAST(syy_b AS DOUBLE) / nullif(n_b, 0) - my_b * my_b AS vy_b,
        |    (syy_a - 2.0 * th * sxy_a + th * th * sxx_a) / nullif(n_a, 0)
        |      - (my_a - th * mx_a) * (my_a - th * mx_a) AS va_a,
        |    (syy_b - 2.0 * th * sxy_b + th * th * sxx_b) / nullif(n_b, 0)
        |      - (my_b - th * mx_b) * (my_b - th * mx_b) AS va_b
        |  FROM v1),
        |v3 AS (
        |  SELECT *,
        |    sqrt(vy_a / n_a + vy_b / n_b) AS se_raw,
        |    sqrt(va_a / n_a + va_b / n_b) AS se_cuped
        |  FROM v2),
        |f AS (
        |  SELECT n_a, n_b, theta, var_reduction,
        |    round(my_a - my_b, 4) AS diff_raw,
        |    round(adj_a - adj_b, 4) AS diff_cuped,
        |    CASE WHEN se_raw > 0.0
        |         THEN round((my_a - my_b) / se_raw, 4) END AS z_raw,
        |    CASE WHEN se_cuped > 0.0
        |         THEN round((adj_a - adj_b) / se_cuped, 4) END AS z_cuped
        |  FROM v3)
        |SELECT *,
        |  abs(coalesce(z_raw, 0.0)) > 1.96 AS sig_raw,
        |  abs(coalesce(z_cuped, 0.0)) > 1.96 AS sig_cuped
        |FROM f""").stripMargin,
    // a33 replays the IdHash arm split, the exact-cents reduction, the
    // whole-unit binning, and the half-unit (2·rank) integer rank
    // arithmetic; floats appear only in the final scalar z / effect
    // expressions, parenthesized identically to the Spark column tree
    "a33_mann_whitney" ->
      (s"""WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS cents,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |h AS (
        |  SELECT cents // 100 AS bin,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb
        |  FROM u GROUP BY 1),
        |r AS (
        |  SELECT *, na + nb AS t,
        |    coalesce(sum(na + nb) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM h),
        |g AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    CAST(sum(na * (2 * cumb + t + 1)) AS BIGINT) AS ra2,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
        |  FROM r),
        |s AS (
        |  SELECT n_a, n_b,
        |    round((ra2 - n_a * (n_a + 1)) / 2.0, 1) AS u_a, tie_sum,
        |    n_a * n_b / 2.0 AS mu,
        |    sqrt(n_a * n_b / 12.0 * (((n_a + n_b) + 1)
        |      - tie_sum / ((n_a + n_b) * ((n_a + n_b) - 1.0)))) AS sigma
        |  FROM g)
        |SELECT n_a, n_b, u_a,
        |  CASE WHEN sigma = 0.0 THEN NULL
        |       ELSE round((u_a - mu) / sigma, 4) END AS z,
        |  round(1.0 - 2.0 * u_a / (n_a * n_b), 4) AS effect_r,
        |  abs(coalesce(CASE WHEN sigma = 0.0 THEN NULL
        |       ELSE round((u_a - mu) / sigma, 4) END, 0.0)) > 1.96
        |    AS significant
        |FROM s""").stripMargin,
    "a32_sequential_ab" ->
      (s"""WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN ${graft.functions.IdHash.sql("user_id", 100)} < 50
        |         THEN 'A' ELSE 'B' END AS arm,
        |    min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS enroll_day,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END)
        |      AS conv_day
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT arm, enroll_day AS day, 1 AS e, 0 AS c FROM u
        |  UNION ALL
        |  SELECT arm, conv_day AS day, 0 AS e, 1 AS c FROM u
        |  WHERE conv_day IS NOT NULL),
        |bd AS (
        |  SELECT day,
        |    sum(CASE WHEN arm = 'A' THEN e ELSE 0 END) AS e_a,
        |    sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS dc_a,
        |    sum(CASE WHEN arm = 'B' THEN e ELSE 0 END) AS e_b,
        |    sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS dc_b
        |  FROM d GROUP BY day),
        |cum AS (
        |  SELECT day,
        |    sum(e_a) OVER w AS n_a, sum(dc_a) OVER w AS c_a,
        |    sum(e_b) OVER w AS n_b, sum(dc_b) OVER w AS c_b,
        |    sum(e_a + e_b) OVER () AS n_final
        |  FROM bd
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT *,
        |    CAST(n_a + n_b AS DOUBLE) / n_final AS t,
        |    CASE WHEN n_a > 0 AND n_b > 0
        |         THEN CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) END AS p_pool
        |  FROM cum),
        |s2 AS (
        |  SELECT *, CASE WHEN p_pool IS NOT NULL THEN
        |    sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)) END AS se
        |  FROM s),
        |s3 AS (
        |  SELECT day, n_a, c_a, n_b, c_b,
        |    CASE WHEN se IS NOT NULL AND se > 0.0 THEN
        |      round((CAST(c_a AS DOUBLE) / n_a
        |             - CAST(c_b AS DOUBLE) / n_b) / se, 4) END AS z,
        |    round(1.96 / sqrt(t), 4) AS of_bound
        |  FROM s2)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
        |  z, of_bound,
        |  abs(coalesce(z, 0.0)) > 1.96 AS sig_naive,
        |  abs(coalesce(z, 0.0)) > of_bound AS sig_of
        |FROM s3 ORDER BY day""").stripMargin,
    "a31_path_mining" ->
      """WITH seqd AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS p1,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS p2
        |  FROM events)
        |SELECT p2 AS step1, p1 AS step2, event_type AS step3,
        |  count(*) AS n_paths,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM seqd WHERE p2 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    "a25_event_transitions" ->
      """WITH seqd AS (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS prev_type
        |  FROM events),
        |pairs AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM seqd WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type)
        |SELECT prev_type, next_type, n,
        |  round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 4) AS p
        |FROM pairs ORDER BY prev_type, next_type""".stripMargin,
    "a23_rolling_anomaly" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |    avg(value) OVER w AS mu,
        |    stddev_samp(value) OVER w AS sd,
        |    count(value) OVER w AS n_base
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, round((value - mu) / sd, 4) AS z
        |  FROM s WHERE n_base >= 10 AND sd > 0)
        |SELECT event_type, count(*) AS n_scored,
        |  CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  round(max(abs(z)), 4) AS max_abs_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a22_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY d),
        |cover AS (
        |  SELECT DISTINCT
        |    CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
        |      CAST(d AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY))
        |      AS DATE) AS wd,
        |    user_id
        |  FROM du),
        |wau AS (SELECT wd, count(*) AS wau FROM cover GROUP BY wd)
        |SELECT strftime(d, '%Y-%m-%d') AS day, dau, wau,
        |  round(dau * 1.0 / wau, 4) AS stickiness
        |FROM dau JOIN wau ON d = wd ORDER BY day""".stripMargin,
    "a21_trend_regression" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |x0 AS (SELECT event_type, min(h) AS h0 FROM e GROUP BY event_type),
        |xy AS (SELECT e.event_type, e.h - x0.h0 AS x, e.y
        |       FROM e JOIN x0 USING (event_type)),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM xy GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS varx,
        |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vary,
        |    sx, sy
        |  FROM m)
        |SELECT event_type, n,
        |  CASE WHEN varx = 0 THEN NULL
        |       ELSE round(cov / varx / 100.0, 6) END AS slope_per_hour,
        |  CASE WHEN varx = 0 THEN NULL
        |       ELSE round((sy / 100.0 - cov / varx * sx / 100.0)
        |                  / CAST(n AS DOUBLE), 4) END AS intercept,
        |  CASE WHEN varx * vary = 0 THEN NULL
        |       ELSE round(cov * cov / (varx * vary), 6) END AS r2
        |FROM d ORDER BY event_type""".stripMargin,
    // a20's oracle IS the full recompute — the incremental merge is the
    // execution strategy, agg-over-everything is the checked claim
    // (merge(agg(A), agg(B)) = agg(A ∪ B) for algebraic aggregates)
    "a20_incremental_agg" ->
      """SELECT source, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "a19_robust_outliers" ->
      """WITH e AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, value, med, abs(value - med) AS dev
        |  FROM e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  round(max(med), 4) AS median,
        |  round(max(mad), 4) AS mad,
        |  CAST(sum(CASE WHEN dev > 3 * 1.4826 * mad THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "a18_equidepth_hist" ->
      """WITH binned AS (
        |  SELECT CAST(floor(l_extendedprice / 100) AS BIGINT) AS bin,
        |    l_extendedprice AS v
        |  FROM lineitem),
        |h AS (SELECT bin, count(*) AS c FROM binned GROUP BY bin),
        |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM binned),
        |bounds AS (
        |  SELECT i, min(bin) AS b
        |  FROM cum CROSS JOIN n
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS i)
        |  WHERE cum >= ceil(i * n / 8.0)
        |  GROUP BY i),
        |assigned AS (
        |  SELECT v,
        |    1 + (SELECT count(*) FROM bounds WHERE binned.bin > bounds.b)
        |      AS bucket
        |  FROM binned)
        |SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_rows,
        |  round(min(v), 2) AS min_v, round(max(v), 2) AS max_v,
        |  round(avg(v), 2) AS avg_v
        |FROM assigned GROUP BY bucket ORDER BY bucket""".stripMargin,
    "a1_location_stats" ->
      """SELECT event_type,
        |  round(avg(value), 2) AS avg_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value,
        |  count(*) AS reading_count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a2_group_count_desc" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type",
    "a3_global_means" ->
      """SELECT round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 2) AS avg_discount,
        |  round(avg(l_tax), 2) AS avg_tax,
        |  count(*) AS n FROM lineitem""".stripMargin,
    "a4_hourly_pattern" ->
      """SELECT CAST(hour(ts) AS INT) AS hour, count(*) AS n,
        |  round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "a5_two_key_summary" ->
      s"""SELECT event_type,
        |  $aqiCaseSql AS aqi_category,
        |  count(*) AS n, round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, aqi_category""".stripMargin,
    "a6_distinct_count" ->
      "SELECT count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) AS n_types FROM events",
    "a7_total_count" -> "SELECT count(*) AS n_rows FROM lineitem",
    "a8_column_means" ->
      """SELECT round(avg(value), 2) AS avg_value,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k
        |FROM events""".stripMargin,
    "a9_value_counts" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang",
    "a10_minmax_range" ->
      """SELECT round(max(value) - min(value), 2) AS value_range,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value FROM events""".stripMargin,
    "a11_histogram" ->
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a13_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "a14_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 2) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a16_cube" -> subtotalOracle("CUBE(event_type, aqi_category)"),
    "a17_grouping_sets" ->
      subtotalOracle("GROUPING SETS ((event_type), (aqi_category))"),
    "a15_correlation" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
