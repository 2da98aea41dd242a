package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join operators (SURVEY §2.3 J1-J6) over the star schema. Scale rules
  * applied throughout: dimension sides (region 5 rows, nation 25, part,
  * tier tables) are explicitly `broadcast()` so no shuffle of the fact side
  * ever happens for a dim lookup; the only shuffle joins are fact↔fact
  * (customer↔orders, events↔events) which hash-partition on the join key —
  * exactly what a 1000-executor cluster wants. AQE handles skew.
  */
object Joins {

  /** J1 — two-hop equi inner join fact↔dim↔dim with broadcast dims. */
  def j1InnerJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_balance"))
      .orderBy(col("r_name"))

  /** J2 — left outer join: every customer, with or without orders.
    * Orders pre-aggregate to one row per custkey BEFORE the join (map-side
    * partial agg shrinks the shuffle to |customers| rows), so the joined
    * frame has exactly one row per customer — the per-segment rollup then
    * needs plain count(*) instead of a countDistinct over the join product.
    * At 100 TB this turns an expand+distinct shuffle of the full join
    * output into two key-partitioned shuffles of pre-reduced rows. */
  def j2LeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("price"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(sum(coalesce(col("cnt"), lit(0L))).as("n_orders"),
        count(lit(1)).as("n_customers"),
        round(sum(coalesce(col("price"), lit(0.0))), 2).as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** J3a — left semi: nations having at least one customer (EXISTS). */
  def j3Semi(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.customer(spark, dir),
        col("n_nationkey") === col("c_nationkey"), "left_semi")
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"))

  /** J3b — left anti: customers that never ordered (NOT EXISTS), rolled up
    * per nation. */
  def j3Anti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_idle_customers"))
      .orderBy(col("c_nationkey"))

  /** J4 — explicit broadcast-hint join on the fact table's dim lookup:
    * 600k lineitem rows never shuffle; part ships to every executor. */
  def j4BroadcastHint(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  /** J5 — theta/range join against a tiny literal tier table: planned as
    * BroadcastNestedLoopJoin (the 4-row side broadcasts; the fact side
    * streams through without shuffling). */
  def j5RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("t1_small", 0.0, 50000.0),
      ("t2_medium", 50000.0, 150000.0),
      ("t3_large", 150000.0, 300000.0),
      ("t4_jumbo", 300000.0, 1e12)
    ).toDF("tier", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("tier"))
  }

  /** J6 — as-of join: for each purchase, the most recent click by the same
    * user at or before it. The scale-safe formulation is NOT a join: the
    * equi-join-with-`c_ts <= p_ts` plan materializes a per-user
    * |purchases|×|clicks| product before the group-by collapses it —
    * quadratic on a hot user (bot traffic: 10⁵ clicks × 10³ purchases =
    * 10⁸ intermediate rows pinned on ONE join key, which AQE skew
    * handling cannot split because the blow-up lives inside a single
    * key). Instead: union both event kinds into one tagged frame, one
    * per-user window sorted by (ts, kind) with clicks ordered BEFORE
    * purchases at ties (the as-of is inclusive), and a running
    * `last(click_ts, ignoreNulls)` over rows-unbounded-preceding. One
    * hash shuffle on user_id, one per-partition sort, O(n log n) per
    * user, zero intermediate product — the same discipline w6's
    * sessionization uses. Output is the all-integer per-user summary for
    * cross-engine determinism. */
  def j6AsOfJoin(spark: SparkSession, dir: String): DataFrame =
    asOfEnrich(Tables.events(spark, dir))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("last_click")).as("n_matched"),
        max(unix_timestamp(col("p_ts")) - unix_timestamp(col("last_click")))
          .as("max_gap_s"))
      .orderBy(col("user_id"))

  /** The as-of ENRICHMENT kernel behind [[j6AsOfJoin]]: one row per
    * purchase, carrying the most recent click at-or-before it by the
    * same user (`last_click` null when none precedes). Shared contract
    * with the streaming formulation
    * ([[graft.streaming.Windows.asOfEnrichStream]]) — StreamingSpec pins
    * stream ≡ this batch kernel on the same rows. Expects `events`
    * columns (user_id, ts, event_type). */
  def asOfEnrich(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1))
          .as("kind"),
        when(col("event_type") === "click", col("ts")).as("click_ts"))
    val asOf = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click", last(col("click_ts"), ignoreNulls = true)
        .over(asOf))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("ts").as("p_ts"), col("last_click"))
  }

  /** J15 — FORWARD as-of join: for each purchase, the EARLIEST click by
    * the same user STRICTLY after it — pandas merge_asof
    * direction='forward' / kdb's reverse aj, the mirror j6 doesn't
    * give: j6 answers "what led to this purchase", j15 answers "what
    * happened next" (post-purchase engagement, next-quote-after-trade,
    * time-to-next-interaction). Tie rule mirrors j6 exactly: a click at
    * the purchase's own timestamp belongs to the BACKWARD match (j6's
    * inclusive at-or-before), so forward is strictly-after — the two
    * queries partition tie clicks with no overlap and no gap.
    *
    * Same scale discipline as j6 — NOT a join: the equi-join-with-
    * range-predicate plan is quadratic on a hot user inside one
    * unsplittable key. One tagged union, one per-user window sorted by
    * (ts, kind) — clicks order before purchases at ties, so a
    * current-row-to-unbounded-FOLLOWING `first(click_ts, ignoreNulls)`
    * frame sees exactly the strictly-after clicks. One hash shuffle,
    * zero intermediate product. All-integer per-user summary. */
  def j15ForwardAsof(spark: SparkSession, dir: String): DataFrame =
    forwardAsOfEnrich(Tables.events(spark, dir))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("next_click")).as("n_matched"),
        max(unix_timestamp(col("next_click")) - unix_timestamp(col("p_ts")))
          .as("max_wait_s"))
      .orderBy(col("user_id"))

  /** The forward enrichment kernel behind [[j15ForwardAsof]]: one row
    * per purchase with the earliest strictly-after click (`next_click`
    * null when none follows). */
  private[graft] def forwardAsOfEnrich(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1))
          .as("kind"),
        when(col("event_type") === "click", col("ts")).as("click_ts"))
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("next_click", first(col("click_ts"), ignoreNulls = true)
        .over(fwd))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("ts").as("p_ts"), col("next_click"))
  }

  /** Numeric band self-join kernel: all (id_a < id_b) pairs whose values
    * lie within `delta` — the fact↔fact companion to J5's broadcast
    * tier join, where BOTH sides are corpus-scale and a nested-loop
    * range join would be the O(N²) plan that never finishes. The LSH
    * discipline applied to numbers: bin = floor(value/delta); one side
    * keys by its own bin, the other explodes to (bin−1, bin, bin+1), so
    * every within-delta pair shares an equi-join key NO MATTER which
    * side holds the lower id (a one-sided (bin, bin+1) explode silently
    * drops cross-boundary pairs whose lower-id row sits in the lower
    * bin — the id_a < id_b filter then kills the only surviving
    * direction); a pair can span at most one boundary, the exact
    * |a−b| ≤ delta verify runs on candidates only, and `distinct`
    * collapses the double-matched adjacent pairs. Shuffle carries
    * (id, value, bin) — three narrow columns. */
  def bandSelfJoin(df: DataFrame, idCol: String, valCol: String,
                   delta: Double): DataFrame = {
    require(delta > 0, s"delta must be > 0, got $delta")
    val slim = df.select(col(idCol).as("id"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("bin", floor(col("v") / delta).cast("long"))
    val l = slim.select(col("id").as("id_a"), col("v").as("v_a"), col("bin"))
    val r = slim.select(col("id").as("id_b"), col("v").as("v_b"),
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"))
    l.join(r, Seq("bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("v_a") - col("v_b")) <= delta)
      .select(col("id_a"), col("id_b"),
        round(abs(col("v_a") - col("v_b")), 2).as("diff"))
      .distinct()
  }

  /** J7 — registered band join: order pairs priced within one cent of
    * each other (the value-near-dup audit shape). The tiny delta keeps
    * the pair set oracle-sized; the PLAN is delta-independent. */
  def j7BandJoin(spark: SparkSession, dir: String): DataFrame =
    bandSelfJoin(Tables.orders(spark, dir), "o_orderkey", "o_totalprice",
      delta = 0.01)
      .orderBy(col("id_a"), col("id_b"))

  /** J12 — temporal interval self-join: which user pairs were active AT
    * THE SAME TIME, and for how long — the co-presence query (fraud
    * rings, shared-device detection, co-occurrence features), and the
    * interval-overlap JOIN beside w12's overlap COUNT. Sessions from
    * the same 30-min sessionizer as w6/w12.
    *
    * The naive predicate `a.start <= b.end AND b.start <= a.end` is a
    * theta-join — O(N²) pairs at any scale. The Spark-first shape is
    * the canonical bin trick: explode each interval into the hour bins
    * it covers, EQUI-join on bin (hash-shuffleable, AQE-splittable),
    * verify true overlap, and keep each session pair exactly once via
    * bin OWNERSHIP — only the bin containing the overlap's start
    * (greatest of the two starts) reports the pair, so a pair sharing
    * five bins emits once, not five times. Bins-per-session is bounded
    * by duration/3600 (sessions are gap-bounded); a corpus with a hot
    * hour would salt within the bin, the j10 device. Overlap seconds
    * are inclusive-bound integers, engine-exact. */
  def j12IntervalJoin(spark: SparkSession, dir: String): DataFrame =
    intervalOverlapPairs(WindowFns.sessionSpans(spark, dir))

  /** The overlap kernel over caller-supplied (user_id, start_s, end_s)
    * spans — injectable so ownership dedup, self-pair exclusion, and
    * inclusive overlap arithmetic pin on planted intervals. The span
    * frame is eager-checkpointed: both join sides read the materialized
    * artifact instead of re-running the upstream lineage twice (the
    * w12/d35 device). */
  def intervalOverlapPairs(spans: DataFrame, topK: Int = 20): DataFrame =
    allOverlapPairs(spans)
      .orderBy(col("overlap_s").desc, col("user_a"), col("user_b"))
      .limit(topK)

  /** The un-truncated pair frame behind [[intervalOverlapPairs]] — the
    * co-presence EDGE LIST (g1's PageRank input). */
  def allOverlapPairs(spans: DataFrame): DataFrame = {
    val s = spans.select(col("user_id"), col("start_s"), col("end_s"))
      .localCheckpoint(true)
    def binned(side: String) = s.select(
        col("user_id").as(s"user_$side"),
        col("start_s").as(s"start_$side"), col("end_s").as(s"end_$side"))
      .withColumn("bin",
        explode(expr(s"sequence(start_$side div 3600, end_$side div 3600)")))
    binned("a").join(binned("b"), Seq("bin"))
      .filter(col("user_a") < col("user_b") &&
        col("start_a") <= col("end_b") && col("start_b") <= col("end_a") &&
        expr("greatest(start_a, start_b) div 3600") === col("bin"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("end_a"), col("end_b"))
          - greatest(col("start_a"), col("start_b")) + lit(1L))
          .as("overlap_s"))
  }

  /** J8 — flagship multi-way analytic query (TPC-H Q3's shipping-priority
    * shape): customer ⋈ orders ⋈ lineitem with a selective dimension
    * filter on each leg, grouped revenue, top-10. Every other join query
    * exercises one shape in isolation; this one proves the COMPOSITION —
    * filters pushed into all three scans, the two joins chained without
    * an intermediate materialization, partial aggregation above them,
    * and the limit+sort fused into TakeOrderedAndProject (never a global
    * sort of the aggregate).
    *
    * 100 TB shape: each leg is projected to its join/agg columns before
    * joining, so the scans are pruned (PlanSpec pins pushed filters).
    * The segment-filtered customer KEY list (1/5 of customers, one
    * bigint column) broadcasts into orders — the fact side never
    * shuffles for the dim probe; the surviving orders (date cut ×
    * segment semi ≈ a few % of the table, three narrow columns)
    * broadcast into lineitem. On a cluster where even the filtered
    * order side outgrows the broadcast threshold, dropping the hint
    * falls back to one hash shuffle on orderkey — the hint encodes the
    * Q3 selectivity argument, not a correctness requirement. */
  def j8ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val survivingOrders = o.join(broadcast(c),
      col("o_custkey") === col("c_custkey"))
    l.join(broadcast(survivingOrders), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Constants shared with the j9 oracle: the simulated stale-parent
    * gaps — orders missing ≡ J9OrdDrop (mod J9OrdMod) orphan their
    * lineitems, customers missing ≡ J9CustDrop (mod J9CustMod) orphan
    * their orders. */
  private[ext] val J9OrdMod = 1000
  private[ext] val J9OrdDrop = 7
  private[ext] val J9CustMod = 100
  private[ext] val J9CustDrop = 3

  /** J9 — referential-integrity orphan audit: child rows whose parent
    * key is absent (lineitem→orders, orders→customer) — the
    * constraint check a warehouse without enforced FKs runs after
    * every load, exercised here against deterministically-thinned
    * parents so the audit has something to find. Each relationship is
    * one LEFT ANTI equi-join: the child never carries more than its
    * key + grouping column into the shuffle, the anti join is
    * AQE-splittable on skew, and both legs report (n_child, n_orphans,
    * orphan id checksum) so the oracle proves WHICH rows are orphaned,
    * not just how many. At warehouse scale the parent side of an anti
    * join hash-builds per partition; store both tables bucketed by the
    * FK (writeBucketed) and the exchange disappears entirely. */
  def j9OrphanAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val thinnedOrders = orders
      .filter(col("o_orderkey") % J9OrdMod =!= J9OrdDrop)
      .select(col("o_orderkey"))
    val thinnedCust = Tables.customer(spark, dir)
      .filter(col("c_custkey") % J9CustMod =!= J9CustDrop)
      .select(col("c_custkey"))
    val liOrphans = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"))
      .join(thinnedOrders, col("l_orderkey") === col("o_orderkey"), "left_anti")
    val ordOrphans = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(thinnedCust, col("o_custkey") === col("c_custkey"), "left_anti")
    val liReport = Tables.lineitem(spark, dir)
      .agg(lit("lineitem->orders").as("relationship"),
        count(lit(1)).as("n_child"))
      .crossJoin(broadcast(liOrphans.agg(
        count(lit(1)).as("n_orphans"),
        coalesce(sum(col("l_orderkey")), lit(0L)).as("orphan_key_sum"))))
    val ordReport = orders
      .agg(lit("orders->customer").as("relationship"),
        count(lit(1)).as("n_child"))
      .crossJoin(broadcast(ordOrphans.agg(
        count(lit(1)).as("n_orphans"),
        coalesce(sum(col("o_orderkey")), lit(0L)).as("orphan_key_sum"))))
    liReport.unionByName(ordReport).orderBy(col("relationship"))
  }

  /** J10 — the skew-salted fact↔fact join as a REGISTERED query: the
    * j6-shaped events⋈orders-by-user equi-join routed through
    * [[ScaleJoins.saltedInnerJoin]] (hot user spread over 8 reducers,
    * small side replicated 8×) and aggregated per event type. Salting
    * is an execution strategy, not a semantics change — the oracle is
    * the PLAIN join replay, which is the whole point: the output
    * equality ScaleJoinsSpec asserts on planted frames gets
    * value-checked by DuckDB on the real corpus every round. Checksums
    * are exact integer sums so the hash compare has no float
    * tolerance. */
  def j10SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderkey"))
    ScaleJoins.saltedInnerJoin(ev, ord, "user_id", salts = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("user_id")).as("user_sum"),
        sum(col("o_orderkey") % lit(1000003L)).as("okey_mod_sum"))
      .orderBy(col("event_type"))
  }

  /** Memoized per (session, dir): the bucketed orders/customer table
    * NAMES for j11 (the bandIndexCache discipline — cache plain strings,
    * never a DataFrame, so the weak session key can actually collect). */
  private val bucketedCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, (String, String)]]()

  private[graft] def bucketedPairFor(spark: SparkSession,
                                     dir: String): (String, String) =
    Similarity.perSession(bucketedCache, spark).getOrElseUpdate(dir, {
      val tag = Similarity.dirTag(dir)
      val (o, c) = (s"j11ord_$tag", s"j11cust_$tag")
      graft.sources.Sources.writeBucketed(
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        8, "o_custkey", o)
      graft.sources.Sources.writeBucketed(
        Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
        8, "c_custkey", c)
      (o, c)
    })

  /** J11 — the bucketed CO-LOCATED join as a registered query: orders
    * and customer persisted bucketed by their join keys (ONCE per
    * (session, dir) — the d18 ingest/serve split), so the fact↔dim join
    * plans with ZERO shuffle Exchange on either input — the layout a
    * warehouse stores its conformed tables in precisely so every later
    * join starts co-located. Like j10, the layout is an execution
    * strategy: the oracle is the plain join replay over the original
    * parquet, value-checking bucketed-read equivalence every round;
    * the zero-input-Exchange property is pinned in PlanSpec. Checksums
    * are exact integers (prices at their native 2-dp grain ×100). */
  def j11BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (o, c) = bucketedPairFor(spark, dir)
    // MERGE hint: at real scale both sides are too big to broadcast and
    // SMJ over matched buckets is the whole point; without it the small
    // test dim rides a BroadcastHashJoin and the bucketed layout idles
    spark.table(o)
      .join(spark.table(c).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_custkey")).as("cust_sum"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** J13 — fuzzy (edit-distance) catalog lookup: match NOISY incoming
    * records against a clean master catalog — the entity-resolution
    * verb behind every dedup-across-sources pipeline (d5's n-gram
    * Jaccard handles near-dup DOCUMENTS; this is its short-string
    * sibling for keys/names, where Levenshtein is the right metric and
    * Jaccard over shingles is noise). The probe side is a deterministic
    * corruption of 5% of the catalog's own names (one character deleted
    * at an IdHash-chosen position ≥ 2 — engine-replayable arithmetic,
    * the d22 device), so ground truth is knowable: `recovered` marks
    * probes whose best match lands back on the original name.
    *
    * 100 TB shape (the r11 fix): the CATALOG never self-joins, and the
    * blocking-key space GROWS WITH THE CATALOG — the same `blocksFor`
    * discipline d4 applies to SimHash. The r10 first-char × length-band
    * key had CONSTANT cardinality (≈ a few hundred buckets however
    * large the catalog), so candidates per probe grew linearly and
    * total work was O(N²/k). The replacement is symmetric-delete
    * blocking (the SymSpell construction, Garbe 2012 — public
    * algorithm): index every catalog name under itself PLUS each of
    * its single-character-deletion variants; probe every dirty name
    * the same way. Two strings within Damerau-Levenshtein distance 1
    * PROVABLY share a variant (equal → identity; substitution /
    * transposition → delete the differing char(s) from both; single
    * insert/delete → one side's identity is the other's variant), so
    * with the residual `levenshtein ≤ 1` filter the candidate set is
    * EXACTLY the distance-≤1 pairs — blocking loses nothing. Key
    * cardinality ≈ catalog × (avg length + 1), i.e. it scales with N
    * and candidates per probe stay O(1) (pinned sublinear in
    * ScaleJoinsSpec). The shuffle carries an 8-byte xxhash64 of each
    * variant, never the variant strings themselves; hash collisions
    * are screened by the same residual predicate that defines the
    * match, so they cost a levenshtein call, not correctness. */
  def j13FuzzyLookup(spark: SparkSession, dir: String): DataFrame =
    fuzzyLookup(Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name")))

  /** `name` itself plus every single-character-deletion variant — the
    * SymSpell-1 blocking-key set (array column; callers explode). */
  private def deleteVariants(name: Column): Column =
    concat(array(name),
      transform(sequence(lit(1), length(name)),
        i => concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, length(name)))))

  /** Candidate pairs BEFORE best-match selection — exposed so
    * ScaleJoinsSpec can pin that candidates-per-probe is O(1) in the
    * catalog size (the property the r10 constant-cardinality key
    * violated). Distinct because two strings can share several
    * variants (e.g. equal strings share all of them).
    *
    * Broadcast contract (advisor r12): the probe side BROADCASTS, so
    * it must be a BOUNDED INCOMING BATCH — a lookup workload, not a
    * catalog fraction (the knnJoinDf boundedness contract). The
    * registered query derives its probes as a fixed 1/20 id-slice of
    * the catalog ONLY to make the benchmark self-contained and its
    * ground truth knowable; that slice grows with the catalog, so at
    * real scale a caller feeds the day's dirty-lookup batch here
    * instead, and the broadcast stays workload-sized while the
    * catalog-sized variant INDEX stays distributed, never collected. */
  private[graft] def fuzzyCandidates(catalog: DataFrame): DataFrame = {
    val probes = catalog
      .filter(graft.functions.IdHash.bucket(col("p_partkey"), 20) === 0)
      .withColumn("pos",
        (pmod(col("p_partkey"), length(col("p_name")).cast("long") - 1) + 2)
          .cast("int"))
      .select(col("p_partkey").as("probe_key"), col("p_name").as("src_name"),
        concat(expr("substring(p_name, 1, pos - 1)"),
          expr("substring(p_name, pos + 1)")).as("dirty_name"))
    val probeKeys = probes
      .select(col("probe_key"), col("src_name"), col("dirty_name"),
        explode(deleteVariants(col("dirty_name"))).as("variant"))
      .select(col("probe_key"), col("src_name"), col("dirty_name"),
        xxhash64(col("variant")).as("vh"))
    // NAME-level variant index: distinct names, each carrying its
    // minimal key. Equivalent to indexing every row — all rows of a
    // name share its edit distance, and the (dist, match_key) best-row
    // tiebreak picks exactly that name's min key — but the index is
    // |distinct names| × length entries, not |rows| × length, and the
    // candidate frame shrinks by the catalog's duplication factor (the
    // sf0.1 part table carries 64 distinct names over 20k rows: ~320
    // legitimate dist-≤1 row matches per probe collapse to ~2 name
    // matches). At 100 TB this dedup-first normalization is the same
    // win wherever SKUs/entities repeat across a master table.
    val names = catalog.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("match_key"))
    val catKeys = names
      .select(col("match_key"), col("p_name").as("match_name"),
        explode(deleteVariants(col("p_name"))).as("variant"))
      .select(col("match_key"), col("match_name"),
        xxhash64(col("variant")).as("vh"))
    broadcast(probeKeys)
      .join(catKeys, Seq("vh"))
      .filter(levenshtein(col("dirty_name"), col("match_name")) <= 1)
      .select(col("probe_key"), col("dirty_name"), col("src_name"),
        col("match_key"), col("match_name"),
        levenshtein(col("dirty_name"), col("match_name")).as("dist"))
      .distinct()
  }

  /** The month-partitioned orders table + its month-dim table, built
    * ONCE per (session, dir) — the j11 ingest/serve split applied to
    * PARTITION layout instead of bucket layout; the memo carries both
    * table names. */
  private val partitionedCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, (String, String)]]()
  private[graft] def partitionedOrdersFor(spark: SparkSession,
                                          dir: String): (String, String) =
    Similarity.perSession(partitionedCache, spark).getOrElseUpdate(dir, {
      val tag = Similarity.dirTag(dir)
      val (t, d) = (s"j14ord_$tag", s"j14dim_$tag")
      val withMonth = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .as("o_month"))
      graft.sources.Sources.writePartitionedTable(withMonth, "o_month", t)
      // The month DIM must be a real (file-backed) table: a driver-built
      // LocalRelation dim gets its filter constant-folded away by
      // ConvertToLocalRelation, and with no surviving Filter node on the
      // build side the PartitionPruning rule sees nothing selective to
      // prune WITH — verified live: the fact scan planned
      // isnotnull-only until the dim became a table.
      // `div`, not `/`: Spark's `/` is true division even on ints (a
      // Scala-intuition trap — (2-1)/3+1 = 1.33, and quarter === 1 then
      // matches ONLY January: caught by the full-sweep oracle as 7 rows
      // where Q1-of-7-years needs 21)
      val dim = spark.table(t).select(col("o_month")).distinct()
        .withColumn("quarter",
          (floor((col("o_month") % 100 - 1) / 3) + 1).cast("int"))
      graft.sources.Sources.writeTable(dim, d)
      (t, d)
    })

  /** J14 — dynamic-partition-pruned star join: the fact table persisted
    * partitioned by month (one directory per month — the conformed
    * layout every date-partitioned warehouse fact uses), joined against
    * a month DIMENSION filtered to Q1. The month predicate is NOT in
    * the query — it lives on the dim — so STATIC partition pruning
    * cannot apply; Catalyst's dynamic partition pruning turns the
    * filtered dim's build side into a runtime subquery on the fact's
    * partition column, and whole month directories are skipped before a
    * fact byte is read. At 100 TB this is THE mechanism that makes
    * "revenue for Q1" read 3/48 of a four-year fact table instead of
    * all of it, with the selector living in the dimension where the
    * business defines it. PlanSpec pins `dynamicpruningexpression` in
    * the fact scan's partition filters; the oracle is the plain-scan
    * replay over the original parquet (the j11 layout-equivalence
    * device), so the pruned read is value-checked every round. */
  def j14DppJoin(spark: SparkSession, dir: String): DataFrame = {
    val (fact, dim) = partitionedOrdersFor(spark, dir)
    spark.table(fact)
      .join(broadcast(spark.table(dim).filter(col("quarter") === 1)),
        Seq("o_month"))
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_custkey")).as("cust_sum"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents_sum"))
      .orderBy(col("o_month"))
  }

  /** The corruption + blocked-match kernel over a caller-supplied
    * (p_partkey, p_name) catalog — split out so recovery semantics
    * (hand-known deletions, blocking-guarantee recall, best-match
    * tiebreak) pin on planted rows in ScaleJoinsSpec, independent of
    * the oracle's shared-formula replay (the r10 w12 lesson). */
  private[graft] def fuzzyLookup(catalog: DataFrame): DataFrame = {
    val best = Window.partitionBy(col("probe_key"))
      .orderBy(col("dist"), col("match_key"))
    fuzzyCandidates(catalog)
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("probe_key"), col("dirty_name"), col("match_key"),
        col("match_name"), col("dist"),
        (col("match_name") === col("src_name")).as("recovered"))
      .orderBy(col("probe_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j14_dpp_join" -> j14DppJoin,
    "j15_forward_asof" -> j15ForwardAsof,
    "j13_fuzzy_lookup" -> j13FuzzyLookup,
    "j11_bucketed_join" -> j11BucketedJoin,
    "j10_salted_join" -> j10SaltedJoin,
    "j9_orphan_audit" -> j9OrphanAudit,
    "j7_band_join" -> j7BandJoin,
    "j1_inner_join" -> j1InnerJoin,
    "j2_left_outer" -> j2LeftOuter,
    "j3_semi" -> j3Semi,
    "j3_anti" -> j3Anti,
    "j4_broadcast_hint" -> j4BroadcastHint,
    "j5_range_join" -> j5RangeJoin,
    "j6_asof_join" -> j6AsOfJoin,
    "j8_shipping_priority" -> j8ShippingPriority,
    "j12_interval_join" -> j12IntervalJoin
  )

  val oracle: Map[String, String] = Map(
    // j15 mirrors the j6 oracle with the strictly-after rule (tie
    // clicks belong to j6's inclusive backward match) and min/earliest
    "j15_forward_asof" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_user, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |     m AS (SELECT p.user_id, p.p_id, p.p_ts, min(c.c_ts) AS next_click
        |           FROM p LEFT JOIN c
        |             ON p.user_id = c.c_user AND c.c_ts > p.p_ts
        |           GROUP BY 1, 2, 3)
        |SELECT user_id, count(*) AS n_purchases,
        |  count(next_click) AS n_matched,
        |  max(CAST(floor(epoch(next_click)) AS BIGINT)
        |      - CAST(floor(epoch(p_ts)) AS BIGINT)) AS max_wait_s
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    // j14's oracle is the PLAIN-SCAN replay over the original parquet —
    // the pruned partitioned layout must be value-equivalent to reading
    // everything and filtering (the j11 layout-equivalence device); the
    // Q1 rule is restated on the month arithmetic directly
    "j14_dpp_join" ->
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT)
        |    AS o_month,
        |  count(*) AS n_orders,
        |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders
        |WHERE month(o_orderdate) <= 3
        |GROUP BY 1 ORDER BY o_month""".stripMargin,
    // j13 replays the deterministic corruption (IdHash pick + substring
    // surgery) and the symmetric-delete blocking: both engines index
    // name + every 1-deletion variant, equi-join on the variant, and
    // apply the same `levenshtein <= 1` residual (DuckDB's levenshtein
    // is the same unit-cost edit distance as Spark's). The oracle joins
    // on the variant STRING where the engine joins on its xxhash64 —
    // identical candidate sets, because hash collisions are screened by
    // the shared residual predicate. DuckDB's range() accepts neither
    // lateral column bounds nor subqueries, so the variant explode runs
    // to a fixed 127 with a length filter — sound while names stay
    // under 128 chars (TPC-H p_name ≤ 55).
    "j13_fuzzy_lookup" ->
      (s"""WITH pr AS (
        |  SELECT p_partkey AS probe_key, p_name AS src_name,
        |    CAST((p_partkey % (length(p_name) - 1)) + 2 AS INT) AS pos
        |  FROM part
        |  WHERE ${graft.functions.IdHash.sql("p_partkey", 20)} = 0),
        |d AS (
        |  SELECT probe_key, src_name,
        |    substring(src_name, 1, pos - 1)
        |      || substring(src_name, pos + 1) AS dirty_name
        |  FROM pr),
        |pv AS (
        |  SELECT probe_key, src_name, dirty_name, dirty_name AS variant
        |  FROM d
        |  UNION ALL
        |  SELECT probe_key, src_name, dirty_name,
        |    substring(dirty_name, 1, CAST(t.i AS INT) - 1)
        |      || substring(dirty_name, CAST(t.i AS INT) + 1)
        |  FROM d CROSS JOIN range(1, 128) t(i)
        |  WHERE t.i <= length(dirty_name)),
        |cv AS (
        |  SELECT p_partkey AS match_key, p_name AS match_name,
        |    p_name AS variant
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, p_name,
        |    substring(p_name, 1, CAST(t.i AS INT) - 1)
        |      || substring(p_name, CAST(t.i AS INT) + 1)
        |  FROM part CROSS JOIN range(1, 128) t(i)
        |  WHERE t.i <= length(p_name)),
        |cand AS (
        |  SELECT DISTINCT pv.probe_key, pv.dirty_name, pv.src_name,
        |    cv.match_key, cv.match_name,
        |    CAST(levenshtein(pv.dirty_name, cv.match_name) AS INT) AS dist
        |  FROM pv JOIN cv ON pv.variant = cv.variant
        |  WHERE levenshtein(pv.dirty_name, cv.match_name) <= 1),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY probe_key
        |    ORDER BY dist, match_key) AS rn FROM cand)
        |SELECT probe_key, dirty_name, match_key, match_name, dist,
        |  match_name = src_name AS recovered
        |FROM best WHERE rn = 1 ORDER BY probe_key""").stripMargin,
    "j12_interval_join" ->
      (s"WITH ${WindowFns.SessionSpansCte},\n" +
      """p AS (
        |  SELECT a.user_id AS user_a, b.user_id AS user_b,
        |    least(a.end_s, b.end_s) - greatest(a.start_s, b.start_s) + 1
        |      AS ov
        |  FROM spans a JOIN spans b
        |    ON a.user_id < b.user_id
        |   AND a.start_s <= b.end_s AND b.start_s <= a.end_s)
        |SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  CAST(sum(ov) AS BIGINT) AS overlap_s
        |FROM p GROUP BY user_a, user_b
        |ORDER BY overlap_s DESC, user_a, user_b LIMIT 20""".stripMargin),
    "j11_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j10_salted_join" ->
      """SELECT event_type, count(*) AS n_pairs,
        |  CAST(sum(user_id) AS BIGINT) AS user_sum,
        |  CAST(sum(o_orderkey % 1000003) AS BIGINT) AS okey_mod_sum
        |FROM events e JOIN orders o ON e.user_id = o.o_custkey
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "j9_orphan_audit" ->
      s"""WITH li AS (
        |  SELECT count(*) AS n_orphans,
        |    coalesce(CAST(sum(l_orderkey) AS BIGINT), 0) AS orphan_key_sum
        |  FROM lineitem
        |  WHERE l_orderkey NOT IN (
        |    SELECT o_orderkey FROM orders
        |    WHERE o_orderkey % $J9OrdMod != $J9OrdDrop)),
        |od AS (
        |  SELECT count(*) AS n_orphans,
        |    coalesce(CAST(sum(o_orderkey) AS BIGINT), 0) AS orphan_key_sum
        |  FROM orders
        |  WHERE o_custkey NOT IN (
        |    SELECT c_custkey FROM customer
        |    WHERE c_custkey % $J9CustMod != $J9CustDrop))
        |SELECT 'lineitem->orders' AS relationship,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  n_orphans, orphan_key_sum FROM li
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders), n_orphans, orphan_key_sum FROM od
        |ORDER BY relationship""".stripMargin,
    "j7_band_join" ->
      """SELECT a.o_orderkey AS id_a, b.o_orderkey AS id_b,
        |  round(abs(a.o_totalprice - b.o_totalprice), 2) AS diff
        |FROM orders a JOIN orders b
        |  ON a.o_orderkey < b.o_orderkey
        | AND abs(a.o_totalprice - b.o_totalprice) <= 0.01
        |ORDER BY id_a, id_b""".stripMargin,
    "j1_inner_join" ->
      """SELECT r_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j2_left_outer" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  round(sum(coalesce(o_totalprice, 0)), 2) AS total_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j3_semi" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        |ORDER BY n_nationkey""".stripMargin,
    "j3_anti" ->
      """SELECT c_nationkey, count(*) AS n_idle_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "j4_broadcast_hint" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j5_range_join" ->
      """SELECT tier, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |JOIN (VALUES ('t1_small', 0.0, 50000.0),
        |             ('t2_medium', 50000.0, 150000.0),
        |             ('t3_large', 150000.0, 300000.0),
        |             ('t4_jumbo', 300000.0, 1e12)) AS tiers(tier, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "j8_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "j6_asof_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_user, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |     m AS (SELECT p.user_id, p.p_id, p.p_ts, max(c.c_ts) AS last_click
        |           FROM p LEFT JOIN c
        |             ON p.user_id = c.c_user AND c.c_ts <= p.p_ts
        |           GROUP BY 1, 2, 3)
        |SELECT user_id, count(*) AS n_purchases,
        |  count(last_click) AS n_matched,
        |  max(CAST(floor(epoch(p_ts)) AS BIGINT)
        |      - CAST(floor(epoch(last_click)) AS BIGINT)) AS max_gap_s
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
