package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regressions for the properties that decide 100 TB
  * viability: pushdown, pruning, broadcast, top-k pushdown, map-side
  * partial aggregation, whole-stage codegen. A refactor that silently
  * drops one of these still passes every value-correctness test — these
  * assertions are what catch it. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(FormattedMode)

  test("IN-list filter is pushed into the parquet scan") {
    val p = plan("p5_inlist_filter")
    assert(p.contains("PushedFilters: [") && p.contains("In("),
      s"no pushed IN filter in:\n$p")
  }

  test("projection prunes the scan to referenced columns only") {
    val p = plan("p3_projection")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    // events carries value/user_id etc.; a pruned scan must not read them all
    assert(readSchema.nonEmpty)
    assert(!readSchema.contains("user_id"), s"unpruned scan: $readSchema")
  }

  test("small-dimension joins broadcast instead of shuffling both sides") {
    assert(plan("j4_broadcast_hint").contains("BroadcastHashJoin"))
    assert(plan("j1_inner_join").contains("BroadcastHashJoin"))
  }

  test("top-N compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("o5_top_n").contains("TakeOrderedAndProject"))
    assert(plan("sim1_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("keyset page: cursor predicate reaches the scan; page is a fused top-k, no offset discard (o6)") {
    val p = plan("o6_keyset_page")
    // the whole point of keyset over OFFSET: the cursor comparison
    // prunes at the parquet scan and the page itself is per-partition
    // heaps — not a global sort producing-and-discarding 100 rows
    assert(p.contains("PushedFilters: [") &&
      (p.contains("GreaterThan(event_type") || p.contains("Or(")),
      s"cursor predicate not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no fused top-k:\n$p")
    assert(!p.contains("GlobalLimit 150"), "offset-style discard leaked")
  }

  test("aggregates run partial then final (map-side combine)") {
    val p = plan("a5_two_key_summary")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("the custom udaf Aggregator also runs as partial aggregation") {
    val p = plan("u1_welford_stats")
    assert(p.linesIterator.count(l =>
      l.contains("ObjectHashAggregate") || l.contains("SortAggregate")) >= 2,
      s"custom agg not partial:\n$p")
  }

  test("vocab top-k: partial combine bounds the token shuffle; top-k pushes down") {
    val p = plan("t5_vocab_topk")
    // partial + final HashAggregate: what shuffles is (token, count) per
    // partition — bounded by vocabulary, not corpus
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
    // LIMIT 30 over a sort must compile to TakeOrderedAndProject
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("grouping-set queries expand map-side into one aggregation pass") {
    for (name <- Seq("a16_cube", "a17_grouping_sets")) {
      val p = plan(name)
      assert(p.contains("Expand"), s"$name: no Expand in:\n$p")
      assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
        s"$name: no partial agg in:\n$p")
    }
  }

  /** SHUFFLE exchanges in the AQE-final plan (executedPlan prints the
    * final plan and then the initial one — count the final section only;
    * "BroadcastExchange " also contains the substring "Exchange ", so
    * broadcasts are excluded explicitly). */
  private def finalPlanShuffles(name: String): (Int, String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    (p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange")), p)
  }

  test("sessionization shares one hash shuffle across windows and aggregate") {
    // lag-window, running-sum window, and the (user_id, session_seq)
    // group-by must all reuse the single hash exchange on user_id (a
    // subset partitioning satisfies the aggregate's clustering); only
    // the final presentation orderBy may add a range exchange.
    val (exchanges, p) = finalPlanShuffles("w6_sessionize")
    assert(exchanges <= 2, s"expected hash + range exchange only, got $exchanges:\n$p")
  }

  test("decontamination broadcasts the benchmark grams (corpus never shuffles)") {
    // the eval-suite side is tiny by construction; the left-semi probe
    // must be a BroadcastHashJoin, not a sort-merge that shuffles the
    // full training gram explosion
    // both tokens must sit on the SAME operator line — d10 has a second
    // (tiny accounting) join that can broadcast on its own, which would
    // let independent substring checks pass after the semi-join itself
    // regressed to a corpus-shuffling sort-merge
    val p = plan("d10_decontaminate")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"benchmark-gram probe is not a broadcast semi-join:\n$p")
  }

  test("tf-idf bounds its df table by the target docs' tokens before broadcasting") {
    // df is corpus-wide by definition, but only target-doc tokens may
    // reach the df aggregate: without the broadcast semi-filter the df
    // frame is VOCABULARY-sized (10^8-10^9 tokens at web scale) and its
    // broadcast is the 100 TB failure. Same same-line rule as d10: the
    // semi-join itself must be the broadcast.
    val p = plan("t6_tfidf")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"df side is not bounded by a broadcast semi-join:\n$p")
  }

  test("PII scrub and quality filter shuffle only for the final funnel agg") {
    // both docstrings claim 'zero shuffle before the per-source agg':
    // one hash exchange for the groupBy plus at most the presentation
    // sort's range exchange
    for (name <- Seq("d13_pii_redact", "d14_quality_filter")) {
      val (exchanges, p) = finalPlanShuffles(name)
      assert(exchanges <= 2,
        s"$name: expected hash + range exchange only, got $exchanges:\n$p")
    }
  }

  test("split assignment is a pure per-row filter into one report agg") {
    // d16's split is a pure function of doc_id — nothing may shuffle
    // before the (lang, split) groupBy + presentation sort
    val (exchanges, p) = finalPlanShuffles("d16_split_assign")
    assert(exchanges <= 2,
      s"d16: expected hash + range exchange only, got $exchanges:\n$p")
  }

  test("token budget broadcasts the rate table; the corpus never shuffles") {
    // the per-lang rate table must join back BROADCAST (it is
    // strata-sized); a sort-merge join here would shuffle the corpus
    val (exchanges, p) = finalPlanShuffles("d17_token_budget")
    assert(p.contains("BroadcastHashJoin"),
      s"d17 rate join is not broadcast:\n$p")
    // rate-agg exchange + kept-agg exchange + final sort at most; the
    // corpus-side filter must not add one
    assert(exchanges <= 4, s"d17: too many shuffles ($exchanges):\n$p")
  }

  test("scalar pipelines stay inside whole-stage codegen") {
    // AQE finalizes codegen spans only at execution — run the query, then
    // read the final adaptive plan.
    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen span.
    assert(finalPlan("f6_weighted_score").contains("*("))
    assert(finalPlan("f1_aqi_bucket").contains("*("))
  }

  test("NB scoring is join-free and explode-free (model rides as a literal)") {
    // t12's scoring pass must stay inside the row scan: no token
    // explode (Generate) and no join — the log-odds map is a broadcast
    // LITERAL, so the only exchanges are the report agg + presentation
    // sort. A refactor to explode-and-join would still be value-correct
    // and quietly corpus-shuffle at scale.
    val (exchanges, p) = finalPlanShuffles("t12_nb_classifier")
    assert(!p.contains("Generate"), s"t12 explodes tokens:\n$p")
    assert(!p.contains("Join"), s"t12 joins while scoring:\n$p")
    assert(exchanges <= 2, s"t12: got $exchanges exchanges:\n$p")
  }

  test("DSIR scoring shuffles nothing but its aggregates (bucket table is a literal)") {
    // d20: per-row weight via the B-element literal array, mean via a
    // broadcast singleton — no explode, no shuffle join; exchanges are
    // the mean agg, the report agg, and the presentation sort.
    val (exchanges, p) = finalPlanShuffles("d20_dsir_weights")
    assert(!p.contains("Generate"), s"d20 explodes tokens:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"d20 shuffle-joins:\n$p")
    assert(exchanges <= 3, s"d20: got $exchanges exchanges:\n$p")
  }

  test("dup-span df survives a corpus-hot gram (no unsplittable window)") {
    // d19 exists to FIND boilerplate, so its input contains grams with
    // corpus-scale df; a count window over the fingerprint would pin
    // all of a hot gram's rows on ONE partition AQE cannot split. The
    // skew-safe shape: dup-fp set via map-side-combined aggregate (hot
    // keys collapse per task), membership via a left-semi join (which
    // AQE's skew handling CAN split), per-doc n_grams straight off the
    // scan. Pin: no Window, the semi-join present, partial aggregation
    // on the fp frame.
    val (exchanges, p) = finalPlanShuffles("d19_dup_spans")
    assert(!p.contains("Window"), s"d19 reverted to the hot-key window:\n$p")
    assert(p.contains("LeftSemi"), s"d19 lost the dup-fp semi-join:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"d19 dup-fp set not partially aggregated:\n$p")
    assert(exchanges <= 7, s"d19: got $exchanges exchanges:\n$p")
  }

  test("segment scrub never shuffles text and survives a corpus-hot segment") {
    // d21: fingerprints shuffle, text does not — the only join touching
    // the doc rows is the dropped-position join keyed by doc_id; the
    // dup-fp set is a map-side-combined aggregate, membership a
    // left-semi join, exactly d19's skew discipline.
    val (exchanges, p) = finalPlanShuffles("d21_segment_scrub")
    assert(!p.contains("Window"), s"d21 has a hot-key window:\n$p")
    assert(p.contains("LeftSemi"), s"d21 lost the dup-fp semi-join:\n$p")
    // every Exchange line must carry only ids/fingerprints/positions,
    // never the text or derived segment arrays
    val shuffled = p.linesIterator.filter(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange")).mkString("\n")
    assert(!shuffled.contains("text") && !shuffled.contains("segs"),
      s"d21 shuffles document text:\n$shuffled")
    assert(exchanges <= 7, s"d21: got $exchanges exchanges:\n$p")
  }

  test("char stats are per-row arithmetic: no explode, no shuffle but the sort") {
    // t13: the char histogram must stay inside the row (HOFs over the
    // char array), never explode into a corpus×len token frame
    val (exchanges, p) = finalPlanShuffles("t13_char_stats")
    assert(!p.contains("Generate"), s"t13 explodes characters:\n$p")
    assert(exchanges <= 1, s"t13: got $exchanges exchanges:\n$p")
  }

  test("corpus manifest is one Expand + partial aggregation over one scan") {
    // t14: all subtotal combinations from a single cube pass — one scan,
    // map-side partial agg; NOT one job per grouping set
    val (exchanges, p) = finalPlanShuffles("t14_corpus_manifest")
    assert(p.contains("Expand"), s"t14 lost the cube Expand:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"t14 re-scans per grouping set:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"t14 not partially aggregated:\n$p")
    assert(exchanges <= 2, s"t14: got $exchanges exchanges:\n$p")
  }

  test("curation funnel: contamination probes broadcast, text never shuffles") {
    // d24: the corpus-side contamination check must stay the d10
    // broadcast left-semi (bench grams are MBs); the dedup stage moves
    // only (doc_id, fp) rows — no exchange may be keyed on text
    val (_, p) = finalPlanShuffles("d24_curation_funnel")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"d24 contamination is not a broadcast semi-join:\n$p")
    val shuffled = p.linesIterator.filter(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange")).mkString("\n")
    assert(!shuffled.contains("text"), s"d24 shuffles text:\n$shuffled")
  }

  test("exact-k sample: the rate table broadcasts; rank runs on pruned survivors") {
    // d28's per-stratum cap table is strata-sized and must join back
    // BROADCAST; a sort-merge join would shuffle the corpus to prune it
    val (exchanges, p) = finalPlanShuffles("d28_stratified_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"d28 rate join is not broadcast:\n$p")
    // totals agg + the survivor window's hash exchange + final sort; the
    // corpus-side prune filter must not add one
    assert(exchanges <= 4, s"d28: too many shuffles ($exchanges):\n$p")
  }

  test("quality cutoff: the score histogram is map-side combined; keep is join-free") {
    // d29's threshold comes from the bounded score histogram — the
    // partial/final HashAggregate pair is what keeps driver traffic at
    // O(bins) and the shuffle at bins×partitions, not corpus rows
    import org.apache.spark.sql.functions._
    val scored = graft.Tables.documents(spark, dir)
      .withColumn("score", round(length(col("text")) % 100 / 100.0, 4))
    val hp = graft.ext.Curate.scoreHistogram(scored)
      .queryExecution.explainString(FormattedMode)
    assert(hp.linesIterator.count(_.contains("HashAggregate")) >= 2, hp)
    // the keep pass compares against a LITERAL threshold — no join at all
    val p = plan("d29_quality_cutoff")
    assert(!p.contains("Join"), s"d29 joins for its threshold:\n$p")
  }

  test("as-of join is join-free: one tagged union, one window, no row product") {
    // j6's scale hazard is the equi-join-with-range-predicate plan: it
    // materializes |purchases|×|clicks| rows per user before aggregating
    // — quadratic on a hot user and unsplittable by AQE (the blow-up is
    // inside one join key). The pinned shape is the union+window kernel:
    // NO join of any kind, exactly one Window, and the window's hash
    // exchange on user_id reused by the group-by (only the presentation
    // sort may add a range exchange).
    val (exchanges, p) = finalPlanShuffles("j6_asof_join")
    assert(!p.contains("Join"), s"j6 reverted to the join plan:\n$p")
    // exactly ONE Window operator: a regression that splits the as-of
    // into two window passes (two sorts) is precisely what this catches.
    // executedPlan tree lines print as "+- Window [...]" — count the
    // operator token at a node position, not a bare substring.
    val windows = p.linesIterator.count(l =>
      l.replaceFirst("""^[\s:+*()\d-]*""", "").startsWith("Window"))
    assert(windows == 1, s"j6: expected exactly one Window, got $windows:\n$p")
    assert(exchanges <= 2, s"j6: expected hash + range exchange only, got $exchanges:\n$p")
  }

  test("flagship Q3: filters pushed, both joins broadcast, top-k fused") {
    // j8 is the composition proof: the date cut must reach the lineitem
    // SCAN (not sit above a join), both probe sides must broadcast (the
    // fact side never shuffles), and sort+limit must fuse into
    // TakeOrderedAndProject — a global sort of the aggregate output is
    // the regression this pin exists to catch.
    val p = plan("j8_shipping_priority")
    // FormattedMode prints each operator twice (tree + detail section);
    // tree lines carry the join type, detail headers don't.
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin Inner")) == 2,
      s"j8: expected exactly two broadcast joins:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"j8: l_shipdate cut not pushed to the lineitem scan:\n$p")
    assert(p.contains("LessThan(o_orderdate"),
      s"j8: o_orderdate cut not pushed to the orders scan:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"j8: segment filter not pushed to the customer scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"j8: top-10 did not fuse into TakeOrderedAndProject:\n$p")
  }

  test("s18 z-key assignment is a pure map: no window, no join, no sort " +
    "before the profile agg") {
    // the z-order layout's whole scale claim is that the KEY costs a
    // map pass (fences broadcast back as literals after two bounded
    // histogram collects) — a window-rank or sort-based formulation
    // would globally shuffle the fact table just to learn its buckets
    val p = plan("s18_zorder_layout")
    assert(!p.contains("Window"), s"s18 plans a window:\n$p")
    assert(!p.contains("Join"), s"s18 plans a join:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"s18 profile agg is not partial+final:\n$p")
  }

  test("heavy-hitter recount: partial agg + fused top-k, candidates as a filter") {
    // t16's second pass must stay the t5 shape: map-side-combined count
    // (only candidate tokens shuffle) and TakeOrderedAndProject — a
    // join against a candidate TABLE instead of the IN filter would
    // shuffle the token stream. Pinned on the recount KERNEL (shared by
    // batch t16 and the streaming fold's serve path): the registered
    // query now returns its ≤T16K collected rows as a local relation —
    // the guard needs them on the driver anyway — so the kernel is
    // where the distributed plan lives.
    val p = ext.TextStats.recountTopK(
      Tables.documents(spark, dir), Seq("the", "a", "of"), 20)
      .queryExecution.explainString(FormattedMode)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), s"t16 recount joins:\n$p")
  }

  test("equi-depth assignment is join-free and sort-free on the corpus side") {
    // a18's whole point: bucket boundaries are LITERALS baked into a
    // when-chain — no ntile global sort, no boundary-table join; the
    // only sort is the k-row presentation ordering
    val p = plan("a18_equidepth_hist")
    assert(!p.contains("Join"), s"a18 joins for its boundaries:\n$p")
    assert(!p.contains("Window"), s"a18 uses a window (ntile?):\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("skew profile: map-side-combined count + fused top-k (never a window)") {
    val p = plan("p9_skew_profile")
    assert(!p.contains("Window"), s"p9 counts via a window:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("robust outliers broadcast the per-type median/MAD tables") {
    // a19's two stat tables are type-cardinality-sized and must join
    // back broadcast — a sort-merge join would shuffle the corpus twice
    // the med join plans under BOTH consumers of withDev (the mad
    // aggregate and the final pass), so 3 broadcast joins total — the
    // invariant is that EVERY stat join broadcasts and none shuffles
    // the corpus
    val p = plan("a19_robust_outliers")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin Inner")) >= 2,
      s"a19: stat joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a19 shuffle-joins the corpus:\n$p")
  }

  test("embedding drift runs as partial aggregation per snapshot") {
    // sim13: both centroid passes must be mergeable-buffer aggregates
    // (vectors never shuffle raw) — the sim5 discipline ×2
    val p = plan("sim13_embedding_drift")
    assert(p.linesIterator.count(l =>
      l.contains("ObjectHashAggregate") || l.contains("SortAggregate")) >= 4,
      s"sim13 centroids not partially aggregated:\n$p")
  }

  test("cohort retention shares one user shuffle; dedup is an aggregate") {
    // w9: cohort window + (user, cohort, offset) dedup + rollup — the
    // dedup must be an aggregate (map-side combinable), and the whole
    // query at most: user hash, rollup hash, presentation range
    val (exchanges, p) = finalPlanShuffles("w9_cohort_retention")
    assert(!p.contains("Join"), s"w9 joins for its cohort:\n$p")
    assert(exchanges <= 3, s"w9: got $exchanges exchanges:\n$p")
  }

  test("band join plans as an equi-join on bins, never a nested loop") {
    // j7's entire reason to exist: a raw |a−b| <= delta join condition
    // plans as BroadcastNestedLoopJoin / CartesianProduct — O(N²) at
    // scale. The bin equi-key must carry the join.
    val p = plan("j7_band_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"j7 fell back to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join in j7:\n$p")
  }

  test("split leakage: the train fp set collapses BEFORE the probe join") {
    // d32's skew armor: the distinct over train fingerprints must be an
    // aggregate (map-side combinable), and holdouts reach it via a
    // left-semi join — not a window or a raw fp-keyed row join.
    val p = plan("d32_split_leakage")
    assert(p.contains("LeftSemi"), s"d32 probe is not a semi-join:\n$p")
    assert(!p.contains("Window"), s"d32 uses a window over fps:\n$p")
  }

  test("PQ rerank reads originals only for the broadcast candidate pool") {
    // sim7: the exact pass must be a BROADCAST left-semi of the tiny
    // ADC candidate set against the embedding table — a shuffle join
    // here would move the whole embedding table per query.
    val p = SparkEntry.queries("sim7_pq_ann")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"sim7 rerank is not a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sim7 shuffle-joins:\n$p")
  }

  test("BM25: no token explode, no shuffle join; top-k fused (t19)") {
    val p = plan("t19_bm25_topk")
    // per-term tf must be per-row HOF arithmetic — a (doc, token)
    // explode would shuffle the corpus token stream to score 3 terms
    assert(!p.contains("Generate"), s"t19 explodes tokens:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"t19 shuffle-joins:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t19 global-sorts:\n$p")
  }

  test("weighted sample: zero shuffle before the fused top-k (d41)") {
    val p = plan("d41_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"d41 global-sorts:\n$p")
    assert(!p.contains("Window"), s"d41 plans a window:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    assert(exchanges == 0, s"d41 shuffles before the draw:\n$p")
  }

  test("bucketed join: ZERO shuffle Exchange on either join input (j11)") {
    val p = plan("j11_bucketed_join")
    // bucket-matched layouts make the join itself exchange-free; the
    // only permitted shuffles are the segment aggregate + output order
    // (2). Shuffled inputs would add two more — the count pins them out.
    assert(p.contains("SortMergeJoin"),
      s"j11 did not plan the co-located sort-merge join:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 2, s"bucketed join shuffles its inputs:\n$p")
  }

  test("DPP join: the fact scan carries a dynamic-pruning partition filter (j14)") {
    val p = plan("j14_dpp_join")
    // the month predicate lives on the DIM — static pruning cannot see
    // it, so the fact scan must plan a runtime dynamicpruning subquery
    // on its partition column, or the whole layout is idle and every
    // month directory is read
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"j14 fact scan is not dynamically pruned:\n$p")
    assert(p.contains("PartitionFilters"),
      s"j14 scan shows no partition filters at all:\n$p")
  }

  test("trend regression: broadcast offset join, no corpus shuffle join (a21)") {
    val p = plan("a21_trend_regression")
    assert(p.contains("BroadcastHashJoin"), s"a21 offset join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"a21 shuffle-joins or windows:\n$p")
  }

  test("bloom decontaminate probes with the codegen expression, not a udf (d35)") {
    // The r10 verdict's one built-in-exists-but-UDF-used spot: the Bloom
    // probe must be BloomFilterMightContain (codegen, stays inside the
    // whole-stage span), never a per-row Scala closure in the corpus pass.
    val p = plan("d35_bloom_decontaminate")
    assert(!p.contains("UDF"), s"d35 plans a Scala UDF:\n$p")
    assert(p.contains("might_contain"), s"d35 lost the bloom probe:\n$p")
  }

  test("d52 containment: text and fingerprints coexist ONLY inside the " +
    "chunking expression — every post-chunk node (incl. every exchange " +
    "input) carries fingerprints without text") {
    val p = plan("d52_chunk_containment")
    assert(p.contains("rolling_chunks"), "chunking expression missing")
    // the signature scale claim, stated as a plan property: any line
    // where a text column and a fingerprint column appear together
    // must BE the chunking expression; afterwards only (doc_id, fp)
    // flows, so no shuffle ever moves document text
    val both = p.linesIterator
      .filter(l => l.contains("text#") && l.contains("fp#")).toSeq
    assert(both.nonEmpty && both.forall(_.contains("rolling_chunks")),
      s"text escaped past the chunker:\n${both.mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
  }

  test("t26 PSI: the served plan reads the PINNED bounded count frame " +
    "— the corpus scan ran once at build and never re-runs per consumer") {
    val p = plan("t26_quality_psi")
    // the one corpus pass happened at localCheckpoint time; the
    // registered query's own plan must be pure bounded-frame work
    // (ExistingRDD scans), with no parquet re-scan of documents
    assert(p.contains("ExistingRDD"),
      s"expected the pinned count frame to serve the plan:\n$p")
    assert(!p.contains("ReadSchema: struct<doc_id"),
      s"the drift card re-scanned the corpus per consumer:\n$p")
  }

  test("d48 k-anonymity: scan prunes to the three QI columns (text " +
    "never read) and the QI aggregate partial-combines map-side") {
    val p = plan("d48_k_anonymity")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"), s"audit read the text:\n$readSchema")
    assert(readSchema.contains("n_chars") && readSchema.contains("lang"),
      s"missing QI columns:\n$readSchema")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"no map-side combine:\n$p")
  }

  test("sim27 kNN graph: the pair fan-out rides an explicit cell " +
    "exchange (never the probe side's file count — the r16 receipt " +
    "bug), and the per-source top-k is a rank window, not a sort+limit") {
    val p = plan("sim27_knn_graph")
    // the repartition(cell) that fixed the broadcast-degenerate
    // fan-out: an Exchange hashpartitioning on cell must feed the join
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("cell")),
      s"the explicit cell exchange vanished:\n$p")
    assert(p.contains("row_number"), s"no rank window:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("a43 bootstrap: the xB fan-out reduction partial-combines " +
    "map-side (the only corpus-sized exchange is |types|*B groups)") {
    val p = plan("a43_bootstrap_ci")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"replica sums lost map-side combine:\n$p")
    assert(p.contains("Generate explode") || p.contains("explode"),
      s"fan-out shape changed:\n$p")
  }

  test("t29/t30: the eval scoring pass stays zero-shuffle on the " +
    "scan side (broadcast-literal lookup — no token explode/join)") {
    for (q <- Seq("t29_slice_metrics", "t30_calibration")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q scoring regressed to a token join:\n$p")
      // documents scan reads text plus only the slice/label columns
      val readSchema =
        p.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchema.contains("n_chars"),
        s"$q read columns the card never uses:\n$readSchema")
    }
  }

  test("shared pair kernels (r16 verdict ask #1): every " +
    "keyedNearDupPairs/batchCellCosines consumer's plan carries the " +
    "explicit key exchange, so the cosine fan-out can never fall to " +
    "a broadcast probe side's file count") {
    // sim3 keys by LSH bucket; d50 by cell (keyedNearDupPairs);
    // d51/d55 by cell (batchCellCosines). The sim27 pin above covers
    // the sixth consumer. d12 is NOT pinnable here: its pair stage
    // executes inside the checkpoint-truncated components build
    // (dedupedCorpus), so the exchange ran before the served plan —
    // it shares cellNearDupPairs → keyedNearDupPairs with d50, whose
    // pin covers the kernel.
    for ((q, key) <- Seq("sim3_neardup_pairs" -> "bucket",
      "d50_semdedup" -> "cell",
      "d51_incremental_semdedup" -> "cell",
      "d55_sem_decontaminate" -> "cell")) {
      val p = plan(q)
      assert(p.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains(key)),
        s"$q: the explicit $key exchange vanished:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q planned all-pairs")
    }
  }

  test("sim28 cell drift: the PSI chain rides the checkpoint-pinned " +
    "k-row count frame — the assignment scan and count aggregates " +
    "run once, not once per consumer (the t26 lesson)") {
    val p = plan("sim28_cell_drift")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"the k-row checkpoint pin vanished:\n$p")
    // the whole served plan is count-frame-sized: no sort-merge join
    // may appear over a corpus-sized side
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-sized join crept into the PSI chain:\n$p")
  }

  test("sim30 retrain what-if: the what-if training runs at BUILD " +
    "through the store — the SERVED plan holds assignment scans and " +
    "aggregates only, no KMeans stage and no vector re-shuffle") {
    val p = plan("sim30_retrain_whatif")
    assert(!p.contains("CartesianProduct"))
    // both MSE legs reduce map-side before their one-row cards
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"MSE aggregation lost map-side combine:\n$p")
  }
}
