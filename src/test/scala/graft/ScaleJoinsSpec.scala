package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.ScaleJoins

/** Salting must be invisible in the OUTPUT (bit-equal to the plain join)
  * and bucketing must be visible in the PLAN (no exchange). */
class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed fact side: one hot key with 5k rows, 50 uniform keys. */
  private def skewed = (
    (1 to 5000).map(i => ("hot", i.toLong)) ++
    (1 to 500).map(i => (s"k${i % 50}", i.toLong))
  ).toDF("key", "v")

  private def dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"name_$i") }.toDF("key", "name")

  test("salted join output is identical to the plain shuffle join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = skewed.join(dim, Seq("key"))
        .select("key", "v", "name").as[(String, Long, String)].collect().sorted
      for (salts <- Seq(1, 8)) {
        val salted = ScaleJoins.saltedInnerJoin(skewed, dim, "key", salts)
          .select("key", "v", "name").as[(String, Long, String)].collect().sorted
        assert(salted.sameElements(plain), s"mismatch at salts=$salts")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salting spreads a hotspot of IDENTICAL rows across sub-keys") {
    // bit-identical duplicate rows — the case a content-hash salt would
    // re-collapse onto one reducer
    val identical = Seq.fill(4000)(("hot", 1L)).toDF("key", "v")
      .repartition(8)
    val salted = identical
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salted.length == 8) // all 8 sub-keys populated
    assert(salted.map(_.getAs[Long]("count")).max < 4000) // no lone hotspot
    // and the join output is still exactly the plain join
    val joined = ScaleJoins.saltedInnerJoin(identical, dim, "key", 8)
    assert(joined.count() == 4000)
  }

  test("a user column named __salt survives the salted join intact") {
    // withColumn would silently overwrite a same-named user column; the
    // salt name must dodge BOTH schemas so output stays bit-equal to the
    // plain join, user columns included.
    val bigWithSalt = skewed.withColumn("__salt0", lit("user-data"))
    val out = ScaleJoins.saltedInnerJoin(bigWithSalt, dim, "key", 4)
    assert(out.columns.contains("__salt0"))
    assert(out.select("__salt0").distinct().as[String].collect().toSeq == Seq("user-data"))
    assert(out.count() == skewed.join(dim, Seq("key")).count())
  }

  test("salt-name probe is case-insensitive like the analyzer (__SALT0 survives)") {
    // Spark resolves column names case-insensitively by default, so a
    // user column spelled __SALT0 would collide with a generated
    // __salt0 even though the strings differ — the probe must dodge it.
    val bigWithSalt = skewed.withColumn("__SALT0", lit("user-data"))
    val out = ScaleJoins.saltedInnerJoin(bigWithSalt, dim, "key", 4)
    assert(out.columns.contains("__SALT0"))
    assert(out.select("__SALT0").distinct().as[String].collect().toSeq == Seq("user-data"))
    assert(out.count() == skewed.join(dim, Seq("key")).count())
  }

  test("co-bucketed tables join with no exchange in the plan") {
    val dir = "/root/testdata/sf0.001"
    sources.Sources.writeBucketed(
      Tables.customer(spark, dir), nBuckets = 8, key = "c_custkey",
      table = "cust_bucketed")
    sources.Sources.writeBucketed(
      Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey"),
      nBuckets = 8, key = "c_custkey", table = "ord_bucketed")
    // Force the shuffle-join path (at real scale both sides are facts and
    // broadcast is off the table anyway — that's what bucketing is for).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("cust_bucketed")
        .join(spark.table("ord_bucketed"), Seq("c_custkey"))
      val rows = joined.count()
      // same answer as the unbucketed join
      val plainRows = Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey")).count()
      assert(rows == plainRows)
      // the co-located join needs NO shuffle: bucket layout already
      // satisfies the join's distribution requirement on both sides
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("band self-join equals brute force, including cross-boundary pairs " +
    "in BOTH id orders") {
    // delta = 1.0, bins at integers. Planted traps:
    //   (1, 3.95) & (2, 4.05): lower id in LOWER bin across a boundary
    //   (4, 6.05) & (3, 5.95): lower id in UPPER bin across a boundary
    //   (5, 8.0)  & (6, 8.9):  same-ish bin, within delta
    //   (7, 11.0) & (8, 12.5): outside delta — excluded
    val df = Seq((1L, 3.95), (2L, 4.05), (3L, 5.95), (4L, 6.05),
      (5L, 8.0), (6L, 8.9), (7L, 11.0), (8L, 12.5))
      .toDF("id", "v")
    val got = graft.ext.Joins.bandSelfJoin(df, "id", "v", delta = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val vals = df.as[(Long, Double)].collect()
    val brute = (for {
      (ia, va) <- vals; (ib, vb) <- vals
      if ia < ib && math.abs(va - vb) <= 1.0
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)))
    assert(!got.contains((7L, 8L)))
    // and no duplicate pair rows survive the adjacent-bin double match
    val rows = graft.ext.Joins.bandSelfJoin(df, "id", "v", delta = 1.0).count()
    assert(rows == brute.size)
  }

  test("interval overlap pairs: bin ownership dedups multi-bin overlaps; " +
    "inclusive arithmetic; no self-pairs (J12)") {
    import spark.implicits._
    // u1 [0, 7500] spans 3 hour-bins; u2 [3600, 7300] overlaps it across
    // TWO shared bins → must count once, overlap = 7300-3600+1; u3
    // [100, 200] overlaps u1 only (within bin 0), 101 s; u4 [20000,
    // 20010] overlaps nobody; u1's second session [9000, 9100] and u2's
    // [9050, 9060] overlap 11 s → same pair accumulates 2 overlaps
    val spans = Seq(
      (1L, 0L, 7500L), (1L, 9000L, 9100L),
      (2L, 3600L, 7300L), (2L, 9050L, 9060L),
      (3L, 100L, 200L), (4L, 20000L, 20010L)
    ).toDF("user_id", "start_s", "end_s")
    val out = graft.ext.Joins.intervalOverlapPairs(spans).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      (1L, 2L) -> ((2L, (7300L - 3600L + 1) + 11L)),
      (1L, 3L) -> ((1L, 101L))))
  }

  test("session spans are memoized per (session, dir): the second call " +
    "serves the pinned frame, no sessionize window re-runs (r22)") {
    val dir = "/root/testdata/sf0.001"
    val first = graft.ext.WindowFns.sessionSpans(spark, dir)
    val again = graft.ext.WindowFns.sessionSpans(spark, dir)
    // both calls resolve the same dir-tagged temp view...
    def viewOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collectLeaves().map(_.toString)
    assert(viewOf(first) == viewOf(again))
    // ...and the served plan is a checkpoint scan: the 30-min-gap
    // sessionize (lag + running-sum windows) ran once at build, so a
    // consumer's plan must carry NO Window operator of its own
    val plan = again.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sessionSpans re-derives per call:\n$plan")
    // the memoized frame still IS the sessionizer's output (the w6 rule)
    import org.apache.spark.sql.functions._
    val direct = graft.ext.WindowFns.sessionAssign(
      graft.Tables.events(spark, dir), 1800L, "event_id")
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("epoch_s")).as("start_s"), max(col("epoch_s")).as("end_s"))
      .collect().map(_.toString).sorted.toSeq
    assert(again.collect().map(_.toString).sorted.toSeq == direct)
  }

  test("interval overlap join plans as an equi-join on bins, never a nested loop (J12)") {
    import spark.implicits._
    val spans = Seq((1L, 0L, 7500L), (2L, 3600L, 7300L))
      .toDF("user_id", "start_s", "end_s")
    val plan = graft.ext.Joins.intervalOverlapPairs(spans)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"theta-join shape leaked:\n$plan")
  }

  test("fuzzy lookup recovers a hand-deleted character; tiebreak is deterministic (J13)") {
    // key 0 always probes (IdHash bucket of 0 is 0): "small ring" has
    // pos = (0 % 9) + 2 = 2 → delete char 2 → "sall ring". The catalog
    // carries the original at TWO keys (0 and 40) plus decoys beyond
    // edit distance 1 — best match must be dist 1 on the SMALLEST key,
    // and recovered = true because the name matches. The symmetric-
    // delete blocking guarantee: the dirty name IS a 1-deletion variant
    // of the original, so the equi-join on variants can never miss the
    // true match — the old first-char key needed a documented second
    // pass for a corrupted first character; this scheme does not.
    val catalog = Seq(
      (0L, "small ring"), (40L, "small ring"), (41L, "steel rings"),
      (42L, "brass bolt")).toDF("p_partkey", "p_name")
    val out = graft.ext.Joins.fuzzyLookup(catalog).collect()
    val r = out.filter(_.getLong(0) == 0L).head
    assert(r.getString(1) == "sall ring", "deletion at pos 2")
    assert(r.getLong(2) == 0L, "dist-1 tie breaks to the smallest key")
    assert(r.getString(3) == "small ring" && r.getInt(4) == 1)
    assert(r.getBoolean(5), "the original name is recovered")
    // decoys beyond distance 1 never become matches
    assert(out.forall(_.getString(3) == "small ring"))
  }

  test("fuzzy candidates per probe are O(1) in catalog size, not O(N) (J13)") {
    // The r10 first-char × length-band key had constant cardinality: a
    // catalog of same-first-char, same-length names put EVERY name in
    // one bucket, so candidates per probe grew linearly — on THIS
    // catalog (all share "part" + same length) every probe would have
    // seen all N names. The symmetric-delete key space grows with the
    // catalog instead: tails triple every digit, so distinct names are
    // pairwise ≥ 3 edits apart (one changed digit costs its 3 copies)
    // and a 1-deletion probe is within distance 1 of its own original
    // ONLY — candidates per probe must be exactly 1 at both sizes, the
    // blocking guarantee (never misses the original) and the O(1)
    // candidate bound (never drags neighbors) in one number.
    def catalog(n: Int) =
      (0 until n).map { i =>
        val tail = f"$i%04d".flatMap(c => s"$c$c$c")
        (i.toLong, s"part$tail item")
      }.toDF("p_partkey", "p_name")
    def candPerProbe(n: Int): Double = {
      val c = graft.ext.Joins.fuzzyCandidates(catalog(n))
      c.count().toDouble / c.select("probe_key").distinct().count()
    }
    val small = candPerProbe(200)
    val big = candPerProbe(800)
    assert(small == 1.0, s"candidates per probe at N=200: $small")
    assert(big == 1.0,
      s"candidates per probe grew with the catalog: $small -> $big")
  }

  test("forward as-of: strictly-after clicks only; tie clicks stay with j6 (J15)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: click at the purchase's own ts is the BACKWARD match (j6's
      // inclusive tie) — forward must skip it and take the 10:05 click
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 10:05:00"), 1L, "click"),
      // u2: purchase with no later click → unmatched forward
      (4L, ts("2024-01-01 09:00:00"), 2L, "click"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "purchase"),
      // noise kinds are filtered before the window
      (6L, ts("2024-01-01 09:10:00"), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ext.Joins.forwardAsOfEnrich(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)))).toSet
    assert(out == Set(
      (1L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:05:00"))),
      (2L, ts("2024-01-01 09:30:00"), None)), out.mkString(", "))
    // the same rows through j6's backward kernel: the tie click IS u1's
    // match — the two directions partition tie clicks with no overlap
    val back = graft.ext.Joins.asOfEnrich(ev).collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toMap
    assert(back(1L) == Some(ts("2024-01-01 10:00:00")))
  }

  test("component census: islands and singletons count separately (G5)") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("node")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = graft.ext.Graph.componentCensus(nodes, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // size-desc, id-asc: the chain {1,2,3}, the island {10,11}, the
    // never-paired singleton {20} (it must not vanish from the census)
    assert(out == Seq((1L, 3L), (10L, 2L), (20L, 1L)))
  }
}
