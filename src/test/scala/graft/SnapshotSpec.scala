package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Snapshot

/** Snapshot diff classifies every doc present in either crawl version,
  * takes `source` from the surviving side, and never misses a side-only
  * doc. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")
      .select($"doc_id", $"source", $"text") // column order must not matter

  test("diffStatus: added / removed / changed / unchanged, exactly once each") {
    val old = frame(Seq(
      (1L, "stays the same", "a"),
      (2L, "will be edited", "a"),
      (3L, "will be deleted", "b")))
    val neu = frame(Seq(
      (1L, "stays the same", "a"),
      (2L, "was edited here", "a"),
      (4L, "brand new doc", "b")))
    val got = Snapshot.diffStatus(old, neu)
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> (("a", "unchanged")),
      2L -> (("a", "changed")),
      3L -> (("b", "removed")),
      4L -> (("b", "added"))))
  }

  test("source of a doc present in both sides comes from the NEW snapshot") {
    val old = frame(Seq((1L, "same text", "oldsrc")))
    val neu = frame(Seq((1L, "same text", "newsrc")))
    val got = Snapshot.diffStatus(old, neu)
      .as[(Long, String, String)].collect().head
    assert(got == ((1L, "newsrc", "unchanged")))
  }

  test("identical snapshots diff to all-unchanged; disjoint ones to added+removed") {
    val a = frame(Seq((1L, "x", "s"), (2L, "y", "s")))
    val b = frame(Seq((3L, "z", "s")))
    assert(Snapshot.diffStatus(a, a).select("status").as[String]
      .collect().forall(_ == "unchanged"))
    val disjoint = Snapshot.diffStatus(a, b)
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(disjoint == Map("removed" -> 2L, "added" -> 1L))
  }

  test("diffReport aggregates per (source, status) and orders stably") {
    val old = frame(Seq((1L, "t", "a"), (2L, "t", "b")))
    val neu = frame(Seq((1L, "t2", "a"), (2L, "t", "b"), (3L, "n", "a")))
    val rep = Snapshot.diffReport(old, neu)
      .as[(String, String, Long)].collect().toList
    assert(rep == List(
      ("a", "added", 1L), ("a", "changed", 1L), ("b", "unchanged", 1L)))
  }

  test("mergeSnapshot: upsert replaces, insert adds, delete removes, " +
    "upsert wins over a same-id tombstone, and replay is idempotent") {
    def doc(id: Long, text: String) =
      (id, text, "en", "s", text.length.toLong)
    val base = Seq(doc(1L, "one"), doc(2L, "two"), doc(3L, "three"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val none = (None: Option[String], None: Option[String],
      None: Option[String], None: Option[Long])
    val delta = Seq(
      (2L, Option("two v2"), Option("en"), Option("s"), Option(6L), "upsert"),
      (9L, Option("nine"), Option("en"), Option("s"), Option(4L), "upsert"),
      (3L, none._1, none._2, none._3, none._4, "delete"),  // tombstone
      (1L, Option("one v2"), Option("en"), Option("s"), Option(6L), "upsert"),
      (1L, none._1, none._2, none._3, none._4, "delete"))  // loses to upsert
      .toDF("doc_id", "text", "lang", "source", "n_chars", "op")
    def collectM(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text").as[(Long, String)].collect().toSet
    val once = Snapshot.mergeSnapshot(base, delta)
    assert(collectM(once) ==
      Set((1L, "one v2"), (2L, "two v2"), (9L, "nine")))
    // idempotent: applying the same delta to the merged result is a no-op
    assert(collectM(Snapshot.mergeSnapshot(once, delta)) == collectM(once))
    // and the base side never shuffles: the touched-id anti join broadcasts
    val plan = once.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"merge anti-join is not broadcast:\n$plan")
  }

  test("two upserts for one id collapse to a single deterministic row") {
    val base = Seq((1L, "one", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val delta = Seq(
      (1L, Option("fetch a"), Option("en"), Option("s"), Option(7L), "upsert"),
      (1L, Option("fetch b"), Option("en"), Option("s"), Option(7L), "upsert"))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "op")
    val merged = Snapshot.mergeSnapshot(base, delta)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(merged.length == 1, s"duplicate keys survived: ${merged.toSeq}")
    // deterministic pick: greatest md5 fingerprint — stable across runs
    val expect = Seq("fetch a", "fetch b").maxBy(t =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(merged.head == ((1L, expect)))
  }

  /** A 4-column SCD2 dimension frame: (doc_id, lang, source, n_chars)
    * plus version bookkeeping. */
  private def dimFrame(rows: Seq[(Long, String, String, Long, Long, Option[Long], Boolean)]) =
    rows.toDF("doc_id", "lang", "source", "n_chars",
      "valid_from", "valid_to", "is_current")

  private def chFrame(rows: Seq[(Long, String, String, Long, String)]) =
    rows.toDF("doc_id", "lang", "source", "n_chars", "op")

  test("scdApply: change expires + reversions, no-op suppressed, delete expires, " +
    "insert opens, history untouched (D39)") {
    val dim = dimFrame(Seq(
      (1L, "en", "s1", 10L, 1L, Some(2L), false),  // history row
      (1L, "en", "s1", 12L, 2L, None, true),        // will change
      (2L, "fr", "s1", 20L, 1L, None, true),        // no-op upsert
      (3L, "de", "s2", 30L, 1L, None, true),        // delete
      (4L, "es", "s2", 40L, 1L, None, true)))       // untouched
    val ch = chFrame(Seq(
      (1L, "en", "s1", 99L, "upsert"),              // real change
      (2L, "fr", "s1", 20L, "upsert"),              // identical attrs → no-op
      (3L, null, null, 0L, "delete"),
      (5L, "zh", "s3", 50L, "upsert")))             // brand-new key
    val out = Snapshot.scdApply(dim, ch, 3L)
      .as[(Long, String, String, Long, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "en", "s1", 10L, 1L, Some(2L), false),   // history preserved
      (1L, "en", "s1", 12L, 2L, Some(3L), false),   // expired by the change
      (1L, "en", "s1", 99L, 3L, None, true),        // new open version
      (2L, "fr", "s1", 20L, 1L, None, true),        // no-op: NO new version
      (3L, "de", "s2", 30L, 1L, Some(3L), false),   // delete: expired, no new
      (4L, "es", "s2", 40L, 1L, None, true),        // untouched
      (5L, "zh", "s3", 50L, 3L, None, true)))       // insert
  }

  test("scdApply: replaying the same changeset is idempotent") {
    val dim = dimFrame(Seq(
      (1L, "en", "s1", 12L, 1L, None, true),
      (3L, "de", "s2", 30L, 1L, None, true)))
    val ch = chFrame(Seq(
      (1L, "en", "s1", 99L, "upsert"),
      (3L, null, null, 0L, "delete")))
    val once = Snapshot.scdApply(dim, ch, 2L)
    // replay at version 3: the upsert now matches the open version's
    // attributes (no-op) and the delete finds no current row — nothing
    // changes but the pass-through
    val twice = Snapshot.scdApply(once, ch, 3L)
      .as[(Long, String, String, Long, Long, Option[Long], Boolean)]
      .collect().toSet
    val onceSet = once
      .as[(Long, String, String, Long, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(twice == onceSet)
  }

  test("scdApply: the dimension side never shuffles (broadcast joins only)") {
    val dim = dimFrame(Seq((1L, "en", "s1", 12L, 1L, None, true)))
    val ch = chFrame(Seq((1L, "en", "s1", 99L, "upsert")))
    val plan = Snapshot.scdApply(dim, ch, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("table checksum is invariant to row order and partitioning (D40)") {
    val docs = Seq(
      (1L, "alpha", "en", "s1", 5L),
      (2L, "beta", "fr", "s1", 4L),
      (3L, "gamma", "de", "s2", 5L),
      (4L, null.asInstanceOf[String], "de", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Snapshot.tableChecksum(docs).collect().map(_.toSeq).toSeq
    val b = Snapshot.tableChecksum(
      docs.orderBy($"doc_id".desc).repartition(7)).collect().map(_.toSeq).toSeq
    assert(a == b) // including output order (sorted by source)
  }

  test("table checksum flips on any single-field change, and null != ''-adjacent shifts") {
    val base = Seq((1L, "alpha", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val baseSum = Snapshot.tableChecksum(base).collect().head.toSeq
    val variants = Seq(
      Seq((1L, "alphb", "en", "s1", 5L)),               // content bit
      Seq((2L, "alpha", "en", "s1", 5L)),               // key
      Seq((1L, "alpha", "fr", "s1", 5L)),               // attr
      Seq((1L, "alpha", "en", "s1", 6L)),               // metric
      // separator discipline: ("alphae","n") must not equal ("alpha","en")
      Seq((1L, "alphae", "n", "s1", 5L)))
    variants.foreach { v =>
      val s = Snapshot.tableChecksum(
        v.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .collect().head.toSeq
      assert(s != baseSum, s"checksum blind to change: $v")
    }
    // XOR blind spot (paired repeats cancel) is covered by the count +
    // mod-sum legs: a doubled row must still flip the checksum triple
    val doubled = Seq((1L, "alpha", "en", "s1", 5L), (1L, "alpha", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Snapshot.tableChecksum(doubled).collect().head.toSeq != baseSum)
  }

  test("moved-content: stable / moved / gone / new, id-set checksum splits " +
    "same-count shuffles (D44)") {
    val old = frame(Seq((1L, "aaa", "s"), (2L, "bbb", "s"),
      (3L, "ccc", "s"), (4L, "ddd", "s")))
    // aaa keeps its id → stable; bbb re-crawls under id 9 → moved; ccc
    // vanishes → gone; zzz appears → new; ddd keeps count=1 but swaps
    // to id 5 → the id-sum/min/max checksum must flag it moved even
    // though the counts match
    val neu = frame(Seq((1L, "aaa", "s"), (9L, "bbb", "s"),
      (30L, "zzz", "s"), (5L, "ddd", "s")))
    val byText = Map("aaa" -> "stable", "bbb" -> "moved",
      "ccc" -> "gone", "zzz" -> "new", "ddd" -> "moved")
    val fpOf = (old.select($"text").distinct().collect() ++
      neu.select($"text").distinct().collect())
      .map(_.getString(0)).distinct
      .map(t => graft.TestSpark.spark.sql(
        s"SELECT substring(md5(CAST('$t' AS BINARY)), 1, 16)")
        .head().getString(0) -> t).toMap
    val got = graft.ext.Snapshot.movedContentDf(old, neu).collect()
      .map(r => fpOf(r.getString(0)) -> r.getString(1)).toMap
    assert(got == byText, got.toString)
  }

  test("document text never enters the diff join (fingerprints only)") {
    val old = frame(Seq((1L, "some long body", "a")))
    val neu = frame(Seq((1L, "some long body", "a")))
    val plan = Snapshot.diffStatus(old, neu)
      .queryExecution.executedPlan.toString
    // the only join in the plan must not carry the raw text attribute
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toList
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("text")))
  }
}
