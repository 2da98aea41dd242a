package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Classify
import graft.functions.TokenHash

/** The learned filters actually learn: NB separates a separable planted
  * corpus perfectly, DSIR ranks target-like docs above pool-like ones,
  * and the token hash agrees with DuckDB bit-for-bit. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Disjoint vocabularies → a perfectly separable classification task.
  private def planted = Seq(
    (0L, "alpha beta gamma alpha beta", "en"),
    (1L, "beta gamma alpha gamma", "en"),
    (2L, "alpha alpha beta gamma beta", "en"),
    (3L, "delta epsilon zeta delta", "fr"),
    (4L, "zeta epsilon delta epsilon", "fr"),
    (5L, "epsilon zeta zeta delta delta", "fr")
  ).toDF("doc_id", "text", "lang")

  test("NB log-odds are positive for pos-class tokens, negative for neg") {
    val lo = Classify.nbLogOddsOn(planted, col("lang") === "en", 100)
    for (t <- Seq("alpha", "beta", "gamma")) assert(lo(t) > 0, t)
    for (t <- Seq("delta", "epsilon", "zeta")) assert(lo(t) < 0, t)
  }

  test("NB classifies the separable planted corpus perfectly") {
    val lo = Classify.nbLogOddsOn(planted, col("lang") === "en", 100)
    val scored = Classify.nbScoreOn(planted, lo)
      .select(col("doc_id"), col("lang"), col("score")).collect()
    assert(scored.length == 6)
    scored.foreach { r =>
      val pos = r.getString(1) == "en"
      assert((r.getDouble(2) > 0) == pos, s"doc ${r.getLong(0)}")
    }
  }

  test("NB vocab cap fails fast with a diagnostic, not an OOM") {
    val e = intercept[IllegalArgumentException] {
      Classify.nbLogOddsOn(planted, col("lang") === "en", maxVocab = 3)
    }
    assert(e.getMessage.contains("vocabulary exceeds"))
  }

  test("docs with no tokens are excluded from scoring, not null-scored") {
    val lo = Classify.nbLogOddsOn(planted, col("lang") === "en", 100)
    val withEmpty = planted.union(
      Seq((9L, "", "en"), (10L, " ", "en")).toDF("doc_id", "text", "lang"))
    val ids = Classify.nbScoreOn(withEmpty, lo)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9L) && !ids.contains(10L) && ids.size == 6)
  }

  test("token hash replays DuckDB's md5 bucket bit-for-bit") {
    // reference values computed with DuckDB:
    //   CAST(CAST(concat('0x', substr(md5(tok),1,12)) AS BIGINT) % 1024 AS INT)
    val expected = Seq("hello" -> 75, "the" -> 921, "spark" -> 128,
      "x" -> 652, "join window" -> 599)
    val got = expected.map(_._1).toDF("tok")
      .select(col("tok"), TokenHash.bucket(col("tok"), 1024).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    expected.foreach { case (t, b) => assert(got(t) == b, t) }
  }

  test("DSIR weights rank target-like docs above pool-like docs") {
    // token counts must DWARF the add-one smoothing over B buckets for
    // the weight's sign to mean "more target-like than pool-average"
    // (at corpus scale they do; a 4-token doc would drown in +1/B), so
    // the planted docs carry realistic counts via repetition
    def rep(s: String) = (s + " ") * 100
    val corpus = Seq(
      (0L, rep("alpha beta gamma alpha"), "wiki"),
      (1L, rep("beta alpha gamma gamma"), "wiki"),
      (2L, rep("alpha gamma beta beta"), "wiki"),
      (3L, rep("noise junk filler junk"), "crawl"),
      (4L, rep("filler noise junk noise"), "crawl"),
      // a crawl doc WRITTEN LIKE the target — DSIR's whole point is
      // that it gets selected despite its source label
      (5L, rep("alpha beta gamma beta"), "crawl")
    ).toDF("doc_id", "text", "source")
    val lr = Classify.dsirLogRatiosOn(corpus, col("source") === "wiki")
    val w = Classify.dsirWeighted(corpus, lr)
      .select(col("doc_id"), col("weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (id <- Seq(0L, 1L, 2L, 5L); other <- Seq(3L, 4L))
      assert(w(id) > w(other), s"$id vs $other")
    assert(w(5L) > 0, "target-like crawl doc clears the keep line")
  }

  test("registered queries are deterministic across invocations") {
    val dir = "/root/testdata/sf0.001"
    def run(name: String) = graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq
    for (q <- Seq("t12_nb_classifier", "d20_dsir_weights")) {
      val a = run(q); val b = run(q)
      assert(a == b, q)
      assert(a.nonEmpty, q)
    }
  }

  test("t29 slice metrics: hand-computed Wilson bounds on planted " +
    "counts — n=4/3 correct, the all-correct slice (no Wald 0/0, hi " +
    "exactly 1), and the all-wrong slice (lo exactly 0, never −0.0)") {
    // truth = flag; pred = planted per row. Slices by (g, s):
    //   (a, x): 4 rows, 3 correct → acc 0.75, Wilson [0.3006, 0.9544]
    //   (b, x): 10 rows, all correct → acc 1, Wilson [0.7225, 1.0]
    //   (c, x): 5 rows, none correct → acc 0, Wilson [0.0, 0.4345]
    val rows =
      Seq.fill(3)(("a", "x", true, true)) ++ Seq(("a", "x", true, false)) ++
      Seq.fill(10)(("b", "x", false, false)) ++
      Seq.fill(5)(("c", "x", true, false))
    val df = rows.toDF("g", "s", "t0", "p0")
    val out = Classify.sliceMetricsOn(df, col("t0"), col("p0"),
      Seq("g", "s")).collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(2) == 4 && a.getLong(5) == 3 &&
      a.getDouble(6) == 0.75)
    assert(a.getDouble(7) == 0.3006 && a.getDouble(8) == 0.9544,
      s"Wilson(3/4) drifted: $a")
    val b = out("b")
    assert(b.getDouble(6) == 1.0 && b.getDouble(7) == 0.7225 &&
      b.getDouble(8) == 1.0)
    val c = out("c")
    assert(c.getDouble(6) == 0.0 && c.getDouble(8) == 0.4345)
    assert(c.getDouble(7) == 0.0 &&
      !c.getDouble(7).toString.startsWith("-"),
      s"p̂=0 lower bound must be 0.0, not -0.0: ${c.getDouble(7)}")
  }

  test("t30 calibration: planted scores land in the hand-computed " +
    "bins with exact per-bin means, gaps, and the n-weighted ECE") {
    // score 0 → p̂ 0.5 (bin 5); score 1 → p̂ 0.9091 (bin 9);
    // score −1 → p̂ 0.0909 (bin 0). Planted:
    //   bin 5: two rows (one pos, one neg) → avg_pred 0.5, obs 0.5, gap 0
    //   bin 9: two rows, both pos → avg_pred 0.9091, obs 1.0, gap 0.0909
    //   bin 0: one row, neg → avg_pred 0.0909, obs 0.0, gap 0.0909
    // ECE = (2·0 + 2·909 + 1·909)/(5·10000) = 2727/50000 = 0.0545
    val df = Seq((true, 0.0), (false, 0.0), (true, 1.0), (true, 1.0),
      (false, -1.0)).toDF("t0", "score")
    val out = Classify.calibrationOn(df, col("t0"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(0, 5, 9))
    val b5 = out(5)
    assert(b5.getLong(1) == 2 && b5.getDouble(2) == 0.5 &&
      b5.getDouble(3) == 0.5 && b5.getDouble(4) == 0.0)
    val b9 = out(9)
    assert(b9.getDouble(2) == 0.9091 && b9.getDouble(3) == 1.0 &&
      b9.getDouble(4) == 0.0909)
    val b0 = out(0)
    assert(b0.getDouble(2) == 0.0909 && b0.getDouble(3) == 0.0 &&
      b0.getDouble(4) == 0.0909)
    out.values.foreach(r => assert(r.getDouble(5) == 0.0545,
      s"ECE must be the shared n-weighted total: $r"))
    // a calibrated planted set reads ECE 0: 10 rows at p̂ = 0.5 with
    // exactly 5 positives — predicted and observed rates match
    val matched = ((1 to 5).map(_ => (true, 0.0)) ++
      (1 to 5).map(_ => (false, 0.0))).toDF("t0", "score")
    val m = Classify.calibrationOn(matched, col("t0")).collect()
    assert(m.length == 1 && m.head.getDouble(5) == 0.0,
      s"matched rates must read ECE 0: ${m.toSeq}")
  }
}
