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
}
