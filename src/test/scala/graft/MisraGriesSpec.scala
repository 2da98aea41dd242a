package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** The MG sketch's one contract is RECALL under memory pressure: any
  * token with true count > N/(budget+1) must survive every trim and
  * merge, for any partitioning of the input. The registered t16 query
  * then restores exactness by recounting candidates — so here the
  * adversarial cases run with vocab ≫ budget (the regime the tiny
  * testdata vocabulary never reaches). */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40 heavy tokens (400 occurrences each) drowned in 20k singleton
    * noise tokens: N = 36k, budget 64 → threshold N/65 ≈ 554 — too high
    * for recall of the heavies. Budget 256 → threshold ≈ 141 < 400:
    * every heavy MUST survive. Runs both budgets to show the bound is
    * tight in the right direction. */
  private def corpus(seed: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    val heavy = (0 until 40).map(i => s"heavy_$i")
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    heavy.foreach(h => rows ++= Seq.fill(400)(h))
    rows ++= (0 until 20000).map(i => s"noise_${i}_${rnd.nextInt(1000)}")
    val shuffled = rnd.shuffle(rows.toSeq)
    shuffled.grouped(37).toSeq // uneven doc sizes
  }

  test("every above-threshold token survives trims, any partitioning") {
    val docs = corpus(11)
    for (nPart <- Seq(1, 7, 32)) {
      val cand = docs.toDF("toks").repartition(nPart)
        .as[Seq[String]]
        .select(new MisraGries(256).toColumn.name("c"))
        .head().keySet
      val missing = (0 until 40).map(i => s"heavy_$i").filterNot(cand)
      assert(missing.isEmpty,
        s"nPart=$nPart lost heavies: $missing (candidates: ${cand.size})")
      // and the sketch IS bounded: far fewer survivors than the 20k vocab
      assert(cand.size <= 4 * 256 + 40, s"sketch did not bound: ${cand.size}")
    }
  }

  test("two-pass t16 shape equals brute-force exact top-k on adversarial data") {
    val docs = corpus(23).toDF("toks").repartition(13)
    val cand = docs.as[Seq[String]]
      .select(new MisraGries(256).toColumn.name("c")).head().keys.toSeq
    val exploded = docs.select(explode(col("toks")).as("token"))
    val recount = exploded
      .filter(col("token").isin(cand: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(40)
      .as[(String, Long)].collect().toSeq
    val brute = exploded
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(40)
      .as[(String, Long)].collect().toSeq
    assert(recount == brute)
    assert(brute.forall(_._2 == 400L)) // the planted truth
  }

  test("t16 validity guard FIRES on a flat corpus (rank-k at or below " +
    "the MG bound must raise, never silently diverge from exact)") {
    // 10 tokens × 50 occurrences each: N = 500, budget 4 → bound
    // N/(B+1) = 100 > every true count. The sketch's candidate set is
    // some budget-bounded subset with NO recall guarantee, so the
    // recounted "top-2" need not be the exact top-2 — exactly the
    // regime where a silent value-oracle divergence would ship. The
    // guard must turn that into a loud, diagnosable failure.
    val texts = (0 until 10).flatMap(i => Seq.fill(50)(s"flat_$i"))
    val docs = texts.grouped(25).map(_.mkString(" ")).toSeq
      .toDF("text").repartition(3)
    val e = intercept[IllegalArgumentException] {
      graft.ext.TextStats.t16HeavyHittersDf(docs, budget = 4, k = 2)
    }
    assert(e.getMessage.contains("raise T16Budget"), e.getMessage)
    // and the SAME corpus with an adequate budget passes the guard and
    // equals the exact top-k — the bound is tight in both directions
    val ok = graft.ext.TextStats.t16HeavyHittersDf(docs, budget = 64, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(ok == Seq(("flat_0", 50L), ("flat_1", 50L)))
  }

  test("per-batch sketches FOLD into one running sketch (the streaming shape)") {
    // mergeable-summary property: sketch each micro-batch DISTRIBUTED,
    // fold the finished summaries through the same merge on the driver
    // — bounded state however long the stream runs, and recall of
    // above-threshold tokens survives any batch boundary (a heavy
    // token's occurrences may be split across every batch). This is the
    // d18 serving discipline for frequency state: the fold accumulator
    // is the persisted ingest artifact.
    val mg = new MisraGries(256)
    val batches = corpus(31).grouped(200).toSeq // ~3 uneven micro-batches
    var acc = mg.zero
    batches.foreach { batch =>
      val sketch = batch.toDF("toks").repartition(5)
        .as[Seq[String]]
        .select(mg.toColumn.name("c")).head()
      acc = mg.merge(acc, scala.collection.mutable.HashMap(sketch.toSeq: _*))
    }
    val folded = mg.finish(acc).keySet
    val missing = (0 until 40).map(i => s"heavy_$i").filterNot(folded)
    assert(missing.isEmpty, s"fold lost heavies: $missing")
    assert(folded.size <= 4 * 256 + 40, s"fold state unbounded: ${folded.size}")
  }

  test("reduce/merge/trim arithmetic on a hand-checked stream") {
    val mg = new MisraGries(1)
    // budget 1, softCap 4: exact until 5 distinct keys force a trim
    var b = mg.zero
    b = mg.reduce(b, Seq("a", "a", "a", "b", "c", "d"))
    // no trim yet (4 keys ≤ softCap): counts exact
    assert(b("a") == 3L && b("b") == 1L)
    b = mg.reduce(b, Seq("e")) // 5 keys > 4 → trim to 1: subtract 2nd-largest (1)
    assert(b.keySet == Set("a") && b("a") == 2L)
    // merge keeps the majority element too
    val other = mg.reduce(mg.zero, Seq("a", "f"))
    val merged = mg.merge(b, other)
    assert(merged("a") == 3L)
    assert(mg.finish(merged).contains("a"))
  }
}
