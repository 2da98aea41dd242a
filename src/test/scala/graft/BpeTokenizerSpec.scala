package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokenizer

/** The BPE kernel against hand-computed encodings (ranks below refer to
  * DefaultMerges positions), plus the Spark-side wiring invariants. */
class BpeTokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ranks = BpeTokenizer.ranksOf(BpeTokenizer.DefaultMerges)

  test("encodeWord follows merge ranks exactly (hand-computed)") {
    // t,h,e → (t,h)@0 → th,e → (th,e)@1 → the
    assert(BpeTokenizer.encodeWord("the", ranks) == Vector("the"))
    // s,t,a,n,d → (a,n)@4 beats (s,t)@9 → s,t,an,d → (an,d)@5 → s,t,and
    //  → (s,t)@9 → st,and
    assert(BpeTokenizer.encodeWord("stand", ranks) == Vector("st", "and"))
    // r,e,s,t → (r,e)@7 beats (s,t)@9 → re,s,t → (s,t)@9 → re,st
    assert(BpeTokenizer.encodeWord("rest", ranks) == Vector("re", "st"))
    // t,h,e,r → th,e,r → the,r; ("the","r") unranked → stops
    assert(BpeTokenizer.encodeWord("ther", ranks) == Vector("the", "r"))
    // no ranked pair at all → stays characters
    assert(BpeTokenizer.encodeWord("xyz", ranks) == Vector("x", "y", "z"))
    assert(BpeTokenizer.encodeWord("", ranks) == Vector.empty)
    assert(BpeTokenizer.encodeWord("q", ranks) == Vector("q"))
  }

  test("merge priority is by rank, not left-to-right scan order") {
    // o,u,t: (o,u)@6 exists; with a scan-order (leftmost-pair-first)
    // bug the result is the same here, so force a case where it differs:
    // e,r,e — (e,r)@3 at idx 0, (r,e)@7 at idx 1. Rank order fuses
    // (e,r) first → er,e (no further merge). A rank-ignoring
    // leftmost-first encoder happens to agree; so check a,r,e:
    // (a,r)@11 vs (r,e)@7 → (r,e) wins despite being RIGHTMOST → a,re.
    assert(BpeTokenizer.encodeWord("are", ranks) == Vector("a", "re"))
  }

  test("bpeTokenCounts: per-doc sums, null text = 0, case-folded, layout-invariant") {
    val docs = Seq(
      (0L, "The rest", "en"),   // the→1, rest→2 (case-folded)
      (1L, "stand stand", "en"),// 2 + 2
      (2L, null.asInstanceOf[String], "de"),
      (3L, "", "de"),
      (4L, "xyz", "de")         // 3 single chars
    ).toDF("doc_id", "text", "lang")
    val expect = Map(0L -> 3L, 1L -> 4L, 2L -> 0L, 3L -> 0L, 4L -> 3L)
    val one = BpeTokenizer.bpeTokenCounts(docs.repartition(1))
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    val many = BpeTokenizer.bpeTokenCounts(docs.repartition(5))
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(one == expect)
    assert(many == expect) // per-partition cache cannot change counts
  }

  test("trainMerges reproduces the classic hand-computed example") {
    // The textbook BPE corpus: low x5, lower x2, newest x6, widest x3.
    // Round 1 pair counts peak at 9 for BOTH (e,s) and (s,t) — the
    // lexicographic tie-break picks (e,s); then (es,t)=9, then the 7-7
    // tie between (l,o)/(o,w) resolves to (l,o), then (lo,w)=7.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTokenizer.trainMergesFromVocab(vocab, 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // The learned table composes with the encoder: "lowest" (absent
    // from the corpus) factors into the two learned morphemes.
    val learned = BpeTokenizer.ranksOf(merges)
    assert(BpeTokenizer.encodeWord("lowest", learned) == Vector("low", "est"))
  }

  test("trainMerges over a DataFrame equals the vocab-loop on the same corpus") {
    val docs = Seq(
      (0L, "low low low", "en"), (1L, "low low lower", "en"),
      (2L, "lower newest newest newest", "en"),
      (3L, "newest newest newest widest widest widest", "en"),
      (4L, null.asInstanceOf[String], "en") // null text must not crash training
    ).toDF("doc_id", "text", "lang")
    val fromDf = BpeTokenizer.trainMerges(docs, 4)
    val fromVocab = BpeTokenizer.trainMergesFromVocab(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 4)
    assert(fromDf == fromVocab)
  }

  test("trainMerges stops early when no pair remains and caps the vocab") {
    // single-char words: zero adjacent pairs → zero merges, no spin
    assert(BpeTokenizer.trainMergesFromVocab(Seq(("a", 9L), ("b", 1L)), 5).isEmpty)
    val docs = Seq((0L, "one two three four five", "en"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException](
      BpeTokenizer.trainMerges(docs, 3, vocabCap = 2))
    assert(e.getMessage.contains("vocabulary exceeds"))
  }

  test("d17 BPE budget: rates derive from subword totals, kept <= total per lang") {
    val docs = Seq(
      (0L, "the the the the", "en"),
      (1L, "stand rest stand rest", "en"),
      (2L, "xyz xyz", "de")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ext.Curate.tokenBudgetOn(
        BpeTokenizer.bpeTokenCounts(docs), budget = 6L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(4)))).toMap
    // en total = 4 + 8 = 12 subwords → rate 0.5; de total = 6 → rate 1.0
    assert(out("en")._1 == 12L && out("en")._2 == 0.5)
    assert(out("de")._1 == 6L && out("de")._2 == 1.0)
    assert(out("de")._3 == 6L)            // rate 1 keeps everything
    assert(out("en")._3 <= out("en")._1)  // kept never exceeds total
  }

  test("t25 fertility card: hand-computed tokens/words and chars/token " +
    "per lang under the fixed demo table; null text contributes zeros") {
    val docs = Seq(
      // "the"→1 token, "thinking"→ th,in,k,ing = 4: 2 words, 5 tokens,
      // 11 chars → fertility 2.5, chars/token 2.2
      (0L, "the thinking", "en"),
      // "zz"→ z,z (no ranked pair): per doc 2 words... one word, 2 toks
      (1L, "zz zz", "fr"),
      (2L, null.asInstanceOf[String], "fr")
    ).toDF("doc_id", "text", "lang")
    val card = graft.ext.TextStats.fertilityCardOf(
        BpeTokenizer.bpeTokenCounts(docs))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(card("en") == ((1L, 2L, 5L, 11L, 2.5, 2.2)))
    // fr: doc 1 → 2 words, 4 tokens, 4 chars; null doc → zeros but
    // still counted in n_docs
    assert(card("fr") == ((2L, 2L, 4L, 4L, 2.0, 1.0)))
  }

  test("t25 registered card at sf0.001: fertility >= 1 for every lang " +
    "(a word is at least one subword) and the corpus-trained table " +
    "compresses at least as well as character splitting") {
    val card = graft.ext.TextStats
      .queries("t25_tokenizer_fertility")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      assert(r.getDouble(5) >= 1.0, s"fertility < 1 for ${r.getString(0)}")
      assert(r.getDouble(6) >= 1.0, s"chars/token < 1 for ${r.getString(0)}")
    }
  }
}
