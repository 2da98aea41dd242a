package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair subword tokenizer kernel (greedy lowest-rank merging, the
  * standard BPE scheme of Sennrich et al., ACL 2016): a word starts as
  * characters and repeatedly fuses the adjacent pair with the lowest
  * merge rank until no ranked pair remains. Token counts from THIS
  * kernel — not whitespace words — are what production context-window
  * budgeting (d9 packing, d17 budgets) is actually shaped by.
  *
  * Scale design: the merge table is a BROADCAST (vocab-sized, shared by
  * every task), the encoder runs once per partition with a per-partition
  * word→count cache (word frequency is Zipfian, so the cache absorbs
  * almost all encode calls), and the output carries only
  * (doc_id, lang, n_tokens) — text never leaves the scan's partition.
  * Same resource pattern as T7's per-partition Deflater
  * (ext/TextStats.scala).
  */
object BpeTokenizer {

  /** Deterministic demo merge table — a production run loads the
    * tokenizer's real ranked merges; everything downstream is
    * table-agnostic. Order IS the rank. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("an", "d"), ("o", "u"), ("r", "e"), ("o", "n"), ("s", "t"),
    ("e", "s"), ("a", "r"), ("in", "g"), ("o", "r"), ("e", "n"))

  /** Encode ONE word: greedy lowest-rank adjacent merge to a fixpoint.
    * Deterministic for any ranks map (ties broken leftmost). */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  private[graft] def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** TRAIN a merge table from a corpus (Sennrich et al., ACL 2016 §3.2):
    * repeatedly fuse the most frequent adjacent symbol pair across the
    * word-frequency vocabulary. Scale split mirrors t9's unigram pass:
    * the CORPUS-sized work is exactly one word-count aggregate (bounded
    * by the vocabulary, capped with limit-before-collect so an
    * over-cap vocab fails fast instead of filling the driver heap); the
    * merge loop then runs driver-side over that bounded vocab — pair
    * counts are weighted by word frequency, so the driver loop never
    * touches the corpus again. Ties break by frequency desc, then pair
    * lexicographic — fully deterministic across runs and partition
    * layouts. */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  vocabCap: Int = 65536): Seq[(String, String)] = {
    val freqs = docs
      .select(explode(split(lower(coalesce(col("text"), lit(""))), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .limit(vocabCap + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(freqs.length <= vocabCap,
      s"vocabulary exceeds $vocabCap — raise the cap or pre-filter the corpus")
    trainMergesFromVocab(freqs.toSeq, nMerges)
  }

  /** The driver-side merge loop over a (word, freq) vocab — exposed so
    * the spec can replay the classic hand-computable example. */
  private[graft] def trainMergesFromVocab(vocab: Seq[(String, Long)],
                                          nMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 &&
                syms(j) == best._1 && syms(j + 1) == best._2) {
              out += fused; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), f)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** (doc_id, lang, n_tokens, n_words, n_chars) for every document:
    * n_tokens = subword count under `merges`, n_words / n_chars the
    * whitespace-word and word-character counts of the SAME text the
    * encoder saw (so t25's fertility = tokens/words and chars/token
    * ratios are internally consistent by construction). Null text
    * counts 0 everywhere (there is nothing to budget — unlike
    * wsTokens' ''=1 oracle convention, this count feeds no SQL
    * oracle). */
  def bpeTokenCounts(docs: DataFrame,
                     merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ranksOf(merges))
    docs
      .select(col("doc_id"), col("lang"),
        lower(coalesce(col("text"), lit(""))).as("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, lang, text) =>
          var n = 0L
          var words = 0L
          var chars = 0L
          text.split(' ').foreach { w =>
            if (w.nonEmpty) {
              n += cache.getOrElseUpdate(w, encodeWord(w, ranks).length)
              words += 1
              chars += w.length
            }
          }
          (id, lang, n, words, chars)
        }
      }
      .toDF("doc_id", "lang", "n_tokens", "n_words", "n_chars")
  }
}
