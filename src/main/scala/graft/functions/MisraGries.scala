package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed, MERGEABLE `Aggregator`
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): one streaming pass finds a superset of every
  * token whose true frequency exceeds N/(B+1), in O(B) memory per
  * partition — no token ever shuffles. Input is the per-document token
  * ARRAY, so the corpus-sized token explode that t5's exact top-k pays
  * never materializes here.
  *
  * This is the CANDIDATE pass of the two-pass heavy-hitters pattern
  * (sketch → exact recount of candidates only): the sketch guarantees
  * recall, the recount restores exact counts, and what shuffles is
  * bounded by B and by the candidate set instead of by the corpus
  * vocabulary — the difference between 10⁸ distinct tokens × partitions
  * and 10³ × partitions at web scale.
  *
  * Buffer discipline: counts stay EXACT until the map exceeds `softCap`
  * (4B), then one trim subtracts the (B+1)-th largest count from every
  * entry and drops the non-positive — amortizing the O(cap·log cap) trim
  * over ≥3B inserts. Each element's undercount across all trims/merges
  * is ≤ N/(B+1) (the MG bound), so any token with true count above that
  * threshold cannot be trimmed to zero and MUST survive into `finish`.
  */
class MisraGries(budget: Int) extends Aggregator[
    Seq[String], mutable.HashMap[String, Long], Map[String, Long]] {
  require(budget >= 1, s"budget must be >= 1, got $budget")
  private val softCap = 4 * budget

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Subtract the (budget+1)-th largest count from every entry, dropping
    * the non-positive — the batched MG decrement. */
  private def trim(b: mutable.HashMap[String, Long],
                   to: Int): mutable.HashMap[String, Long] = {
    if (b.size <= to) return b
    val counts = b.values.toArray
    java.util.Arrays.sort(counts)
    val t = counts(counts.length - to - 1) // (to+1)-th largest
    b.filterInPlace((_, c) => c > t)
    b.mapValuesInPlace((_, c) => c - t)
    b
  }

  override def reduce(b: mutable.HashMap[String, Long],
                      tokens: Seq[String]): mutable.HashMap[String, Long] = {
    if (tokens != null) {
      tokens.foreach { t =>
        if (t != null && t.nonEmpty) b.updateWith(t) {
          case Some(c) => Some(c + 1); case None => Some(1L)
        }
      }
      if (b.size > softCap) trim(b, budget)
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, c) => big.updateWith(k) {
      case Some(c0) => Some(c0 + c); case None => Some(c)
    } }
    if (big.size > softCap) trim(big, budget)
    big
  }

  /** Every surviving key is a candidate; the final trim to the budget is
    * skipped on purpose — extra candidates only cost the recount pass a
    * few rows, while a trim here could only LOWER recall. The OUTPUT is
    * the full (token → residual count) summary, not just the key set:
    * a finished summary re-wrapped in a HashMap is again a valid MERGE
    * input, which is what lets per-micro-batch sketches FOLD into one
    * running sketch on a stream (mergeable-summary property) — the
    * foldStream test pins it. */
  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
