package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bottom-k distinct-value sketch as a typed, MERGEABLE `Aggregator`
  * (the k-minimum-values summary of Bar-Yossef et al. 2002; mergeable
  * per Agarwal et al., PODS 2012): keep the k SMALLEST distinct hash
  * values seen. Two sketches merge by unioning and re-trimming to k —
  * order-immune and idempotent (min is commutative/associative and a
  * re-inserted value dedups), so per-partition sketches fold to exactly
  * the sketch of the whole set.
  *
  * What it buys at 100 TB: the bottom-k of a set is a uniform sample of
  * the set's DISTINCT hashes, so for two sets A, B the fraction of the
  * k smallest of sig(A) ∪ sig(B) that lie in both sketches estimates
  * Jaccard(A, B) with standard error ~1/√k — per-set state is k longs
  * REGARDLESS of set size, where the exact computation (t21) shuffles
  * the full vocabulary. The same signature serves every pairwise
  * comparison, so S sources cost S·k longs total.
  *
  * Buffer is a SORTED ascending `ArrayBuffer[Long]` (binary-search
  * insert, O(log k) membership) — a TreeSet buffer would round-trip
  * through kryo as a HashSet and lose its ordering contract. */
class KMinHash(k: Int) extends Aggregator[
    Long, mutable.ArrayBuffer[Long], Array[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

  /** Insert keeping the buffer sorted, distinct, and ≤ k long. */
  private def insert(b: mutable.ArrayBuffer[Long], h: Long): Unit = {
    if (b.length >= k && h >= b.last) return
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == h) return // already present
    b.insert(lo, h)
    if (b.length > k) b.remove(b.length - 1)
  }

  override def reduce(b: mutable.ArrayBuffer[Long],
                      h: Long): mutable.ArrayBuffer[Long] = {
    insert(b, h); b
  }

  override def merge(a: mutable.ArrayBuffer[Long],
                     b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    b.foreach(insert(a, _)); a
  }

  /** Ascending k smallest distinct hashes. */
  override def finish(b: mutable.ArrayBuffer[Long]): Array[Long] = b.toArray

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
    Encoders.kryo[mutable.ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KMinHash {

  /** Bottom-k Jaccard estimate between two ASCENDING signatures: among
    * the k smallest of the union, the fraction present in BOTH (Bar-
    * Yossef et al.; exact when either set has ≤ k distinct values). */
  def jaccardEstimate(sigA: Array[Long], sigB: Array[Long], k: Int): Double = {
    val union = (sigA ++ sigB).distinct.sorted.take(k)
    if (union.isEmpty) return 0.0
    val inA = sigA.toSet
    val inB = sigB.toSet
    union.count(h => inA(h) && inB(h)).toDouble / union.length
  }
}
