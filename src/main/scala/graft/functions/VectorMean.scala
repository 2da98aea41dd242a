package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable element-wise vector-sum buffer: (count, per-dim sums). */
case class VecSum(var n: Long, var sums: Array[Double])

/** Element-wise vector mean as a typed `Aggregator` — the scale-correct
  * way to compute per-group embedding centroids (class prototypes,
  * cluster summaries). The alternative dataflow formulation —
  * posexplode(embedding) then groupBy(key, dim) — inflates the shuffle
  * by the vector dimension (d× the corpus!); this buffer keeps the
  * aggregation partial: each partition folds its vectors locally and
  * ships ONE d-dim sum per group, the same execution shape as a
  * built-in agg. Null vectors are skipped (SQL aggregate semantics);
  * a wrong-length vector fails fast rather than silently mis-summing. */
class VectorMean(dim: Int) extends Aggregator[Seq[Double], VecSum, Seq[Double]] {

  override def zero: VecSum = VecSum(0L, new Array[Double](dim))

  override def reduce(b: VecSum, x: Seq[Double]): VecSum = {
    if (x == null) return b
    require(x.length == dim, s"vector dim ${x.length} != aggregator dim $dim")
    var i = 0
    while (i < dim) { b.sums(i) += x(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: VecSum, b: VecSum): VecSum = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  /** Mean vector; empty group → null (like avg over no rows). */
  override def finish(r: VecSum): Seq[Double] =
    if (r.n == 0) null else scala.collection.immutable.ArraySeq.unsafeWrapArray(r.sums.map(_ / r.n))

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
