package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable second-moment buffer: count, per-dim sums, and the upper
  * triangle of the cross-product matrix (d·(d+1)/2 entries, row-major
  * over i ≤ j). */
case class CovBuf(var n: Long, var sums: Array[Double],
                  var cross: Array[Double])

/** One-pass covariance sketch as a typed `Aggregator` — the bounded
  * sufficient statistic behind the sim32 embedding-spectrum card
  * ([[graft.ext.Similarity.sim32EmbeddingSpectrum]]). Folds each
  * partition's vectors into (n, Σx, upper-tri ΣxxT) locally and ships
  * ONE constant-size buffer per partition (1 + d + d(d+1)/2 doubles =
  * 2145 at d = 64) — the same execution shape as a built-in agg, while
  * the dataflow alternative (double posexplode to (i, j, x_i·x_j)
  * rows) inflates the scan output by d² (4096× the corpus!). The
  * buffer is an additive monoid over disjoint row sets, so partial
  * aggregation, AQE coalescing, and a streaming fold all combine it
  * exactly the same way. Null vectors skip (SQL aggregate semantics);
  * a wrong-length vector fails fast. Finish flattens to
  * [n, sums…, cross…] — covariance assembly and the eigen solve are
  * driver arithmetic on the ONE collected row (the sim14
  * bounded-collect contract).
  *
  * Non-finite components: the STRICT default throws (one NaN/Inf would
  * silently poison every moment). `tolerateNonFinite = true` SKIPS the
  * row instead — the gate/basis consumers ([[graft.ext.Similarity
  * .covSketchFlat]]) use this so the measured spectrum describes the
  * finite sub-corpus the dedup kernels actually operate on (advisor
  * r19: those kernels deliberately drop NaN cosines to tolerate failed
  * or padded encodes, so a gate that THREW on the same rows would turn
  * working queries into errors). The skip happens before any buffer
  * write, so a skipped row contributes nothing — identical to the
  * null-vector skip, and still an additive monoid. */
class CovarianceSketch(dim: Int, tolerateNonFinite: Boolean = false)
    extends Aggregator[Seq[Double], CovBuf, Seq[Double]] {

  private val tri = dim * (dim + 1) / 2

  override def zero: CovBuf =
    CovBuf(0L, new Array[Double](dim), new Array[Double](tri))

  override def reduce(b: CovBuf, x: Seq[Double]): CovBuf = {
    if (x == null) return b
    require(x.length == dim, s"vector dim ${x.length} != aggregator dim $dim")
    // Zero-copy fast path ONLY for the specialized double wrapper the
    // deserializer normally yields (advisor r18: matching any ArraySeq
    // and casting unsafeArray would CCE on a boxed ofRef — let every
    // other shape take the copying fallback, which unboxes correctly).
    val v = x match {
      case w: scala.collection.immutable.ArraySeq.ofDouble => w.unsafeArray
      case _ => x.toArray
    }
    // Check non-finite components BEFORE touching the buffer (advisor
    // r18, mirroring the wrong-length require): one NaN/Inf would
    // otherwise poison every moment and surface queries later as an
    // opaque NumberFormatException in the card's rounding. Strict mode
    // throws; tolerant mode skips the whole row (advisor r19).
    var i = 0
    while (i < dim) {
      if (!java.lang.Double.isFinite(v(i))) {
        if (tolerateNonFinite) return b
        throw new IllegalArgumentException(
          s"non-finite embedding component ${v(i)} at dim $i — " +
            "covariance sketch requires finite vectors (clean or drop " +
            "NaN/Inf rows upstream)")
      }
      i += 1
    }
    i = 0
    var t = 0
    while (i < dim) {
      b.sums(i) += v(i)
      var j = i
      while (j < dim) { b.cross(t) += v(i) * v(j); t += 1; j += 1 }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: CovBuf, b: CovBuf): CovBuf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    var t = 0
    while (t < tri) { a.cross(t) += b.cross(t); t += 1 }
    a.n += b.n
    a
  }

  override def finish(r: CovBuf): Seq[Double] = {
    val out = new Array[Double](1 + dim + tri)
    out(0) = r.n.toDouble
    System.arraycopy(r.sums, 0, out, 1, dim)
    System.arraycopy(r.cross, 0, out, 1 + dim, tri)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object CovarianceSketch {
  /** Population covariance matrix from a flattened sketch
    * ([n, sums…, upper-tri cross…]): Σ_ij = Q_ij/n − μ_i·μ_j.
    * Returns (n, full dim×dim symmetric matrix). */
  def covarianceOf(flat: Seq[Double], dim: Int): (Long, Array[Array[Double]]) = {
    val n = flat.head.toLong
    val m = Array.ofDim[Double](dim, dim)
    if (n == 0) return (0L, m)
    val mu = new Array[Double](dim)
    var i = 0
    while (i < dim) { mu(i) = flat(1 + i) / n; i += 1 }
    var t = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = flat(1 + dim + t) / n - mu(i) * mu(j)
        m(i)(j) = c; m(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    (n, m)
  }

  /** Eigenvalues of a symmetric matrix by cyclic Jacobi rotation —
    * deterministic (fixed sweep order, convergence on the off-diagonal
    * Frobenius norm), O(d³) driver arithmetic on a workload-sized
    * matrix (64×64 here; the g7 power-iteration contract). Returns
    * eigenvalues sorted descending. */
  def jacobiEigenvalues(a0: Array[Array[Double]], maxSweeps: Int = 50)
      : Array[Double] = jacobiEigen(a0, maxSweeps)._1

  /** Full eigen-decomposition by the same cyclic Jacobi sweep, now
    * ACCUMULATING the rotations (r18 verdict ask #2: the rotations
    * were already computed — sim33's PCA projection needs the
    * eigenVECTORS they compose into). Returns (eigenvalues sorted
    * descending, eigenvectors aligned with them — `vectors(j)` is the
    * unit eigenvector for `values(j)`, length d). The accumulation
    * adds one d-length column update per rotation — same O(d³)
    * driver-arithmetic class as the solve itself. */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 50)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    // V accumulates the product of all rotations; its COLUMNS end as
    // the eigenvectors of a0 (a = Vᵀ a0 V diagonal ⇒ a0 V = V diag)
    val vAcc = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off2: Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var tr2 = 0.0
    var di = 0
    while (di < d) { tr2 += a(di)(di) * a(di)(di); di += 1 }
    val eps = 1e-22 * math.max(tr2, 1e-300)
    var sweep = 0
    while (sweep < maxSweeps && off2 > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // stable tangent of the rotation angle: smaller root of
            // t² + 2θt − 1 = 0 (θ = 0 → t = 1, the 45° rotation)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // accumulate the rotation into V's (p, q) columns
            k = 0
            while (k < d) {
              val vkp = vAcc(k)(p); val vkq = vAcc(k)(q)
              vAcc(k)(p) = c * vkp - s * vkq
              vAcc(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // sort eigen-PAIRS descending by value; extract V's columns as
    // row-vectors aligned with the sorted values
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(k => vAcc(k)(i))).toArray
    (values, vectors)
  }
}
