package graft.plans

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** F5-family mergeable aggregator: exact second-moment sums of a
  * fixed-dimension vector column — the ONE distributed pass behind a
  * covariance / PCA fit (E49).
  *
  * Buffer = (n, Σx_d, Σx_i·x_j upper-triangular), all quantized to
  * integer NANO-units (floor(v·10⁹) per row term) BEFORE summation —
  * the integer-micro-nats playbook at vector width: sums are exact
  * BIGINTs, so the fit is bit-deterministic under ANY partitioning or
  * merge order (a raw double accumulation would drift with task
  * scheduling). Headroom: |v|≤1-ish terms at 1e9 scale leave ~9×10⁹
  * safe rows per partial; beyond that the same shape carries
  * DECIMAL(38,0) sums (the C5k note).
  *
  * Map-side partials reduce every partition to one (1 + d + d(d+1)/2)-
  * long buffer — the exchange is plan-sized at any corpus size.
  */
class VecMomentsAgg(dim: Int)
    extends Aggregator[Seq[Float], (Long, Array[Long], Array[Long]), (Long, Array[Long], Array[Long])] {

  private val nCross = dim * (dim + 1) / 2

  override def zero: (Long, Array[Long], Array[Long]) =
    (0L, new Array[Long](dim), new Array[Long](nCross))

  override def reduce(b: (Long, Array[Long], Array[Long]), v: Seq[Float]):
      (Long, Array[Long], Array[Long]) = {
    require(v.length == dim, s"expected $dim dims, got ${v.length}")
    val (n, s, c) = b
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) { arr(i) = v(i).toDouble; i += 1 }
    i = 0
    var t = 0
    while (i < dim) {
      s(i) += math.floor(arr(i) * 1e9).toLong
      var j = i
      while (j < dim) {
        c(t) += math.floor(arr(i) * arr(j) * 1e9).toLong
        t += 1; j += 1
      }
      i += 1
    }
    (n + 1, s, c)
  }

  override def merge(b1: (Long, Array[Long], Array[Long]),
                     b2: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = {
    val (n1, s1, c1) = b1; val (n2, s2, c2) = b2
    var i = 0
    while (i < dim) { s1(i) += s2(i); i += 1 }
    i = 0
    while (i < c1.length) { c1(i) += c2(i); i += 1 }
    (n1 + n2, s1, c1)
  }

  override def finish(b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = b

  override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] = ExpressionEncoder()
  override def outputEncoder: Encoder[(Long, Array[Long], Array[Long])] = ExpressionEncoder()
}

object VecMomentsAgg {
  def udafFor(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new VecMomentsAgg(dim), ExpressionEncoder[Seq[Float]]())
}
