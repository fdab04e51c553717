package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mean + scatter (Gram) matrix of a vector column in ONE pass with a
  * FIXED-size buffer — the aggregation that makes distributed PCA a
  * single partial-agg shuffle instead of a d²-explode.
  *
  * Buffer: (n, s[d] = Σx, g[d(d+1)/2] = upper-triangular Σ x xᵀ).
  * Merge is elementwise addition — exact-arithmetic order-free, but
  * DOUBLE addition is associative only to the ulp, so across
  * different partition counts or merge orders the sums can differ in
  * the last bits (the downstream eigen-invariants, not bit equality,
  * are the portable contract; see `embedPca`). At d = 64 the buffer
  * is ~17 KB per partition — ONE buffer per map task crosses the
  * wire, never the vectors.
  * The centered scatter M = Σ(x−μ)(x−μ)ᵀ = g − s sᵀ/n is derived at
  * finish time from the raw sums (exact algebra; the numerically
  * fragile cancellation regime would need means ≫ spread, which
  * embedding coordinates in [−1, 1] never hit).
  */
object GramAgg {

  case class Buf(var n: Long, s: Array[Double], g: Array[Double])

  def agg(d: Int): Aggregator[Seq[Double], Buf, Buf] =
    new Aggregator[Seq[Double], Buf, Buf] {
      override def zero: Buf =
        Buf(0L, Array.ofDim[Double](d), Array.ofDim[Double](d * (d + 1) / 2))

      override def reduce(b: Buf, x: Seq[Double]): Buf = {
        require(x.length == d, s"expected dim $d, got ${x.length}")
        val xa = x.toArray
        b.n += 1
        var i = 0
        var k = 0
        while (i < d) {
          b.s(i) += xa(i)
          var j = i
          while (j < d) {
            b.g(k) += xa(i) * xa(j)
            k += 1
            j += 1
          }
          i += 1
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        a.n += b.n
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        var k = 0
        while (k < a.g.length) { a.g(k) += b.g(k); k += 1 }
        a
      }

      override def finish(r: Buf): Buf = r
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }

  /** Expand the packed upper triangle + sums into the centered
    * scatter matrix M[i][j] = Σ(x_i−μ_i)(x_j−μ_j), plus μ.
    */
  def centered(d: Int, buf: Buf): (Array[Double], Array[Array[Double]]) = {
    val n = buf.n.toDouble
    val mu = buf.s.map(_ / n)
    val m = Array.ofDim[Double](d, d)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = buf.g(k) - buf.s(i) * buf.s(j) / n
        m(i)(j) = c
        m(j)(i) = c
        k += 1
        j += 1
      }
      i += 1
    }
    (mu, m)
  }
}
