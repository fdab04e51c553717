package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count + element-wise sum of UNIT vectors with a FIXED d-sized
  * buffer — the per-cluster aggregation that makes distributed
  * k-means one partial-agg shuffle per iteration: each map task sends
  * a single (n, Σu) buffer per cluster across the wire, never the
  * vectors. Input rows are (cid, v, |v|); the division to the unit
  * vector happens inside `reduce` so no interpreted HOF projection
  * precedes the aggregate (CODEGEN_ONLY discipline).
  *
  * Merge is double addition — associative only to the ulp, so exact
  * centroid bits can vary with partition layout; the k-means contract
  * is the invariant set (inertia descent, purity), not bit equality —
  * the same declared regime as [[GramAgg]].
  */
object VecSumAgg {

  case class Buf(var n: Long, s: Array[Double])

  def agg(d: Int): Aggregator[(Int, Seq[Double], Double), Buf, Buf] =
    new Aggregator[(Int, Seq[Double], Double), Buf, Buf] {
      override def zero: Buf = Buf(0L, Array.ofDim[Double](d))

      override def reduce(b: Buf, row: (Int, Seq[Double], Double)): Buf = {
        val (_, x, norm) = row
        require(x.length == d, s"expected dim $d, got ${x.length}")
        b.n += 1
        var i = 0
        while (i < d) { b.s(i) += x(i) / norm; i += 1 }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        a.n += b.n
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        a
      }

      override def finish(r: Buf): Buf = r
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }
}
