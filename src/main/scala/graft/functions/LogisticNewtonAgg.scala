package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One Newton/IRLS iteration's sufficient statistics for logistic
  * regression, in ONE pass with a FIXED-size buffer — the supervised
  * sibling of [[GramAgg]]: given the current β (a constructor
  * constant riding the closure), accumulate the negative
  * log-likelihood, the gradient g = Σ(y−p)·x and the upper-triangular
  * Hessian H = Σ p(1−p)·x xᵀ. Merge is elementwise addition; at
  * d = 65 the buffer is ~18 KB per partition and a single 2211-number
  * row reaches the driver for the d×d solve. A column-expression
  * formulation would need 2200+ generated sum columns — this stays
  * one object aggregate.
  */
object LogisticNewtonAgg {

  case class Buf(var loss: Double, var n: Long,
      g: Array[Double], h: Array[Double])

  /** d = feature count INCLUDING the bias (x arrives without it; the
    * aggregator prepends 1.0).
    */
  def agg(beta: Array[Double]): Aggregator[(Double, Seq[Double]), Buf, Buf] =
    new Aggregator[(Double, Seq[Double]), Buf, Buf] {
      private val d = beta.length

      override def zero: Buf = Buf(0.0, 0L,
        Array.ofDim[Double](d), Array.ofDim[Double](d * (d + 1) / 2))

      override def reduce(b: Buf, in: (Double, Seq[Double])): Buf = {
        val (y, xs) = in
        require(xs.length == d - 1, s"expected dim ${d - 1}, got ${xs.length}")
        val x = new Array[Double](d)
        x(0) = 1.0
        var i = 0
        while (i < d - 1) { x(i + 1) = xs(i); i += 1 }
        var z = 0.0
        i = 0
        while (i < d) { z += beta(i) * x(i); i += 1 }
        val p0 = 1.0 / (1.0 + math.exp(-z))
        // clamp: a separable fit drives p to 0/1 where ln() overflows
        val p = math.min(math.max(p0, 1e-12), 1.0 - 1e-12)
        b.loss -= y * math.log(p) + (1.0 - y) * math.log(1.0 - p)
        b.n += 1
        val r = y - p
        val w = p * (1.0 - p)
        var k = 0
        i = 0
        while (i < d) {
          b.g(i) += r * x(i)
          var j = i
          while (j < d) { b.h(k) += w * x(i) * x(j); k += 1; j += 1 }
          i += 1
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        a.loss += b.loss
        a.n += b.n
        var i = 0
        while (i < a.g.length) { a.g(i) += b.g(i); i += 1 }
        var k = 0
        while (k < a.h.length) { a.h(k) += b.h(k); k += 1 }
        a
      }

      override def finish(r: Buf): Buf = r
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }
}
