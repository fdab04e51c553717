package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable streaming mean/variance (Welford / Chan
  * parallel merge) as a typed `Aggregator` — the UDAF surface of the
  * engine. Stable at 100 TB where the naive sum-of-squares form
  * catastrophically cancels on large means.
  */
object WelfordAgg {

  case class Buf(n: Long, mean: Double, m2: Double)
  case class Stats(n: Long, mean: Double, variance: Double)

  /** Aggregator over any input type via an extractor — Spark's
    * `Aggregator` has no contramap, so the projection is baked in.
    */
  def aggOn[I](f: I => Double): Aggregator[I, Buf, Stats] =
    new Aggregator[I, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0.0, 0.0)
      override def reduce(b: Buf, in: I): Buf = {
        val x = f(in)
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        Buf(n, mean, b.m2 + d * (x - mean))
      }
      // Chan et al. pairwise merge — what makes this partition-safe
      override def merge(a: Buf, b: Buf): Buf = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          Buf(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      }
      override def finish(r: Buf): Stats =
        Stats(r.n, r.mean, if (r.n < 2) 0.0 else r.m2 / (r.n - 1))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }

  val agg: Aggregator[Double, Buf, Stats] = aggOn[Double](identity)
}
