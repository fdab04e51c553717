package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable KLL-style quantile-sketch buffer: `levels(h)` holds items
  * of weight 2^h; a full level is sorted and every other item is
  * promoted one level up (the classic compactor). `flips(h)` tracks
  * the level's compaction parity so the kept offset alternates
  * deterministically instead of using randomness.
  */
final class KllBuffer(
    var n: Long,
    val levels: ArrayBuffer[ArrayBuffer[Double]],
    val flips: ArrayBuffer[Int])

/** KLL-style streaming quantile sketch as a `TypedImperativeAggregate`
  * — mergeable (levelwise concatenation + re-compaction), O(k · log(n/k))
  * memory per group, the standard sketch for distributed quantiles when
  * groups are too large to sort exactly.
  *
  * Exact regime: while a group holds fewer than `k` values, no
  * compaction ever fires, the buffer is simply the full value set, and
  * `eval` computes textbook linear-interpolation quantiles — exactly
  * `quantile_cont`, which is what lets the whole sketch path (update,
  * partial buffers, merge, final eval) sit behind the DuckDB hash gate
  * like agg_count_min does. Above `k` the sketch degrades gracefully
  * to bounded rank error (ε ≈ O(log(n/k)/k)), pinned empirically by
  * the collision-regime spec.
  *
  * Deterministic by construction: compaction keeps even/odd offsets by
  * per-level parity rather than a random coin. Under compaction the
  * result can depend on partition merge order (as with every practical
  * KLL); in the exact regime — the gated one — no compaction happens,
  * so the output is partition-order independent.
  */
case class KllSketch(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  require(k >= 8, "compactor capacity k must be at least 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a wrong-typed column — update() casts to
  // Double and would otherwise throw mid-job on every executor
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer =
    new KllBuffer(0L, ArrayBuffer(ArrayBuffer.empty[Double]), ArrayBuffer(0))

  private def compactPass(buf: KllBuffer): Unit = {
    var h = 0
    while (h < buf.levels.length) {
      if (buf.levels(h).length >= k) {
        val sorted = buf.levels(h).sorted
        val start = buf.flips(h) & 1
        buf.flips(h) += 1
        if (h + 1 == buf.levels.length) {
          buf.levels += ArrayBuffer.empty[Double]
          buf.flips += 0
        }
        val up = buf.levels(h + 1)
        val len = sorted.length
        // an odd count retains one element at this level (alternating
        // end, to balance bias) so pairs always merge 2→1 and total
        // weight stays exactly n
        val (from, until, retained) =
          if (len % 2 == 1) {
            if (start == 0) (0, len - 1, Some(sorted(len - 1)))
            else (1, len, Some(sorted(0)))
          } else (0, len, None)
        var i = from + start
        while (i < until) { up += sorted(i); i += 2 }
        buf.levels(h).clear()
        retained.foreach(buf.levels(h) += _)
      }
      h += 1
    }
  }

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.levels(0) += v.asInstanceOf[Double]
      buf.n += 1
      if (buf.levels(0).length >= k) compactPass(buf)
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.n += other.n
    var h = 0
    while (h < other.levels.length) {
      if (h == buf.levels.length) {
        buf.levels += ArrayBuffer.empty[Double]
        buf.flips += 0
      }
      buf.levels(h) ++= other.levels(h)
      h += 1
    }
    compactPass(buf)
    buf
  }

  /** Weighted linear-interpolation quantiles: item at level h carries
    * weight 2^h and occupies that many consecutive virtual ranks; the
    * interpolation formula is the same `lo + frac·(hi − lo)` both
    * Spark's `percentile` and DuckDB's `quantile_cont` evaluate, so
    * the exact regime is bit-identical to the oracle.
    */
  override def eval(buf: KllBuffer): Any = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < buf.levels.length) {
      val w = 1L << h
      buf.levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1).toArray
    val total = sorted.iterator.map(_._2).sum
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (rank < cum) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    val out = probs.map { p =>
      if (total == 0) Double.NaN
      else {
        val t = p * (total - 1)
        val lo = t.toLong
        val frac = t - lo
        val vlo = valueAt(lo)
        if (frac == 0) vlo
        else vlo + frac * (valueAt(lo + 1) - vlo)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    var size = 8 + 4 // n, numLevels
    buf.levels.foreach(l => size += 4 + 4 + l.length * 8) // flip, len, data
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(buf.levels.length)
    var h = 0
    while (h < buf.levels.length) {
      bb.putInt(buf.flips(h))
      bb.putInt(buf.levels(h).length)
      buf.levels(h).foreach(bb.putDouble)
      h += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val numLevels = bb.getInt
    val levels = ArrayBuffer.empty[ArrayBuffer[Double]]
    val flips = ArrayBuffer.empty[Int]
    var h = 0
    while (h < numLevels) {
      flips += bb.getInt
      val len = bb.getInt
      val l = new ArrayBuffer[Double](len)
      var i = 0
      while (i < len) { l += bb.getDouble; i += 1 }
      levels += l
      h += 1
    }
    new KllBuffer(n, levels, flips)
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketch =
    copy(child = c.head)
}

/** KLL aggregate that evals to the SERIALIZED buffer (binary) instead
  * of quantiles — the persistable artifact form: write per-group rows
  * to parquet today, `kll_merge_quantiles` them across runs tomorrow
  * without re-scanning raw data. Update/merge/serialization are
  * KllSketch's own (composed, not duplicated), so the two forms
  * cannot drift.
  */
case class KllBufferAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  private lazy val inner = KllSketch(child, k, Seq(0.5))

  override def children: Seq[Expression] = child :: Nil
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllBuffer =
    inner.createAggregationBuffer()
  override def update(buf: KllBuffer, input: InternalRow): KllBuffer =
    inner.update(buf, input)
  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer =
    inner.merge(buf, other)
  override def eval(buf: KllBuffer): Any = inner.serialize(buf)
  override def serialize(buf: KllBuffer): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllBufferAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBufferAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllBufferAgg =
    copy(child = c.head)
}

/** RE-aggregation of persisted `kll_buffer` rows: deserialize each
  * binary buffer, merge levelwise, eval quantiles — `theta_union`'s
  * twin for the quantile sketch. In the exact regime (every
  * contributing buffer uncompacted and the merged value count < k)
  * the result equals quantiles over the union of the original raw
  * data, which is what lets a two-run round trip sit behind the
  * DuckDB `quantile_cont` gate.
  */
case class KllMergeQuantiles(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  private lazy val inner = KllSketch(child, k, probs)

  override def children: Seq[Expression] = child :: Nil
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer =
    inner.createAggregationBuffer()
  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) inner.merge(buf, inner.deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }
  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer =
    inner.merge(buf, other)
  override def eval(buf: KllBuffer): Any = inner.eval(buf)
  override def serialize(buf: KllBuffer): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeQuantiles =
    copy(child = c.head)
}

object KllSketch {
  /** Column-level entry: quantiles of a double column at `probs`,
    * returned as array<double> in `probs` order.
    */
  def kll_quantiles(c: Column, k: Int, probs: Seq[Double]): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllSketch(org.apache.spark.sql.GraftBridge.expression(c), k, probs)
        .toAggregateExpression())

  /** Column-level entry: the persistable serialized-buffer form. */
  def kll_buffer(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllBufferAgg(org.apache.spark.sql.GraftBridge.expression(c), k)
        .toAggregateExpression())

  /** Column-level entry: re-aggregate persisted buffers → quantiles. */
  def kll_merge_quantiles(c: Column, k: Int, probs: Seq[Double]): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllMergeQuantiles(org.apache.spark.sql.GraftBridge.expression(c), k, probs)
        .toAggregateExpression())

  /** Bucket index against a (broadcast) sorted cutpoint array:
    * 1 + #cuts STRICTLY below x, so ties stick to the lower bucket
    * and buckets 1..j cover exactly {x ≤ c_j}. The strictly-below
    * rule is load-bearing for every DuckDB gate that mirrors it as
    * `1 + len(list_filter(cs, c -> c < x))` — this is its ONE
    * Spark-side definition (quantile buckets, PSI drift batch +
    * stream, KS grid, decile lift all route through here).
    */
  def bucket_below(cuts: Column, x: Column): Column = {
    import org.apache.spark.sql.functions.{filter, lit, size}
    lit(1) + size(filter(cuts, c => c < x))
  }
}
