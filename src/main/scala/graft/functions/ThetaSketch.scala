package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-style (KMV / bottom-k) distinct-count sketch family:
  * `theta_sketch` aggregates raw items into the k smallest distinct
  * xxhash64 values; `theta_union` RE-aggregates sketches (set union,
  * keep k smallest) — the operation that makes sketches composable
  * across rollup levels (per-day sketches → per-type totals) without
  * touching raw data again, which is the whole point of sketches in a
  * warehouse. Both sides are deterministic: the hash is fixed and
  * bottom-k needs no randomness, so results are identical across
  * runs, partitionings, and cluster layouts.
  *
  * Exact regime: with fewer than k distinct items the sketch IS the
  * distinct hash set and `theta_estimate` returns the exact count —
  * oracle-gated end-to-end against DuckDB's count(DISTINCT) through a
  * two-level rollup (sketch → union). Saturated regime: estimate =
  * (k−1)/u_(k) with u the k-th smallest hash mapped to [0,1) — the
  * standard KMV estimator, unbiased with RSE ≈ 1/√(k−2) — spec-pinned
  * within 3 standard errors on a forced-saturation stream.
  */
case class ThetaSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 16)

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a wrong-typed column — update() casts to
  // UTF8String and would otherwise throw mid-job on every executor
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast() // keep the k smallest (signed order)
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v.asInstanceOf[UTF8String], StringType, 42L))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending signed order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketch =
    copy(child = c.head)
}

/** Union of sketches produced by `theta_sketch`: merge the hash sets,
  * keep the k smallest. Input rows are array<long> sketches.
  */
case class ThetaUnion(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 16)

  override def children: Seq[Expression] = child :: Nil
  override def inputTypes =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnion =
    copy(child = c.head)
}

object ThetaSketch {

  def theta_sketch(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaSketch(org.apache.spark.sql.GraftBridge.expression(c), k)
        .toAggregateExpression())

  def theta_union(sketches: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaUnion(org.apache.spark.sql.GraftBridge.expression(sketches), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a sketch: exact below saturation
    * (the sketch holds every distinct hash), KMV estimator at
    * saturation. Plain Column arithmetic, no UDF.
    */
  /** Mapped-θ quantum: one signed-hash step is 2⁻⁶⁴ of the [0,1)
    * domain, so the smallest legitimately-positive θ is 2⁻⁶⁴ — the
    * divisor clamp that keeps a k-th hash of exactly Long.MinValue
    * (θ→0.0) from producing Infinity.
    */
  private val ThetaQuantum = 5.421010862427522e-20
  /** Estimate cap 2⁶² — far beyond any meaningful distinct count and
    * exactly representable, keeping the final long cast total under
    * ANSI (an uncapped degenerate estimate of (k−1)·2⁶⁴ overflows).
    */
  private val MaxEstimate = 4.611686018427388e18

  def theta_estimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    // signed hash → uniform [0,1): h/2^64 ∈ [−0.5, 0.5), + 0.5
    val kth = greatest(
      element_at(sketch, k).cast("double") / lit(1.8446744073709552E19) + lit(0.5),
      lit(ThetaQuantum))
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(least(lit((k - 1).toDouble) / kth, lit(MaxEstimate)).cast("long"))
  }

  /** Set-INTERSECTION estimate between two sketches — the theta-sketch
    * operation inclusion-exclusion can't give you robustly: restrict
    * both sides to the common θ (the smaller of the two k-th hashes),
    * count shared hashes below it, scale by 1/θ. Below saturation
    * θ = 1 and both sketches are the full hash sets, so the result is
    * the EXACT distinct-intersection count — which is what lets the
    * gated query sit behind DuckDB's INTERSECT oracle.
    */
  def theta_intersect(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val cutRaw = least(
      when(size(a) < k, lit(Long.MaxValue)).otherwise(element_at(a, k)),
      when(size(b) < k, lit(Long.MaxValue)).otherwise(element_at(b, k)))
    val common = size(filter(array_intersect(a, b), h => h < cutRaw)).cast("double")
    // same Long.MinValue → θ=0.0 guard and overflow cap as theta_estimate
    val theta = when(cutRaw === Long.MaxValue, lit(1.0))
      .otherwise(greatest(
        cutRaw.cast("double") / lit(1.8446744073709552E19) + lit(0.5),
        lit(ThetaQuantum)))
    least(common / theta, lit(MaxEstimate)).cast("long")
  }
}
