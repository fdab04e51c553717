package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a `TypedImperativeAggregate` — mergeable (bitwise
  * OR), fixed O(numBits) memory per group, the membership sketch that
  * makes APPROXIMATE JOINS cheap: build the filter over the small
  * side's keys, broadcast the bit array, and prune the big side
  * BEFORE it reaches any shuffle. Guarantees no false negatives
  * (every true member passes), so a bloom-pruned semi join followed
  * by an exact confirm join is EXACTLY the plain semi join — which is
  * what lets the whole path sit behind a DuckDB oracle.
  *
  * Hash family: `numHashes` affine functions over the folded xxhash64
  * of the item — the SAME family construction as Count-Min
  * (`CountMinSketch.coefficients`), shared so the aggregate's update
  * path and the pure-Column `bloom_might_contain` prober cannot drift
  * (drift would mean false negatives, violating the core invariant).
  * Fully deterministic: identical across runs, partitionings, and
  * cluster layouts.
  */
case class BloomFilter(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0)

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a wrong-typed column instead of a
  // per-executor ClassCastException mid-job
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val coeffs: Array[(Long, Long)] =
    CountMinSketch.coefficients(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v.asInstanceOf[UTF8String], StringType, 42L) & 0xFFFFFFFFL
      var d = 0
      while (d < numHashes) {
        val (a, b) = coeffs(d)
        val pos = (((a * h + b) % CountMinSketch.P) % numBits).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilter =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilter =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilter =
    copy(child = c.head)
}

object BloomFilter {

  /** Column-level entry: Bloom filter aggregate over a string column →
    * array<long> of numBits/64 words.
    */
  def bloom_filter(c: Column, numBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BloomFilter(org.apache.spark.sql.GraftBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a sketch produced by `bloom_filter` —
    * true iff every hash's bit is set. Plain Column arithmetic (no
    * UDF, stays in whole-stage codegen): the same affine hashes are
    * evaluated via the xxhash64 builtin, so a member can NEVER probe
    * false (the no-false-negative invariant the exact-confirm join
    * leans on).
    */
  def bloom_might_contain(bloom: Column, item: Column,
      numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    val h = xxhash64(item).bitwiseAND(lit(0xFFFFFFFFL))
    CountMinSketch.coefficients(numHashes).map { case (a, b) =>
      val pos = pmod(h * a + b, lit(CountMinSketch.P)) % numBits
      val word = element_at(bloom, (pos / 64 + 1).cast("int"))
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
