package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a `TypedImperativeAggregate` — mergeable
  * (elementwise sum), fixed O(depth × width) memory per group, the
  * standard sketch for per-key frequency estimation when the key space
  * is too large to count exactly.
  *
  * Estimates never undercount; overcount is bounded by ≈ 2N/width with
  * probability 1 − (1/2)^depth. With `width` well above the distinct
  * key count, collisions are improbable and estimates are exact — the
  * spec pins both regimes (exactness on a small vocabulary; the
  * never-undercount invariant always).
  *
  * Hash family: depth affine functions over xxhash64 of the item
  * bytes, same construction as the MinHash permutations
  * (CatalystExprs.minhash_sig) — deterministic across runs and
  * cluster layouts.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  require(depth > 0 && width > 0)

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a wrong-typed column instead of a
  // per-executor ClassCastException mid-job
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val coeffs: Array[(Long, Long)] =
    CountMinSketch.coefficients(depth)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  private def cells(item: UTF8String): Array[Int] = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(item, StringType, 42L) & 0xFFFFFFFFL // fold into 2^32 domain
    val out = new Array[Int](depth)
    var d = 0
    while (d < depth) {
      val (a, b) = coeffs(d)
      out(d) = (((a * h + b) % CountMinSketch.P) % width).toInt
      d += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val cs = cells(v.asInstanceOf[UTF8String])
      var d = 0
      while (d < depth) { buf(d * width + cs(d)) += 1; d += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinSketch =
    copy(child = c.head)
}

object CountMinSketch {
  /** 2^32-domain prime, same family construction as MinHash. */
  val P = 4294967311L

  /** THE hash family — the aggregate's update path and the Column
    * estimator both derive their (a,b) pairs from here, so the two
    * sides cannot drift (drift would mean silent undercounting,
    * violating the sketch's core invariant).
    */
  def coefficients(depth: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(1234567)
    Array.fill(depth)((1L + rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Column-level entry: Count-Min sketch aggregate over a string
    * column → flat array<long> of depth×width counters.
    */
  def count_min(c: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CountMinSketch(org.apache.spark.sql.GraftBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Point estimate for an item from a sketch produced by
    * `count_min` — min over the depth rows. Plain Column arithmetic
    * (no UDF): the same affine hashes are evaluated via xxhash64.
    */
  def cms_estimate(sketch: Column, item: Column,
      depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val ests = coefficients(depth).zipWithIndex.map { case ((a, b), d) =>
      val h = pmod(xxhash64(item).bitwiseAND(lit(0xFFFFFFFFL)) * a + b, lit(P)) % width
      element_at(sketch, (lit(d * width) + h + 1).cast("int"))
    }
    least(ests.toSeq: _*)
  }
}
