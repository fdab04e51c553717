package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic k-minimum-values sample as a
  * `TypedImperativeAggregate`: keeps the k items whose md5 is
  * smallest. Unlike reservoir sampling it is ORDER-FREE — any
  * partitioning, any merge order, any cluster size produces the same
  * sample (merge = union, keep k smallest keys) — which is what a
  * training-data pipeline needs from "sample K docs per group for
  * inspection", and what makes it oracle-checkable in any engine with
  * md5. The same structure is the KMV distinct-count sketch; here it
  * is used as the deterministic sampler.
  *
  * Memory is O(k) per group; duplicates of an item collapse (the
  * sample is over the distinct items).
  */
case class KmvSample(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[String, String]]
  with ExpectsInputTypes {

  require(k > 0)

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a wrong-typed column instead of a
  // per-executor ClassCastException mid-job
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeMap[String, String] =
    mutable.TreeMap.empty

  // one digest per task thread — getInstance per row dominates
  // otherwise (update() is called serially within a task)
  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Raw-digest vs hex-key comparison: lets a full buffer REJECT the
    * common case without allocating the 32-char hex string. hex
    * ordering over md5 equals unsigned-byte ordering, so comparing
    * nibble-by-nibble against the stored hex key is exact.
    */
  private def digestBeforeHex(d: Array[Byte], hex: String): Boolean = {
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      val hi = HexChars(b >>> 4); val lo = HexChars(b & 0xf)
      val chi = hex.charAt(2 * i); val clo = hex.charAt(2 * i + 1)
      if (hi != chi) return hi < chi
      if (lo != clo) return lo < clo
      i += 1
    }
    false // equal
  }

  private def insert(buf: mutable.TreeMap[String, String],
      key: String, item: String): Unit = {
    if (buf.contains(key)) () // duplicate item: sample is over distincts
    else if (buf.size < k) buf.update(key, item)
    else if (key < buf.lastKey) { buf.remove(buf.lastKey); buf.update(key, item) }
  }

  override def update(buf: mutable.TreeMap[String, String],
      input: InternalRow): mutable.TreeMap[String, String] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      digest.reset()
      val d = digest.digest(item.getBytes("UTF-8"))
      // full buffer + digest not below the current cut -> no-op
      // (duplicates of retained items hit the TreeMap check below)
      if (buf.size < k || digestBeforeHex(d, buf.lastKey))
        insert(buf, toHex(d), item)
    }
    buf
  }

  override def merge(buf: mutable.TreeMap[String, String],
      other: mutable.TreeMap[String, String]): mutable.TreeMap[String, String] = {
    other.foreach { case (key, item) => insert(buf, key, item) }
    buf
  }

  /** Items in md5 order — a canonical, engine-reproducible ordering. */
  override def eval(buf: mutable.TreeMap[String, String]): Any =
    new GenericArrayData(
      buf.values.map(UTF8String.fromString).toArray.asInstanceOf[Array[AnyRef]])

  override def serialize(buf: mutable.TreeMap[String, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, item) =>
      out.writeUTF(key); out.writeUTF(item)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[String, String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeMap.empty[String, String]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSample =
    copy(child = c.head)
}

object KmvSample {
  /** Column-level entry: deterministic k-minimum-values sample. */
  def kmv_sample(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KmvSample(org.apache.spark.sql.GraftBridge.expression(c), k)
        .toAggregateExpression())
}
