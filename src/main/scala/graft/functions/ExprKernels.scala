package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType

/** JVM kernels shared by the custom expressions' interpreted `eval`
  * AND their generated code: `doGenCode` emits a plain static call to
  * these (via the object's static forwarders), so the expressions stay
  * inside whole-stage codegen — no interpreted-eval row boundary, no
  * boxing — while the loop itself lives in ordinary reviewed Scala
  * instead of Java-in-a-string.
  */
object ExprKernels {

  private val XX = org.apache.spark.sql.catalyst.expressions.XxHash64Function

  def xxhashArray(arr: ArrayData): ArrayData = {
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = XX.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long],
      prime: Long): ArrayData = {
    val m = arr.numElements()
    val ids = new Array[Long](m)
    var i = 0
    while (i < m) {
      ids(i) = arr.getLong(i) & 0xFFFFFFFFL // fold into 2^32 domain
      i += 1
    }
    val out = new Array[Long](as.length)
    var p = 0
    while (p < as.length) {
      var mn = Long.MaxValue
      var k = 0
      while (k < m) {
        val h = (as(p) * ids(k) + bs(p)) % prime
        if (h < mn) mn = h
        k += 1
      }
      out(p) = if (m == 0) 0L else mn
      p += 1
    }
    new GenericArrayData(out)
  }

  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var k = 0
      while (k < rows) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig.getLong(b * rows + k), h)
        k += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhash64(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 >= m) out |= (1L << j)
      j += 1
    }
    out
  }
}
