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

  /** Distinct word n-grams joined by single spaces. Insertion-ordered
    * set so output order is the first-occurrence order (stable,
    * engine-independent given the same word array).
    */
  def wordNGrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val words = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    i = 0
    while (i <= len - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = words(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Sign-random-projection bucket: bit p = sign of ⟨v, planes(p)⟩. */
  def srpBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = v.numElements()
    var code = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0d
      var i = 0
      val m = math.min(dim, plane.length)
      while (i < m) { acc += v.getDouble(i) * plane(i); i += 1 }
      if (acc >= 0) code |= (1L << p)
      p += 1
    }
    code
  }

  /** Multi-probe SRP codes: the main bucket plus `nProbes` perturbed
    * codes, each flipping ONE of the lowest-|margin| bits (the planes
    * the vector sits closest to — exactly the bits most likely to
    * disagree for a true near neighbor). Returns 1 + nProbes longs.
    */
  def srpProbes(v: ArrayData, planes: Array[Array[Double]],
      nProbes: Int): ArrayData = {
    val dim = v.numElements()
    val nP = planes.length
    val margins = new Array[Double](nP)
    var code = 0L
    var p = 0
    while (p < nP) {
      val plane = planes(p)
      var acc = 0.0d
      var i = 0
      val m = math.min(dim, plane.length)
      while (i < m) { acc += v.getDouble(i) * plane(i); i += 1 }
      if (acc >= 0) code |= (1L << p)
      margins(p) = math.abs(acc)
      p += 1
    }
    val q = math.min(nProbes, nP)
    val out = new Array[Long](1 + q)
    out(0) = code
    // selection of the q smallest margins (nP is small: ≤ 64)
    val order = margins.zipWithIndex.sortBy(_._1).map(_._2)
    var j = 0
    while (j < q) { out(j + 1) = code ^ (1L << order(j)); j += 1 }
    new GenericArrayData(out)
  }

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

  /** PQ encode: per subspace j, the id of the L2-nearest codebook
    * centroid to the UNIT vector's subspace block (v/norm — division
    * per element, matching the former column formulation bit-for-bit;
    * ties to the lowest id via strict `<`).
    */
  def pqEncode(v: ArrayData, norm: Double,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cents = cb(j)
      val subd = cents(0).length
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < subd) {
          val t = v.getDouble(off + i) / norm - cent(i)
          d += t * t
          i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best
      off += subd
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Reconstruction norm |û| = sqrt(Σ_j |cb(j)(code_j)|²) from the
    * precomputed per-centroid squared norms (subspaces are orthogonal
    * coordinate blocks). Summation order j = 0..M−1.
    */
  def pqReconNorm(code: ArrayData, nrm2: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    while (j < nrm2.length) {
      s += nrm2(j)(code.getInt(j))
      j += 1
    }
    math.sqrt(s)
  }

  /** Per-query ADC table: tbl(j)(c) = ⟨v/norm restricted to subspace
    * j, cb(j)(c)⟩, left-to-right summation per entry.
    */
  def pqAdcTable(v: ArrayData, norm: Double,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Any](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cents = cb(j)
      val subd = cents(0).length
      val row = new Array[Double](cents.length)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var s = 0.0
        var i = 0
        while (i < subd) {
          s += v.getDouble(off + i) / norm * cent(i)
          i += 1
        }
        row(c) = s
        c += 1
      }
      out(j) = new GenericArrayData(row)
      off += subd
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Top-`p` L2-nearest centroid ids for the UNIT vector (v/norm),
    * ascending by distance, ties to the lower id (repeated strict-<
    * argmin scan — p is tiny). Full-space centroids: the multi-probe
    * cluster assignment of semantic dedup.
    */
  def centroidProbes(v: ArrayData, norm: Double,
      cents: Array[Array[Double]], p: Int): ArrayData = {
    val k = cents.length
    val d = new Array[Double](k)
    val dim = cents(0).length
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val t = v.getDouble(i) / norm - cent(i)
        s += t * t
        i += 1
      }
      d(c) = s
      c += 1
    }
    val pp = if (p < k) p else k
    val out = new Array[Int](pp)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < pp) {
      var best = -1
      var bd = Double.MaxValue
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && d(c2) < bd) { bd = d(c2); best = c2 }
        c2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_j tbl(j)(code_j), order j = 0..M−1 — the quantized
    * dot product, PqM lookups per (query, vector) pair.
    */
  def pqAdc(tbl: ArrayData, code: ArrayData): Double = {
    val m = code.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      s += tbl.getArray(j).getDouble(code.getInt(j))
      j += 1
    }
    s
  }

  /** DEFLATE'd byte length of a UTF-8 string (level 6, raw deflate).
    * The Deflater is allocated per call and `end()`ed — native zlib
    * memory does not ride the GC; a thread-local would save the
    * allocation but leak across Spark's task thread pool.
    */
  def deflateLen(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val in = s.getBytes
    if (in.isEmpty) return 0L
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](math.max(64, in.length / 2))
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
