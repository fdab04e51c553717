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

  /** `mm_features` decode kernel over the raw binary payload — ONE
    * pass emits [width, height, f0..f7]: width/height from the
    * first/last byte (`(b & 0x7f) + 1`, 1 for an empty payload), the
    * 8 features as stride-sampled signed bytes / 128
    * (Multimodal.decodeStub's contract, spec-pinned equal). Packed as
    * one array so the projection splits it without re-decoding; a
    * real image codec slots in here unchanged.
    */
  def mediaFeatures(payload: Array[Byte]): ArrayData = {
    val out = new Array[Double](10)
    val n = payload.length
    out(0) = (if (n == 0) 0 else payload(0) & 0x7f) + 1.0
    out(1) = (if (n == 0) 0 else payload(n - 1) & 0x7f) + 1.0
    if (n > 0) {
      var i = 0
      while (i < 8) {
        out(2 + i) = payload(i * n / 8).toDouble / 128.0
        i += 1
      }
    }
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

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Greedy MMR selection over one query's bounded candidate pool:
    * input row carries five aligned arrays — candidate (ids, rels)
    * and pairwise (da, db, sim) in CANDIDATE-FIRST division order
    * (sim(d, s) ≠ sim(s, d) in the last ulp; both orientations are
    * present and the lookup always reads (candidate, selected)).
    * Pick 1 is argmax rel; each later pick is argmax
    * lam·rel − lamBar·max_{s∈selected} sim(d, s); all ties break on
    * the smaller vec_id via a strict-> scan in id-sorted order.
    * Returns the picked ids in selection order. Input order of the
    * collect_list'ed arrays is irrelevant: candidates are scanned
    * id-sorted and max over selected is order-free, so the result is
    * deterministic and replays in the oracle's unrolled CTE rounds.
    */
  def mmrPick(row: org.apache.spark.sql.catalyst.InternalRow,
      lam: Double, lamBar: Double, k: Int): ArrayData = {
    val ids = row.getArray(0)
    val rels = row.getArray(1)
    val da = row.getArray(2)
    val db = row.getArray(3)
    val sim = row.getArray(4)
    val n = ids.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val idArr = Array.tabulate(n)(ids.getLong)
    val relArr = Array.tabulate(n)(rels.getDouble)
    // scan candidates in vec_id order so a strict > keeps the
    // smallest id among ties
    val order = Array.range(0, n).sortBy(idArr)
    val pos = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var i = 0
    while (i < n) { pos.put(idArr(i), i); i += 1 }
    val m = new Array[Double](n * n)
    java.util.Arrays.fill(m, Double.NegativeInfinity)
    var t = 0
    val nSim = da.numElements()
    while (t < nSim) {
      val pa = pos.get(da.getLong(t))
      val pb = pos.get(db.getLong(t))
      if (pa != null && pb != null) m(pa * n + pb) = sim.getDouble(t)
      t += 1
    }
    val selected = new Array[Int](math.min(k, n))
    val taken = new Array[Boolean](n)
    var round = 0
    while (round < selected.length) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var o = 0
      while (o < n) {
        val c = order(o)
        if (!taken(c)) {
          var score = 0.0d
          if (round == 0) score = relArr(c)
          else {
            var ms = Double.NegativeInfinity
            var s = 0
            while (s < round) {
              val v = m(c * n + selected(s))
              if (v > ms) ms = v
              s += 1
            }
            score = lam * relArr(c) - lamBar * ms
          }
          if (score > bestScore) { bestScore = score; bestIdx = c }
        }
        o += 1
      }
      if (bestIdx < 0) {
        // every remaining candidate scored NaN (strict > never
        // fires) — truncate the selection rather than indexing -1
        return new GenericArrayData(
          selected.take(round).map(idArr(_)))
      }
      selected(round) = bestIdx
      taken(bestIdx) = true
      round += 1
    }
    new GenericArrayData(selected.map(idArr(_)))
  }

  /** First 32 md5 bits of a string as a unit-interval double:
    * uint32(md5(s)[0..3]) / 2³². The numerator is a 32-bit integer
    * and the divisor a power of two, so the double is EXACT and
    * DuckDB's `CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) /
    * 4294967296.0` reproduces it bit-for-bit — the driver-side
    * generator behind the SRP hyperplane family.
    */
  def md5Unit32(s: String): Double = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u.toDouble / 4294967296.0
  }

  /** 48-bit md5-prefix hash of every element of an array<string> →
    * array<long>: the first 6 digest bytes as an unsigned big-endian
    * value — EXACTLY `conv(substring(md5(s), 1, 12), 16, 10)`, the
    * form the DuckDB oracle computes — in one tight loop (the
    * `transform` HOF formulation runs interpreted per element).
    */
  def md5PrefixArray(arr: ArrayData): ArrayData = {
    val md = Md5.get()
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Carter–Wegman MinHash over 48-bit md5-prefix hashes — the
    * DuckDB-reproducible family (Dedup.PermCoef recipe): the hash
    * splits into 24-bit halves so every a·hi + b·lo + c term stays
    * < 2^56 (overflow-free in BIGINT on both engines) and the sum
    * genuinely wraps the 2^31−1 modulus. One pass computes all
    * permutation minima; the halves are extracted once per shingle,
    * not once per permutation.
    */
  def minhashSigCw(arr: ArrayData, as: Array[Long], bs: Array[Long],
      cs: Array[Long], mod: Long): ArrayData = {
    val m = arr.numElements()
    val hi = new Array[Long](m)
    val lo = new Array[Long](m)
    var i = 0
    while (i < m) {
      val h = arr.getLong(i)
      hi(i) = h >> 24
      lo(i) = h % 16777216L
      i += 1
    }
    val out = new Array[Long](as.length)
    var p = 0
    while (p < as.length) {
      var mn = Long.MaxValue
      var k = 0
      while (k < m) {
        val v = (as(p) * hi(k) + bs(p) * lo(k) + cs(p)) % mod
        if (v < mn) mn = v
        k += 1
      }
      out(p) = if (m == 0) 0L else mn
      p += 1
    }
    new GenericArrayData(out)
  }

  /** EXACT band keys: band b = the '-'-joined string of signature
    * rows [b·rows, (b+1)·rows) — `array_to_string(sig[..], '-')` in
    * DuckDB, which is what keeps band agreement (and with it the
    * candidate SET) oracle-reproducible, unlike the xxhash64 fold of
    * `bandKeys` (faster keys, but a collision would surface a
    * candidate no oracle can predict).
    */
  def bandKeyStrings(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(rows * 11)
      var k = 0
      while (k < rows) {
        if (k > 0) sb.append('-')
        sb.append(sig.getLong(b * rows + k))
        k += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
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

  /** CDC cut positions of a document — EXACTLY the HOF formulation
    * `filter(sequence(8, greatest(n, 8)), i -> i < n AND
    *   conv(substring(md5(substring(text, i-7, 8)), 1, 6), 16, 10)
    *     % 64 = 0)`
    * the oracle replays: 1-based CHARACTER positions i in [8, n)
    * where the first six hex digits of md5(text[i−7..i]) are ≡ 0
    * (mod 64) — equivalently, the low 6 bits of the digest's THIRD
    * byte are zero (the 24-bit hex prefix mod 64 is its last 6
    * bits). The HOF form materializes an n-int sequence and runs an
    * interpreted lambda (substring alloc + hex string + conv parse)
    * per character; this kernel is one tight loop with a reused
    * ThreadLocal digest. Pure-ASCII documents (the common case —
    * byte count == char count) slide a window over the raw byte
    * array with zero copies; multi-byte documents fall back to
    * per-window codepoint slicing, same result.
    */
  def cdcCuts(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val md = Md5.get()
    val n = s.numChars()
    val out = new java.util.ArrayList[Integer]()
    if (s.numBytes() == n) {
      // ASCII fast path: chars are bytes, windows are byte slices
      val bytes = s.getBytes
      var i = 8
      while (i < n) {
        md.reset()
        md.update(bytes, i - 8, 8)
        if ((md.digest()(2) & 0x3f) == 0) out.add(i)
        i += 1
      }
    } else {
      var i = 8
      while (i < n) {
        md.reset()
        val d = md.digest(s.substringSQL(i - 7, 8).getBytes)
        if ((d(2) & 0x3f) == 0) out.add(i)
        i += 1
      }
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Gopher repetition counts over the whitespace token array in ONE
    * tight pass — [top-2-gram count, total 2-gram occurrences,
    * duplicated-5-gram occurrence count, total 5-gram occurrences].
    * Replaces the explode(transform(sequence…array_join(slice…))) +
    * two shuffled aggregations pipeline: every count is per-DOCUMENT,
    * so nothing ever needed to leave the row. Gram identity is the
    * space-joined token run, exactly the HOF form's `array_join(slice
    * (w,i,n),' ')` — tokens are whitespace-split so the join is
    * injective and UTF8String equality ≡ joined-string equality.
    */
  def gramStats(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val out = new Array[Long](4)
    if (len >= 2) {
      val words = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var i = 0
      while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
      val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      def count(n: Int): java.util.HashMap[
          org.apache.spark.unsafe.types.UTF8String, Array[Int]] = {
        val m = new java.util.HashMap[
          org.apache.spark.unsafe.types.UTF8String, Array[Int]]()
        var i = 0
        while (i <= len - n) {
          val parts =
            new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = words(i + j)
            if (j < n - 1) parts(2 * j + 1) = space
            j += 1
          }
          val key = org.apache.spark.unsafe.types.UTF8String.concat(parts: _*)
          val c = m.get(key)
          if (c == null) m.put(key, Array(1)) else c(0) += 1
          i += 1
        }
        m
      }
      val two = count(2)
      var top2 = 0L
      val it2 = two.values().iterator()
      while (it2.hasNext) { val c = it2.next()(0); if (c > top2) top2 = c }
      out(0) = top2
      out(1) = (len - 1).toLong
      if (len >= 5) {
        val five = count(5)
        var dup5 = 0L
        val it5 = five.values().iterator()
        while (it5.hasNext) { val c = it5.next()(0); if (c >= 2) dup5 += c }
        out(2) = dup5
        out(3) = (len - 4).toLong
      }
    }
    new GenericArrayData(out)
  }

  /** All unordered pairs (a < b) of a SORTED-DISTINCT long array as
    * array<struct<a,b>> — the basket pair expansion done map-side in
    * one tight loop instead of a self-join of the order-part
    * incidence with itself (two extra scans + exchanges of the
    * corpus-sized incidence; the blowup is Σ (basket choose 2) either
    * way, bounded by lines-per-order).
    */
  def sortedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a, arr.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
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
