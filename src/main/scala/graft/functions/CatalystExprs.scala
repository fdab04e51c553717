package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot loops the built-in
  * higher-order functions can't run fast.
  *
  * Spark's `transform`/`filter`/`aggregate` are interpreted (no
  * whole-stage codegen) and re-evaluate captured subtrees per element,
  * which turns nested-lambda pipelines (shingle → hash → 128
  * minhashes) into accidental O(n²)+ work. Each expression here
  * evaluates its children once and runs a tight JVM loop — the
  * per-row `eval` call overhead is negligible against that.
  *
  * All hashing uses xxHash64(seed=42) via Spark's own XXH64 so results
  * are consistent with the `xxhash64()` builtin.
  */
object CatalystExprs {

  private val XX = org.apache.spark.sql.catalyst.expressions.XxHash64Function

  /** Distinct word n-grams ("a b c") from an array<string> of words.
    * Codegen: static kernel call inside the fused stage — this is the
    * hottest text-path expression (every shingle consumer reads it),
    * so it must not break whole-stage codegen.
    */
  case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.wordNGrams(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.wordNGrams($c, $n);")
    override protected def withNewChildInternal(c: Expression): WordNGrams = copy(child = c)
  }

  /** xxhash64(seed 42) of every element of an array<string> →
    * array<long>. Codegen: a static kernel call inside the fused
    * stage (see ExprKernels).
    */
  /** Decode-stub media feature kernel — [w, h, f0..f7] from the
    * binary payload in ONE pass ([[ExprKernels.mediaFeatures]]): the
    * `mm_features` hot path as a codegen'd expression instead of a
    * Dataset `mapPartitions` boundary, so the decode stays inside
    * whole-stage codegen with no per-row encoder round-trip.
    */
  case class MediaFeatures(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.mediaFeatures(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.mediaFeatures($c);")
    override protected def withNewChildInternal(c: Expression): MediaFeatures = copy(child = c)
  }

  case class XxHashArray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.xxhashArray(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.xxhashArray($c);")
    override protected def withNewChildInternal(c: Expression): XxHashArray = copy(child = c)
  }

  /** 48-bit md5-prefix hash per array<string> element — the MinHash
    * family's base hash (`conv(substring(md5(s),1,12),16,10)` per
    * element, one tight loop).
    */
  case class Md5PrefixArray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.md5PrefixArray(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.md5PrefixArray($c);")
    override protected def withNewChildInternal(c: Expression): Md5PrefixArray = copy(child = c)
  }

  /** Carter–Wegman MinHash signature over 48-bit md5-prefix shingle
    * hashes: for each permutation (a,b,c), min over hashes h of
    * (a·(h div 2²⁴) + b·(h mod 2²⁴) + c) mod (2³¹−1) — the
    * DuckDB-reproducible recipe (see Dedup.PermCoef), one tight pass
    * for all permutations.
    */
  case class MinHashSigCW(child: Expression, as: Array[Long],
      bs: Array[Long], cs: Array[Long], mod: Long) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.minhashSigCw(input.asInstanceOf[ArrayData], as, bs, cs, mod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // coefficient arrays ride along as compiled-class references
      val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
      val csRef = ctx.addReferenceObj("mhCs", cs, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.minhashSigCw($c, $asRef, $bsRef, $csRef, ${mod}L);")
    }
    override protected def withNewChildInternal(c: Expression): MinHashSigCW = copy(child = c)
  }

  /** Exact string band keys from a minhash signature (the
    * `array_to_string(sig[slice], '-')` the oracle joins on). One
    * pass, replaces `bands` interpreted slice/concat trees per row.
    */
  case class BandKeyStrings(child: Expression, bands: Int, rows: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.bandKeyStrings(input.asInstanceOf[ArrayData], bands, rows)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.bandKeyStrings($c, $bands, $rows);")
    override protected def withNewChildInternal(c: Expression): BandKeyStrings = copy(child = c)
  }

  /** LSH band keys from a minhash signature: key b = xxhash64 fold of
    * rows [b·rows, (b+1)·rows). One pass, replaces 16 interpreted
    * slice/transform/concat trees per row.
    */
  case class BandKeys(child: Expression, bands: Int, rows: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.bandKeys(input.asInstanceOf[ArrayData], bands, rows)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.bandKeys($c, $bands, $rows);")
    override protected def withNewChildInternal(c: Expression): BandKeys = copy(child = c)
  }

  /** 64-bit SimHash from an array<long> of token hashes: bit j set
    * when ≥ half the tokens have bit j set.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        ExprKernels.simhash64(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.simhash64($c);")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Greedy MMR selection over one query's bounded candidate pool
    * (see ExprKernels.mmrPick): child is a struct of five aligned
    * arrays (ids, rels, da, db, sim); returns the picked ids in
    * selection order. The whole k-round greedy loop runs in ONE
    * kernel call inside the fused stage — the join-cascade
    * formulation cost a full shuffle round per pick.
    */
  case class MmrPick(child: Expression, lam: Double, lamBar: Double,
      k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.mmrPick(
        input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
        lam, lamBar, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.mmrPick($c, $lam, $lamBar, $k);")
    override protected def withNewChildInternal(c: Expression): MmrPick =
      copy(child = c)
  }

  /** Dot product of two array<double>, left-to-right summation —
    * bit-identical to `aggregate(zip_with(a,b,*), 0.0, +)` and to
    * DuckDB's sequential list arithmetic (keeps the ANN oracle green).
    *
    * Implements `doGenCode`, so unlike the HOF formulation it runs
    * INSIDE whole-stage codegen — the loop compiles into the fused
    * stage with no per-row boxing.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val m = math.min(a.numElements(), b.numElements())
      var acc = 0.0d
      var i = 0
      while (i < m) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      java.lang.Double.valueOf(acc)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** Sign-random-projection bucket: bit p of the result is the sign of
    * ⟨v, plane_p⟩ for a fixed seeded plane matrix. Codegen: the plane
    * matrix rides along as a compiled-class reference and the loop is
    * a static kernel call inside the fused stage.
    */
  case class SrpBucket(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        ExprKernels.srpBucket(input.asInstanceOf[ArrayData], planes))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.srpBucket($c, $planesRef);")
    }
    override protected def withNewChildInternal(c: Expression): SrpBucket = copy(child = c)
  }

  /** DEFLATE'd length of a string — the compression-ratio quality
    * signal (Gopher/Dolma-style: templated/repetitive text compresses
    * far below prose). zlib output is JVM-stable but not something
    * DuckDB can reproduce, so consumers are rows-gated with invariant
    * specs (the xxhash64 family's regime). Codegen: one static kernel
    * call, stays inside the fused stage.
    */
  case class DeflateLen(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(ExprKernels.deflateLen(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.deflateLen($c);")
    override protected def withNewChildInternal(c: Expression): DeflateLen =
      copy(child = c)
  }

  /** CDC cut positions (array<int>) of a document — the
    * content-defined-chunking boundary scan ([[ExprKernels.cdcCuts]]):
    * one tight digest loop replacing the interpreted
    * filter(sequence(…)) lambda that evaluated an md5 + hex-conv per
    * character position. Codegen: one static kernel call, stays
    * inside the fused stage.
    */
  case class CdcCuts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.cdcCuts(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.cdcCuts($c);")
    override protected def withNewChildInternal(c: Expression): CdcCuts =
      copy(child = c)
  }

  /** Gopher repetition counts (array<long> [top2, total2, dup5,
    * total5]) over a whitespace token array
    * ([[ExprKernels.gramStats]]): one tight per-document loop
    * replacing the explode + two shuffled aggregations of the HOF
    * form — every statistic is per-document, so nothing needs to
    * leave the row. Codegen: one static kernel call, stays inside
    * the fused stage.
    */
  case class GramStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.gramStats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.gramStats($c);")
    override protected def withNewChildInternal(c: Expression): GramStats =
      copy(child = c)
  }

  /** Unordered pairs (a < b) of a sorted-distinct long array
    * ([[ExprKernels.sortedPairs]]) — the basket pair expansion as one
    * codegen'd kernel call.
    */
  case class SortedPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.sortedPairs(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.sortedPairs($c);")
    override protected def withNewChildInternal(c: Expression): SortedPairs =
      copy(child = c)
  }

  /** Multi-probe SRP: array of 1 + nProbes bucket codes — the main
    * code plus single-bit flips of the lowest-|margin| planes
    * (Lv et al., "Multi-Probe LSH", VLDB'07, adapted to sign random
    * projections). Probing neighbor buckets buys recall WITHOUT
    * adding hash families, so the same recall needs fewer bands —
    * i.e. fewer shuffle keys per vector on the 100 TB dedup path.
    */
  case class SrpProbes(child: Expression, planes: Array[Array[Double]],
      nProbes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      ExprKernels.srpProbes(input.asInstanceOf[ArrayData], planes, nProbes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.srpProbes($c, $planesRef, $nProbes);")
    }
    override protected def withNewChildInternal(c: Expression): SrpProbes = copy(child = c)
  }

  /** PQ encode (vector, norm) → array<int> of per-subspace centroid
    * ids. The codebook rides along as a compiled-class reference; the
    * nearest-centroid scan is a static kernel call inside the fused
    * stage — the corpus-side hot path of `ann_pq`, formerly an
    * interpreted nested-HOF tree.
    */
  case class PqEncode(left: Expression, right: Expression,
      cb: Array[Array[Array[Double]]]) extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any, n: Any): Any =
      ExprKernels.pqEncode(v.asInstanceOf[ArrayData],
        n.asInstanceOf[Double], cb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
      nullSafeCodeGen(ctx, ev, (v, n) =>
        s"${ev.value} = graft.functions.ExprKernels.pqEncode($v, $n, $cbRef);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(left = l, right = r)
  }

  /** PQ reconstruction norm from a code array and the per-centroid
    * squared-norm table.
    */
  case class PqReconNorm(child: Expression, nrm2: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      java.lang.Double.valueOf(
        ExprKernels.pqReconNorm(input.asInstanceOf[ArrayData], nrm2))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val nrm2Ref = ctx.addReferenceObj("pqNrm2", nrm2, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ExprKernels.pqReconNorm($c, $nrm2Ref);")
    }
    override protected def withNewChildInternal(c: Expression): PqReconNorm =
      copy(child = c)
  }

  /** Per-query ADC lookup table (vector, norm) → array<array<double>>
    * of ⟨q̂_sub_j, cb(j)(c)⟩ — query-side, one row per query.
    */
  case class PqAdcTable(left: Expression, right: Expression,
      cb: Array[Array[Array[Double]]]) extends BinaryExpression {
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def nullSafeEval(v: Any, n: Any): Any =
      ExprKernels.pqAdcTable(v.asInstanceOf[ArrayData],
        n.asInstanceOf[Double], cb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
      nullSafeCodeGen(ctx, ev, (v, n) =>
        s"${ev.value} = graft.functions.ExprKernels.pqAdcTable($v, $n, $cbRef);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcTable =
      copy(left = l, right = r)
  }

  /** Multi-probe centroid assignment (vector, norm) → array<int> of
    * the `probes` nearest full-space centroid ids, nearest first.
    */
  case class CentroidProbes(left: Expression, right: Expression,
      cents: Array[Array[Double]], probes: Int) extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any, n: Any): Any =
      ExprKernels.centroidProbes(v.asInstanceOf[ArrayData],
        n.asInstanceOf[Double], cents, probes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("semCents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, (v, n) =>
        s"${ev.value} = graft.functions.ExprKernels.centroidProbes($v, $n, $centsRef, $probes);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidProbes =
      copy(left = l, right = r)
  }

  /** ADC score (table, code) → Σ_j tbl(j)(code_j) — the per-pair hot
    * loop of the `ann_pq` approximate cut.
    */
  case class PqAdc(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(t: Any, c: Any): Any =
      java.lang.Double.valueOf(
        ExprKernels.pqAdc(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, c) =>
        s"${ev.value} = graft.functions.ExprKernels.pqAdc($t, $c);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(left = l, right = r)
  }

  // ---- Column-level wrappers -----------------------------------------

  private def asCol(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)

  def word_ngrams(words: Column, n: Int): Column =
    asCol(WordNGrams(expression(words), n))
  def xxhash_array(arr: Column): Column =
    asCol(XxHashArray(expression(arr)))
  def media_features(payload: Column): Column =
    asCol(MediaFeatures(expression(payload)))
  def md5_prefix_array(arr: Column): Column =
    asCol(Md5PrefixArray(expression(arr)))
  def minhash_sig_cw(hashes: Column, as: Array[Long], bs: Array[Long],
      cs: Array[Long], mod: Long): Column =
    asCol(MinHashSigCW(expression(hashes), as, bs, cs, mod))
  def band_keys(sig: Column, bands: Int, rows: Int): Column =
    asCol(BandKeys(expression(sig), bands, rows))
  def band_key_strings(sig: Column, bands: Int, rows: Int): Column =
    asCol(BandKeyStrings(expression(sig), bands, rows))
  def simhash64(hashes: Column): Column =
    asCol(SimHash64(expression(hashes)))
  def cdc_cuts(text: Column): Column =
    asCol(CdcCuts(expression(text)))
  def gram_stats(words: Column): Column =
    asCol(GramStats(expression(words)))
  def sorted_pairs(arr: Column): Column =
    asCol(SortedPairs(expression(arr)))
  def dot_product(a: Column, b: Column): Column =
    asCol(DotProduct(expression(a), expression(b)))
  def mmr_pick(packed: Column, lam: Double, lamBar: Double, k: Int): Column =
    asCol(MmrPick(expression(packed), lam, lamBar, k))
  def srp_bucket(v: Column, planes: Array[Array[Double]]): Column =
    asCol(SrpBucket(expression(v), planes))
  def srp_probes(v: Column, planes: Array[Array[Double]], nProbes: Int): Column =
    asCol(SrpProbes(expression(v), planes, nProbes))
  def pq_encode(v: Column, norm: Column, cb: Array[Array[Array[Double]]]): Column =
    asCol(PqEncode(expression(v), expression(norm), cb))
  def pq_recon_norm(code: Column, nrm2: Array[Array[Double]]): Column =
    asCol(PqReconNorm(expression(code), nrm2))
  def pq_adc_table(v: Column, norm: Column, cb: Array[Array[Array[Double]]]): Column =
    asCol(PqAdcTable(expression(v), expression(norm), cb))
  def pq_adc(tbl: Column, code: Column): Column =
    asCol(PqAdc(expression(tbl), expression(code)))
  def centroid_probes(v: Column, norm: Column, cents: Array[Array[Double]],
      probes: Int): Column =
    asCol(CentroidProbes(expression(v), expression(norm), cents, probes))

  def deflate_len(s: Column): Column =
    asCol(DeflateLen(expression(s)))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)
}
