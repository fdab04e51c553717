package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY §2.F): media as opaque `binary`
  * columns with typed metadata, batch-wise feature extraction.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything around it — schema,
  * binary handling, partition-wise batching, feature vector shape — is
  * real and is what matters for the 100 TB design (binary payloads
  * never leave the executor; only small feature rows shuffle).
  */
object Multimodal {

  /** A "media" view over documents: payload = UTF-8 bytes standing in
    * for an image blob. On a real corpus this column is the raw file
    * bytes column of a parquet/LanceDB-style media table.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Typed metadata straight off the binary column — byte length and
    * a magic-byte sniff (what a format dispatcher keys on).
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"))

  val FrameBytes = 32

  /** Frame sampling: the binary payload split into fixed 32-byte
    * frames (the video-frame / audio-window batch shape), one row per
    * frame with its hex fingerprint. All arithmetic on the binary
    * column itself — at scale the payload never round-trips through
    * strings except for the emitted fingerprint.
    */
  def frames(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"),
        ceil(length(col("payload")) / lit(FrameBytes.toDouble))
          .cast("long").as("n_frames"))
      // empty payload ⇒ n_frames = 0 and sequence(0, -1) would emit the
      // descending [0, -1] — guard so zero-frame rows produce no frames
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_hex",
        hex(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")))
      .select("doc_id", "frame_idx", "n_frames", "frame_hex")

  /** VOICE-ACTIVITY / SILENCE SEGMENTATION over the frame stream
    * (`mm_vad`) — the audio-preprocessing step every speech pipeline
    * runs before transcription (skip silent windows, bill only
    * speech): per frame an ENERGY score (here the stub byte-sum over
    * the 32-byte window — the §2.F decode-stub convention; a real
    * corpus plugs RMS of decoded PCM into the same shape), silence =
    * energy below the threshold, and per item the silent-frame count
    * plus the LONGEST silent run via gaps-and-islands (frame_idx −
    * silent-rank is constant within a run — the q_sequence_match
    * discipline) inside PER-MEDIA windows bounded by frames-per-item.
    * speech_ratio is one integer division, rounded 6.
    */
  def vad(spark: SparkSession, sfDir: String, tau: Long = 3100)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = frames(spark, sfDir)
      // the LAST frame of a payload that is not a 32-multiple is
      // short: fold only over the bytes the frame actually has
      .withColumn("energy", expr(
        """aggregate(
          |  transform(sequence(0, CAST(length(frame_hex) / 2 AS INT) - 1),
          |    i -> CAST(conv(substring(frame_hex, i * 2 + 1, 2), 16, 10)
          |      AS BIGINT)),
          |  0L, (a, x) -> a + x)""".stripMargin.trim))
      .withColumn("silent", col("energy") < tau)
    val silentRuns = fr.filter(col("silent"))
      .withColumn("isl", col("frame_idx") -
        row_number().over(Window.partitionBy("doc_id")
          .orderBy("frame_idx")))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(max(col("run")).as("longest_silence"),
        sum(col("run")).as("n_silent"))
    fr.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .join(silentRuns, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        coalesce(col("longest_silence"), lit(0L)).as("longest_silence"),
        round((col("n_frames") - coalesce(col("n_silent"), lit(0L)))
          .cast("double") / col("n_frames").cast("double"), 6)
          .as("speech_ratio"))
  }

  /** Chunk-level media dedup: two payloads are near-dups when they
    * share ≥ `minShared` distinct fixed-size frames. The join keys on
    * the frame fingerprint — a linear keyed shuffle, no pairwise
    * compare — the standard content-chunking dedup shape for
    * video/audio corpora. Ultra-frequent frames (boilerplate chunks)
    * are dropped first, exactly like stop-shingles in text LSH:
    * without the cap one hot chunk makes the self-join quadratic.
    */
  def frameDup(spark: SparkSession, sfDir: String,
      minShared: Int = 3, maxDf: Int = 100): DataFrame = {
    val fr = frames(spark, sfDir)
      .select(col("doc_id"), col("frame_hex")).distinct()
    val rare = fr.groupBy("frame_hex")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("frame_hex")
    val keyed = fr.join(rare, "frame_hex")
    keyed.as("a").join(keyed.as("b"),
        col("a.frame_hex") === col("b.frame_hex")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** MEDIA QUALITY GATE — curation verdicts for the media family,
    * mirroring what `text_quality` does for text: per-item byte-size
    * bounds (truncated uploads below, unsampled blobs above) and a
    * within-item FRAME-DUPLICATION ratio (a video that is mostly one
    * repeated frame is a still card / corrupt encode — the media twin
    * of the Gopher repetition rules), each emitted as its own column
    * plus the composite keep verdict so downstream curation can
    * ablate rules individually.
    *
    * Scale shape: size rules are scan-side projections; the dup
    * ratio is one partial-aggregated distinct per item over the
    * frame stream — no cross-item state at all (the cross-item twin
    * is [[frameDup]]). The corpus never exhibits within-item frame
    * repeats, so that rule is pinned by a planted spec, exactly like
    * the LM OOV path.
    */
  def qualityGate(spark: SparkSession, sfDir: String,
      minBytes: Long = 64, maxBytes: Long = 480,
      maxDupRatio: Double = 0.5): DataFrame =
    qualityGateOver(mediaTable(spark, sfDir), minBytes, maxBytes,
      maxDupRatio)

  /** Same gate over any (doc_id, payload) frame (planted specs). */
  private[graft] def qualityGateOver(media: DataFrame, minBytes: Long,
      maxBytes: Long, maxDupRatio: Double): DataFrame = {
    val fr = media
      .select(col("doc_id"), col("payload"),
        ceil(length(col("payload")) / lit(FrameBytes.toDouble))
          .cast("long").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"),
        col("payload"))
      .withColumn("frame_hex",
        hex(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")))
      .groupBy("doc_id")
      .agg(min(col("n_frames")).as("n_frames"),
        countDistinct(col("frame_hex")).as("n_distinct"))
    media
      .select(col("doc_id"), length(col("payload")).cast("long")
        .as("n_bytes"))
      .join(fr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bytes"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .withColumn("dup_ratio",
        when(col("n_frames") > 0,
          round(lit(1.0) - col("n_distinct").cast("double")
            / col("n_frames").cast("double"), 6)).otherwise(lit(1.0)))
      .withColumn("keep",
        col("n_bytes") >= minBytes && col("n_bytes") <= maxBytes &&
          col("dup_ratio") <= maxDupRatio)
  }

  /** STUB decode — the REFERENCE implementation of the kernel
    * contract ([[graft.functions.ExprKernels.mediaFeatures]] is the
    * codegen-resident twin; a spec pins them equal). A real
    * deployment swaps an image codec into the kernel; the fake is
    * deterministic on the payload bytes so tests are stable.
    */
  private[graft] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val w = 1 + (payload.headOption.getOrElse(0: Byte) & 0x7f)
    val h = 1 + (payload.lastOption.getOrElse(0: Byte) & 0x7f)
    val feats = Array.tabulate(8) { i =>
      if (payload.isEmpty) 0.0
      else payload(i * payload.length / 8).toDouble / 128.0
    }
    (w, h, feats)
  }

  /** Feature extraction over media payloads — the decode kernel as a
    * CODEGEN'D EXPRESSION ([[graft.functions.CatalystExprs.media_features]]):
    * one pass emits the packed [w, h, f0..f7] array inside whole-stage
    * codegen, and the projection splits it into the flat scalar schema
    * every engine (and the driver's pandas sort) can order and hash.
    * This replaced the earlier `Dataset.mapPartitions` plumbing — same
    * kernel contract ([[decodeStub]], spec-pinned equal), but no
    * encoder round-trip per media item and no codegen fence around the
    * decode; a real image codec slots into the kernel unchanged.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        graft.functions.CatalystExprs.media_features(col("payload"))
          .as("wf"))
      .select(
        Seq(col("doc_id"), col("n_bytes"),
          col("wf")(0).cast("int").as("width"),
          col("wf")(1).cast("int").as("height")) ++
          (0 until 8).map(i => col("wf")(i + 2).as(s"f$i")): _*)

  /** Aspect-preserving resize PLANNING — the dims/letterbox math that
    * fronts every image-normalization stage (fit the decoded w×h into
    * a `target`² box, longer edge = target, shorter edge scaled and
    * padded). The decoded dims use the same first-byte/last-byte stub
    * rule as `decodeStub` but expressed in codegen'd column functions
    * (`(byte & 0x7f) + 1` = `% 128 + 1` on the hex-decoded byte), so
    * the whole plan — decode, fit, pad, and the deterministic
    * resized-payload signature standing in for the resampler — is one
    * shuffle-free projection the DuckDB oracle replays byte-for-byte.
    * The real resampler slots into the signature column's place
    * per-partition exactly like `features`' codec stub.
    */
  def resizePlan(spark: SparkSession, sfDir: String,
      target: Int = 64): DataFrame = {
    val firstByte = conv(hex(substring(col("payload"), 1, 1)), 16, 10)
      .cast("long")
    val lastByte = conv(hex(expr(
      "substring(payload, length(payload), 1)")), 16, 10).cast("long")
    mediaTable(spark, sfDir)
      .filter(length(col("payload")) >= 1)
      .select(col("doc_id"), col("payload"),
        (firstByte % 128 + 1).as("w0"), (lastByte % 128 + 1).as("h0"))
      .withColumn("mx", greatest(col("w0"), col("h0")))
      .select(col("doc_id"), col("w0"), col("h0"),
        greatest(lit(1L), floor(col("w0") * target / col("mx")))
          .cast("long").as("out_w"),
        greatest(lit(1L), floor(col("h0") * target / col("mx")))
          .cast("long").as("out_h"),
        col("payload"))
      .withColumn("pad_x", lit(target.toLong) - col("out_w"))
      .withColumn("pad_y", lit(target.toLong) - col("out_h"))
      .withColumn("resized_sig",
        substring(md5(concat(hex(col("payload")), lit("-"),
          col("out_w"), lit("x"), col("out_h"))), 1, 16))
      .select("doc_id", "w0", "h0", "out_w", "out_h",
        "pad_x", "pad_y", "resized_sig")
  }

  /** Scene segmentation over the frame stream (shot-boundary
    * detection for video curation — frame-sample dedup and caption
    * alignment both run per SCENE, not per frame): a cut opens
    * wherever the inter-frame distance jumps past `tau`, consecutive
    * frames between cuts collapse into scenes, and each media item
    * reports its scene count + longest scene. The distance here is
    * the lead-byte delta of the stub frames (the real corpus would
    * use a histogram/embedding distance on DECODED frames — the §2.F
    * stub convention); the SHAPE is the production plan: a lag +
    * conditional-sum segmentation inside a per-media window (bounded
    * by frames-per-item, never corpus-keyed) and a two-level
    * aggregate, all shuffling on doc_id only.
    */
  def scenes(spark: SparkSession, sfDir: String, tau: Long = 32): DataFrame = {
    val cut = sceneFrames(spark, sfDir, tau)
    cut.groupBy("doc_id", "scene_id").agg(count(lit(1)).as("flen"))
      .groupBy("doc_id")
      .agg(max(col("scene_id")).cast("long").as("n_scenes"),
        sum(col("flen")).as("n_frames"),
        max(col("flen")).as("longest_scene"))
  }

  /** The per-frame scene assignment `scenes` aggregates away —
    * shared by the report and the caption alignment.
    */
  private def sceneFrames(spark: SparkSession, sfDir: String,
      tau: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames(spark, sfDir)
      .withColumn("b",
        conv(substring(col("frame_hex"), 1, 2), 16, 10).cast("long"))
      .withColumn("prev", lag(col("b"), 1).over(byDoc))
      .withColumn("cut", when(col("prev").isNull
        || abs(col("b") - col("prev")) > tau, 1L).otherwise(0L))
      .withColumn("scene_id", sum(col("cut"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** KEYFRAME SELECTION — the storyboard/thumbnail step downstream
    * of [[scenes]]: each scene's representative frame is its FIRST
    * frame (the cut frame — the standard cheap keyframe rule), with
    * the scene length and the frame's signature prefix for the
    * downstream thumbnail/decode job. One bounded per-media window
    * (the shared segmentation) + one (doc, scene) aggregate — the
    * argmin rides `min(struct(frame_idx, frame_hex))`, never a
    * per-scene window.
    */
  def keyframes(spark: SparkSession, sfDir: String, tau: Long = 32)
      : DataFrame =
    sceneFrames(spark, sfDir, tau)
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(struct(col("frame_idx"), col("frame_hex"))).as("k"),
        count(lit(1)).as("scene_len"))
      .select(col("doc_id"), col("scene_id").cast("long").as("scene_id"),
        col("k.frame_idx").as("key_frame"), col("scene_len"),
        substring(col("k.frame_hex"), 1, 16).as("key_hex"))

  /** CAPTION↔SCENE alignment — the cross-modal pairing step (the
    * CLIP-style "which text goes with which shot") that turns the §2.F
    * plumbing into a pipeline: each media item's text yields one
    * caption per `wordsPerCaption` words, captions spread uniformly
    * over the media timeline (caption k of n sits at frame
    * ⌊(2k+1)·n_frames / 2n⌋ — the stub for real SRT timestamps,
    * exact integer arithmetic in both engines), and each caption
    * joins the scene whose [first_frame, last_frame] interval
    * contains its frame.
    *
    * Scale shape: scene intervals are one bounded per-media window
    * (the `mm_scenes` segmentation, shuffling on doc_id only) plus a
    * per-doc aggregate; the alignment is an interval join KEYED ON
    * doc_id — per-media bounded (≤ frames-per-item scenes meet ≤
    * caps-per-item captions), never a corpus-wide range join. Every
    * frame belongs to exactly one scene, so alignment is total:
    * output rows = caption count (spec-pinned).
    */
  def align(spark: SparkSession, sfDir: String,
      wordsPerCaption: Int = 16, tau: Long = 32): DataFrame = {
    val sceneIv = sceneFrames(spark, sfDir, tau)
      .groupBy("doc_id", "scene_id")
      .agg(min("frame_idx").as("first_frame"),
        max("frame_idx").as("last_frame"))
    val caps = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(TextAnalysis.wsTokens(col("text"))).cast("long").as("n_words"),
        ceil(length(encode(col("text"), "UTF-8"))
          / lit(FrameBytes.toDouble)).cast("long").as("n_frames"))
      .filter(col("n_words") >= 1 && col("n_frames") >= 1)
      .withColumn("n_caps",
        expr(s"(n_words + ${wordsPerCaption - 1}) div $wordsPerCaption"))
      .select(col("doc_id"), col("n_frames"), col("n_caps"),
        explode(sequence(lit(0L), col("n_caps") - 1)).as("caption_idx"))
      .withColumn("frame_idx",
        expr("((2 * caption_idx + 1) * n_frames) div (2 * n_caps)"))
    caps.join(sceneIv, Seq("doc_id"))
      .filter(col("frame_idx") >= col("first_frame")
        && col("frame_idx") <= col("last_frame"))
      .select(col("doc_id"), col("caption_idx"), col("frame_idx"),
        col("scene_id").cast("long").as("scene_id"))
  }

  /** MEDIA-LEVEL SEMANTIC NEAR-DUP over the stub feature vectors —
    * the cross-item twin of [[frameDup]] (which matches shared raw
    * chunks; this matches items whose DECODED features agree, the
    * perceptual-hash shape real image dedup uses): mean-CENTER the
    * 8-dim feature columns (raw stub features are all non-negative,
    * so uncentered sign bits would collapse every item into one
    * bucket — the same reason SRP planes are drawn around the data
    * mean), bucket by the 8 centered SIGN BITS, pair WITHIN buckets
    * only, keep centered-cosine ≥ τ.
    *
    * Why this is oracle-gatable when `dedup_embedding` is not: the
    * stub features are k/128 dyadic rationals, so their column SUMS
    * are IEEE-exact in ANY accumulation order — the means, and
    * therefore the centering, the buckets, and the cosine dag, are
    * bit-identical in both engines with no hash-seed escape hatch.
    * Scale shape: one mapPartitions decode pass, a broadcast 1-row
    * mean, a bucket-keyed self-join with an oversize-bucket cap (the
    * frameDup df-cap convention) — never an all-pairs compare.
    */
  def embedDedup(spark: SparkSession, sfDir: String,
      tau: Double = 0.9, maxBucket: Int = 2000): DataFrame =
    embedDedupOver(features(spark, sfDir), tau, maxBucket)

  /** Same operator over any (doc_id, f0..f7) frame — planted
    * identical / opposite-sign vectors pin bucketing and the τ cut. */
  private[graft] def embedDedupOver(feat0: DataFrame, tau: Double,
      maxBucket: Int): DataFrame = {
    // the feature frame is consumed three times (pre-flight count,
    // means, then centering): persist so the decode pass runs once,
    // not per consumer; deferred-released at the end of the body
    val feat = feat0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // count-ladder bucket WIDTH (the round-18 SRP family default):
    // 8 sign bits (2^8 buckets) is the tuned gate-SF point, but any
    // fixed bucket count makes occupancy grow with n and the
    // within-bucket pair join quadratic — past 2^8 buckets the extra
    // bits come from md5-derived hyperplanes in the CENTERED feature
    // space (the srp_ convention), so the oracle replays them exactly
    val nBits = Similarity.scaledPlanesPerBand(feat.count(), floor = 8)
    val fs = (0 until 8).map(i => s"f$i")
    val means = feat.agg(
      avg(col(fs.head)).as("m0"),
      fs.tail.zipWithIndex.map { case (c, i) =>
        avg(col(c)).as(s"m${i + 1}")
      }: _*)
    // extra-plane sign bit p: the bit-identical DotProduct kernel
    // over array(c0..c7) and the literal plane (left-to-right fold =
    // DuckDB list_dot_product)
    def planeBit(p: Int): Column = {
      val pv = (0 until 8).map(j =>
        graft.functions.ExprKernels.md5Unit32(s"mmsrp_${p}_${j}") - 0.5)
      when(graft.functions.CatalystExprs.dot_product(
        array((0 until 8).map(i => col(s"c$i")): _*),
        typedLit(pv)) >= 0, "1").otherwise("0")
    }
    val centered = feat.crossJoin(broadcast(means))
      .select(Seq(col("doc_id")) ++ (0 until 8).map(i =>
        (col(s"f$i") - col(s"m$i")).as(s"c$i")): _*)
      .withColumn("bucket",
        concat((0 until 8).map(i =>
          when(col(s"c$i") >= 0, "1").otherwise("0"))
          ++ (8 until nBits).map(planeBit): _*))
      .withColumn("nrm",
        sqrt((0 until 8).map(i => col(s"c$i") * col(s"c$i"))
          .reduce(_ + _)))
      .filter(col("nrm") > 0)
    val small = centered.groupBy("bucket")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket)
      .select("bucket")
    val keyed = centered.join(small, "bucket")
    val cos = (0 until 8).map(i => col(s"a.c$i") * col(s"b.c$i"))
      .reduce(_ + _) / (col("a.nrm") * col("b.nrm"))
    val out = keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .filter(cos >= tau)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.bucket").as("bucket"), round(cos, 6).as("cos_sim"))
    Scratch.defer(feat)
    out
  }
}
