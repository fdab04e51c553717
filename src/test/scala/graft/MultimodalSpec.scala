package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary meta matches document byte lengths") {
    val m = Multimodal.binaryMeta(spark, sf).cache()
    assert(m.count() == 500)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("want"))
    // all-ASCII corpus → utf-8 bytes == chars
    val joined = m.join(docs, "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("want")).isEmpty)
    assert(m.filter(length(col("magic")) =!= 8).isEmpty)
  }

  test("feature extraction is deterministic with fixed flat shape") {
    val a = Multimodal.features(spark, sf).cache()
    assert(a.count() == 500)
    assert(a.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height") ++ (0 until 8).map(i => s"f$i"))
    assert(a.filter(col("width") < 1 || col("width") > 128).isEmpty)
    assert(a.filter(col("f0") < -1.0 || col("f0") > 1.0).isEmpty)
    val b = Multimodal.features(spark, sf)
    assert(a.exceptAll(b).isEmpty)
  }

  test("feature extraction: the codegen'd kernel replays the reference " +
      "decode stub byte-for-byte, including the empty payload") {
    // the expression path (ExprKernels.mediaFeatures inside
    // whole-stage codegen) and the documented reference stub must be
    // THE SAME function — this is what licenses swapping a real codec
    // into the kernel without touching the operator
    val got = Multimodal.features(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val want = Multimodal.mediaTable(spark, sf)
      .select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> Multimodal.decodeStub(r.getAs[Array[Byte]](1)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) =>
      val (w, h, f) = want(id)
      assert(r.getInt(2) == w && r.getInt(3) == h, s"dims diverge at $id")
      (0 until 8).foreach(i =>
        assert(r.getDouble(4 + i) == f(i), s"f$i diverges at $id"))
    }
    // and the edge the corpus never exercises: an empty payload
    val (w0, h0, f0) = Multimodal.decodeStub(Array.empty[Byte])
    val k = graft.functions.ExprKernels.mediaFeatures(Array.empty[Byte])
    assert(k.getDouble(0) == w0.toDouble && k.getDouble(1) == h0.toDouble)
    (0 until 8).foreach(i => assert(k.getDouble(2 + i) == f0(i)))
  }

  test("scene segmentation: counts conserve frames, scenes bounded by " +
      "frames, tau=255 collapses every item to one scene") {
    val s = Multimodal.scenes(spark, sf).cache()
    val fr = Multimodal.frames(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("nf"))
    // frame conservation per item
    assert(s.join(fr, "doc_id").filter(col("n_frames") =!= col("nf")).isEmpty)
    assert(s.filter(col("n_scenes") < 1
      || col("n_scenes") > col("n_frames")
      || col("longest_scene") < 1
      || col("longest_scene") > col("n_frames")).isEmpty)
    // a threshold no byte delta can exceed ⇒ exactly one scene each
    assert(Multimodal.scenes(spark, sf, tau = 255)
      .filter(col("n_scenes") =!= 1).isEmpty)
    // and the default threshold actually segments something
    assert(s.filter(col("n_scenes") > 1).count() > 0)
    s.unpersist()
  }

  test("resize plan: longer edge hits the target box, aspect is " +
      "preserved within flooring, pads are complements") {
    val r = Multimodal.resizePlan(spark, sf).cache()
    assert(r.count() > 0)
    // aspect fit: max(out_w, out_h) == 64 exactly (the longer edge
    // scales to the box; floor(mx*64/mx) = 64)
    assert(r.filter(greatest(col("out_w"), col("out_h")) =!= 64).isEmpty)
    assert(r.filter(col("out_w") < 1 || col("out_w") > 64
      || col("out_h") < 1 || col("out_h") > 64).isEmpty)
    assert(r.filter(col("pad_x") =!= lit(64) - col("out_w")).isEmpty)
    assert(r.filter(col("pad_y") =!= lit(64) - col("out_h")).isEmpty)
    // aspect preserved within flooring: out_w/out_h within 1 unit of
    // w0*64/mx and h0*64/mx
    assert(r.filter(abs(col("out_w")
      - col("w0") * 64 / greatest(col("w0"), col("h0"))) > 1).isEmpty)
    r.unpersist()
  }

  test("caption alignment is total: one scene per caption, counts " +
      "equal the per-doc caption count, frames in range") {
    val al = operators.Multimodal.align(spark, sf).cache()
    // every (doc, caption) resolves to exactly ONE scene
    assert(al.groupBy("doc_id", "caption_idx").count()
      .filter(col("count") =!= 1).isEmpty)
    // total rows = sum over docs of ceil(n_words / 16)
    val expected = Tables.documents(spark, sf)
      .select(size(org.apache.spark.sql.functions.filter(
          split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("nw"))
      .filter(col("nw") >= 1)
      .select(expr("(nw + 15) div 16").as("nc"))
      .agg(sum("nc")).head().getLong(0)
    assert(al.count() == expected)
    // caption frames stay inside the media timeline
    val nf = operators.Multimodal.frames(spark, sf)
      .groupBy("doc_id").agg(max("frame_idx").as("max_f"))
    assert(al.join(nf, "doc_id")
      .filter(col("frame_idx") < 0 || col("frame_idx") > col("max_f"))
      .isEmpty)
    al.unpersist()
  }

  test("media quality gate: verdicts decompose into their rules, and a " +
      "planted repeated-frame payload is dropped for duplication") {
    import spark.implicits._
    val g = Multimodal.qualityGate(spark, sf).cache()
    // rule decomposition on the real corpus
    assert(g.filter(col("keep") =!=
      (col("n_bytes") >= 64 && col("n_bytes") <= 480 &&
        col("dup_ratio") <= 0.5)).isEmpty)
    assert(g.filter(col("n_distinct") > col("n_frames")).isEmpty)
    g.unpersist()
    // planted: one payload = the same 32-byte frame 4x (dup_ratio
    // 0.75), one healthy 4-frame payload, one undersized stub
    val frame = "x" * 32
    val media = Seq(
      (1L, (frame * 4).getBytes("UTF-8")),
      (2L, ("a" * 32 + "b" * 32 + "c" * 32 + "d" * 32).getBytes("UTF-8")),
      (3L, "tiny".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.qualityGateOver(media, 64, 480, 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(5) && out(1L).getDouble(4) == 0.75)
    assert(out(2L).getBoolean(5) && out(2L).getDouble(4) == 0.0)
    assert(!out(3L).getBoolean(5))
  }

  test("embed dedup: identical vectors pair at cosine 1 inside their " +
      "sign bucket, opposite-sign vectors never meet, cap drops all") {
    import spark.implicits._
    // docs 1,2 share (1,1,0,...); docs 3,4 share (0,0,1,1,0,...):
    // after mean-centering the two groups land in different buckets
    val feat = Seq(
      (1L, 1.0, 1.0, 0.0, 0.0), (2L, 1.0, 1.0, 0.0, 0.0),
      (3L, 0.0, 0.0, 1.0, 1.0), (4L, 0.0, 0.0, 1.0, 1.0))
      .toDF("doc_id", "f0", "f1", "f2", "f3")
      .withColumn("f4", lit(0.0)).withColumn("f5", lit(0.0))
      .withColumn("f6", lit(0.0)).withColumn("f7", lit(0.0))
    val pairs = Multimodal.embedDedupOver(feat, 0.9, 2000).collect()
    assert(pairs.length == 2)
    val keys = pairs.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys == Set((1L, 2L), (3L, 4L)))
    assert(pairs.forall(_.getAs[Double]("cos_sim") == 1.0))
    // within-group and cross-group buckets differ
    assert(pairs.map(_.getAs[String]("bucket")).distinct.length == 2)
    // an oversize-bucket cap of 1 suppresses every candidate
    assert(Multimodal.embedDedupOver(feat, 0.9, 1).isEmpty)
  }

  test("keyframes: one representative per scene, lengths telescope to " +
      "the scene report, and every keyframe opens its scene") {
    val kf = Multimodal.keyframes(spark, sf).cache()
    val sc = Multimodal.scenes(spark, sf).cache()
    // per doc: #keyframes == n_scenes, sum(scene_len) == n_frames
    val agg = kf.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), sum(col("scene_len")).as("f"),
        min(col("key_frame")).as("kf0"))
    val j = agg.join(sc, "doc_id")
    assert(j.filter(col("k") =!= col("n_scenes")
      || col("f") =!= col("n_frames")).isEmpty)
    // scene 1's keyframe is frame 0 (the first cut is always a cut)
    assert(kf.filter(col("scene_id") === 1 && col("key_frame") =!= 0)
      .isEmpty)
    // keyframes are strictly increasing with scene id within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("scene_id"))
    assert(kf.withColumn("prev", lag(col("key_frame"), 1).over(w))
      .filter(col("prev").isNotNull && col("key_frame") <= col("prev"))
      .isEmpty)
    kf.unpersist(); sc.unpersist()
  }

  test("vad: planted silent/speech frames pin the run segmentation " +
      "and the all-speech null path") {
    import spark.implicits._
    val dir = TempDirs.create("graft_mm_vad").toString
    // doc 1: [32 spaces][32 'z'][32 spaces] -> silent, speech, silent
    //   (space energy 32*32=1024 < 3100; 'z' energy 32*122=3904)
    // doc 2: 64 'z' -> all speech, left-join null path
    val docs = Seq(
      (1L, " " * 32 + "z" * 32 + " " * 32, "en", "web", 96L),
      (2L, "z" * 64, "en", "web", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.vad(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 3L && d1.getLong(2) == 2L &&
      d1.getLong(3) == 1L)
    assert(d1.getDouble(4) == 0.333333, s"ratio = ${d1.getDouble(4)}")
    val d2 = out(2L)
    assert(d2.getLong(2) == 0L && d2.getLong(3) == 0L &&
      d2.getDouble(4) == 1.0)
  }
}
