package graft

import org.apache.spark.sql.functions._

import graft.functions.CatalystExprs.dot_product
import graft.operators.{AnnIndex, Similarity}

class AnnIndexSpec extends SparkSpec {

  /** The (vec_id, v, norm) corpus frame the ANN family consumes. */
  private def corpus() = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))

  private def queries(all: org.apache.spark.sql.DataFrame, n: Int) =
    all.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))

  test("persisted IVF round trip reproduces one-shot ann_ivf bit-for-bit") {
    val res = AnnIndex.annPersisted(spark, sf).cache()
    assert(res.count() > 0)
    val oneShot = Similarity.annIvf(spark, sf)
    assert(res.except(oneShot).isEmpty && oneShot.except(res).isEmpty)
    res.unpersist()
  }

  test("persisted IVF-PQ round trip reproduces one-shot ann_ivfpq " +
      "exactly (codebooks trained once, nothing lost in the artifacts)") {
    val res = AnnIndex.annPersistedPq(spark, sf).cache()
    assert(res.count() > 0)
    val oneShot = Similarity.annIvfPq(spark, sf)
    assert(res.except(oneShot).isEmpty && oneShot.except(res).isEmpty)
    res.unpersist()
  }

  test("maintenance loop: a skewed store forces the rebuild branch, an " +
      "undersized store rebuilds at the sqrt-n target, a healthy store " +
      "appends under the frozen codebook") {
    import spark.implicits._
    def mk(vecs: Seq[(Long, Seq[Double])]) = vecs
      .toDF("vec_id", "v")
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))

    // SKEW-FORCED REBUILD: 4 centroid seeds (ids 0..3), then 56 more
    // vectors all nearly parallel to seed 0 — hottest cell share ≈
    // 57/60 >> 0.5 while cells=4 is NOT undersized (⌊√64⌋/2 = 4)
    val skewSeed = Seq[(Long, Seq[Double])](
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0)), (3L, Seq(1.0, 1.0, 1.0)))
    val hotTail = (4L to 59L).map(i =>
      (i, Seq(1.0, 0.001 * i, 0.0)))
    val dirS = TempDirs.create("graft_ann_maint_skew").toString
    AnnIndex.buildIvf(mk(skewSeed ++ hotTail), dirS, cells = 4)
    val batchS = mk(Seq((100L, Seq(1.0, 0.01, 0.0)),
      (101L, Seq(1.0, 0.02, 0.0)), (102L, Seq(1.0, 0.03, 0.0)),
      (103L, Seq(1.0, 0.04, 0.0))))
    val rs = AnnIndex.maintainIvf(spark, dirS, batchS)
    assert(rs.decision == "rebuild", s"skew must force rebuild: $rs")
    assert(rs.hotShare > AnnIndex.RebuildHotShare)
    assert(rs.nAfter == 64, "the rebuild lost or duplicated vectors")
    assert(rs.cellsAfter == math.max(4L,
      math.floor(math.sqrt(64.0)).toLong))

    // SIZE-FORCED REBUILD: 4 cells over 40 vectors, then a 360-vector
    // batch — ⌊√400⌋/2 = 10 > 4 ⇒ rebuild at 20 cells even though
    // occupancy is balanced
    val spread = (0L to 39L).map(i =>
      (i, Seq(math.cos(i * 0.7), math.sin(i * 0.7), 0.5)))
    val dirU = TempDirs.create("graft_ann_maint_under").toString
    AnnIndex.buildIvf(mk(spread), dirU, cells = 4)
    val bigBatch = mk((100L to 459L).map(i =>
      (i, Seq(math.cos(i * 0.3), math.sin(i * 0.3), -0.5))))
    val ru = AnnIndex.maintainIvf(spark, dirU, bigBatch)
    assert(ru.decision == "rebuild" && ru.cellsAfter == 20L &&
      ru.nAfter == 400L, s"undersized store must rebuild at √n: $ru")

    // HEALTHY APPEND: balanced occupancy, adequately-sized — the
    // codebook stays frozen (cells unchanged) and the appended index
    // answers exactly like one full build (the appendIvf contract)
    val dirH = TempDirs.create("graft_ann_maint_healthy").toString
    AnnIndex.buildIvf(mk(spread), dirH, cells = 4)
    val smallBatch = mk((100L to 109L).map(i =>
      (i, Seq(math.cos(i * 0.3), math.sin(i * 0.3), -0.5))))
    val rh = AnnIndex.maintainIvf(spark, dirH, smallBatch)
    assert(rh.decision == "append" && rh.cellsAfter == 4L &&
      rh.nAfter == 50L, s"healthy store must append: $rh")
    val dirFull = TempDirs.create("graft_ann_maint_full").toString
    AnnIndex.buildIvf(mk(spread).unionByName(smallBatch)
      .localCheckpoint(), dirFull, cells = 4)
    val q = mk(spread.take(3)).select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("norm").as("qnorm"))
    val a = AnnIndex.queryIvf(spark, dirH, q, k = 5)
    val b = AnnIndex.queryIvf(spark, dirFull, q, k = 5)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "append drifted from the one-shot build")
  }

  test("query plans are artifact-only: no corpus re-encode, and the " +
      "cell-partitioned codes store prunes via dynamic partition pruning") {
    val all = corpus()
    val q = queries(all, 20)

    val dir = TempDirs.create("graft_ann_spec").toString
    AnnIndex.buildIvf(all, dir)
    // build really wrote a cell-partitioned store (one dir per cell)
    val cellDirs = new java.io.File(s"$dir/codes").listFiles
      .map(_.getName).count(_.startsWith("cid="))
    assert(cellDirs == Similarity.IvfCells)
    val ivfPlan = AnnIndex.queryIvf(spark, dir, q)
      .queryExecution.executedPlan.toString
    // the codes scan is the artifact store, and the probed-cid
    // broadcast join reaches it as a DPP partition filter — at scale
    // a query touches nProbe/cells of the FILES
    assert(ivfPlan.contains(dir))
    assert(ivfPlan.toLowerCase.contains("dynamicpruning"))

    val dir2 = TempDirs.create("graft_ann_pq_spec").toString
    AnnIndex.buildIvfPq(all, dir2)
    val pqPlan = AnnIndex.queryIvfPq(spark, dir2, q, all)
      .queryExecution.executedPlan.toString
    // serving never re-encodes the corpus: the PqEncode kernel exists
    // only in the build job, and the codes scan prunes cells like IVF
    assert(!pqPlan.toLowerCase.contains("pqencode"))
    assert(pqPlan.contains(dir2))
    assert(pqPlan.toLowerCase.contains("dynamicpruning"))
  }

  test("a second query against the same artifacts answers without " +
      "rebuilding (train-once/serve-many)") {
    val all = corpus()
    val dir = TempDirs.create("graft_ann_reuse").toString
    AnnIndex.buildIvf(all, dir)
    val r1 = AnnIndex.queryIvf(spark, dir, queries(all, 5), k = 3)
    val r2 = AnnIndex.queryIvf(spark, dir, queries(all, 5), k = 3)
    assert(r1.count() > 0)
    assert(r1.except(r2).isEmpty && r2.except(r1).isEmpty)
  }

  test("incremental append: a new batch indexes against the PERSISTED " +
      "centroids and queries equal a full rebuild") {
    val all = corpus()
    val mid = 100L // > IvfCells, so the build half owns the full codebook
    val dir = TempDirs.create("graft_ann_incr").toString
    AnnIndex.buildIvf(all.filter(col("vec_id") < mid), dir)
    AnnIndex.appendIvf(spark, all.filter(col("vec_id") >= mid), dir)
    val incr = AnnIndex.queryIvf(spark, dir, queries(all, 10), k = 5)
    val dirFull = TempDirs.create("graft_ann_full").toString
    AnnIndex.buildIvf(all, dirFull)
    val full = AnnIndex.queryIvf(spark, dirFull, queries(all, 10), k = 5)
    assert(incr.count() > 0)
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)
    // the append wrote new parts beside the build's (parquet append,
    // cell-partitioned) -- the build half's parts were never rewritten
    val parts = new java.io.File(s"$dir/codes").listFiles
      .filter(_.getName.startsWith("cid="))
      .flatMap(_.listFiles).count(_.getName.endsWith(".parquet"))
    assert(parts > graft.operators.Similarity.IvfCells,
      "append did not add parts to the existing cell dirs")
  }

  test("PQ append: a new batch encodes against the PERSISTED codebooks " +
      "and queries equal a full rebuild") {
    val all = corpus()
    // the build half must contain the whole deterministic training
    // sample (first PqSample=128 vectors) for codebook equality
    val mid = 200L
    val dir = TempDirs.create("graft_ann_pq_incr").toString
    AnnIndex.buildIvfPq(all.filter(col("vec_id") < mid), dir)
    AnnIndex.appendIvfPq(spark, all.filter(col("vec_id") >= mid), dir)
    val incr = AnnIndex.queryIvfPq(spark, dir, queries(all, 10), all, k = 5)
    val dirFull = TempDirs.create("graft_ann_pq_full").toString
    AnnIndex.buildIvfPq(all, dirFull)
    val full = AnnIndex.queryIvfPq(spark, dirFull, queries(all, 10), all, k = 5)
    assert(incr.count() > 0)
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)
  }

  test("index stats: shares sum to 1, counts sum to the corpus, and " +
      "every populated cell appears") {
    val st = AnnIndex.indexStats(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(st.agg(sum("n_vectors")).head().getLong(0) == n)
    val shareSum = st.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-6)
    assert(st.filter(col("n_vectors") <= 0).isEmpty)
    st.unpersist()
  }

  test("persisted range search answers identically to the one-shot " +
      "operator (exact payload, same probes, same threshold)") {
    val oneShot = Similarity.annRangeSearch(spark, sf, tau = 0.35,
      nQueries = 20)
    val fromArtifacts = AnnIndex.annPersistedRange(spark, sf, tau = 0.35,
      nQueries = 20)
    assert(oneShot.except(fromArtifacts).isEmpty
      && fromArtifacts.except(oneShot).isEmpty)
  }

  test("persisted NSW layer: the round trip reproduces one-shot " +
      "ann_ivf_nsw bit-for-bit, per-query recall dominates plain " +
      "persisted IVF (probe superset), and build -> append -> query " +
      "serves from the frozen graph like a full build") {
    val res = AnnIndex.annPersistedNsw(spark, sf).cache()
    assert(res.count() > 0)
    val oneShot = Similarity.annIvfNsw(spark, sf)
    assert(res.except(oneShot).isEmpty && oneShot.except(res).isEmpty)
    // recall floor >= the plain persisted-IVF floor: same artifacts,
    // brute-force truth, per-query hit counts
    val all = corpus()
    val dir = TempDirs.create("graft_ann_nsw_cmp").toString
    AnnIndex.buildIvf(all, dir)
    AnnIndex.buildNsw(spark, dir)
    val brute = Similarity.annTopkBrute(spark, sf)
      .select(col("query_id"), col("neighbor_id")).cache()
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      brute.intersect(df.select(col("query_id"), col("neighbor_id")))
        .groupBy("query_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = hits(AnnIndex.queryIvf(spark, dir, queries(all, 20)))
    val nsw = hits(AnnIndex.queryIvfNsw(spark, dir, queries(all, 20)))
    (0L until 20L).foreach { q =>
      assert(nsw.getOrElse(q, 0L) >= plain.getOrElse(q, 0L),
        s"persisted NSW lost recall on query $q")
    }
    val meanNsw = (0L until 20L).map(q => nsw.getOrElse(q, 0L)).sum / 200.0
    assert(meanNsw >= 0.5, f"persisted NSW mean recall: $meanNsw%.3f")
    brute.unpersist()
    // lifecycle: build(half) + append(half) under the frozen codebook
    // AND graph answers exactly like the full build (the centroid
    // graph depends only on the codebook, which append never moves)
    val mid = 100L
    val dirIncr = TempDirs.create("graft_ann_nsw_incr").toString
    AnnIndex.buildIvf(all.filter(col("vec_id") < mid), dirIncr)
    AnnIndex.buildNsw(spark, dirIncr)
    AnnIndex.appendIvf(spark, all.filter(col("vec_id") >= mid), dirIncr)
    val incr = AnnIndex.queryIvfNsw(spark, dirIncr, queries(all, 10), k = 5)
    val full = AnnIndex.queryIvfNsw(spark, dir, queries(all, 10), k = 5)
    assert(incr.count() > 0)
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)
    res.unpersist()
  }
}
