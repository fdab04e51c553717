package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scratch, Similarity}

/** The per-call scratch lifecycle contract (Scratch.scala): persisted
  * frames referenced by a returned lazy plan are reclaimed after the
  * consuming action — the round-18 fix for the engine-wide
  * persist-without-unpersist leak (41 persist sites, 9 unpersists;
  * BENCH_FULL run arrays showed mm_vad degrading 2.4 s → 37 s across
  * three bench runs from accumulated block-manager state).
  */
class ScratchSpec extends SparkSpec {

  private def cachedPlans: Boolean = {
    // the CacheManager's emptiness: storage-level view of what is
    // still pinned (persisted Datasets only — localCheckpoint blocks
    // live at the RDD layer and are ContextCleaner-managed)
    spark.sharedState.cacheManager.isEmpty
  }

  test("defer + explicit release unpersists the frame") {
    val df = spark.range(100).toDF("x")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(df.count() == 100)
    Scratch.defer(df)
    assert(Scratch.pendingCount(spark) >= 1)
    Scratch.release(spark)
    assert(Scratch.pendingCount(spark) == 0)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("the armed listener releases deferred scratch after the next " +
      "completed action — no explicit driver hook needed") {
    val df = Scratch.persistDeferred(spark.range(50).toDF("y"))
    assert(Scratch.pendingCount(spark) >= 1)
    // the consuming action; the QueryExecutionListener fires async
    assert(df.count() == 50)
    // a second, unrelated action guarantees at least one later event
    spark.range(1).count()
    val deadline = System.nanoTime() + 10e9.toLong
    while (Scratch.pendingCount(spark) > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Scratch.pendingCount(spark) == 0,
      "listener did not drain the deferred queue")
  }

  test("an ANN operator leaves no per-call scratch cached after its " +
      "action (only the intentional corpus memo survives)") {
    Scratch.release(spark)
    spark.catalog.clearCache()
    assert(cachedPlans, "cache not empty after clearCache")
    val out = Similarity.annIvf(spark, sf, k = 5, nQueries = 5)
    assert(out.count() > 0)
    Scratch.release(spark)
    // the per-call ranked frame must be gone; the vecs corpus memo
    // (documented long-lived) may remain — dropping it must leave
    // the cache fully empty, proving ranked did not linger
    val vecs = Similarity.vecs(spark, sf)
    vecs.unpersist(blocking = true)
    assert(cachedPlans,
      "per-call scratch still cached after release (leak)")
    spark.catalog.clearCache()
  }

  test("release is idempotent and safe with nothing pending") {
    Scratch.release(spark)
    Scratch.release(spark)
    assert(Scratch.pendingCount(spark) == 0)
  }
}
