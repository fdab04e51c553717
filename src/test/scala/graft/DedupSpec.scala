package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("exact dedup: every doc keeps a canonical, no false dups") {
    val e = Dedup.exact(spark, sf).cache()
    assert(e.count() == Tables.documents(spark, sf).count())
    // canonical is always <= doc_id and from the same fp group
    assert(e.filter(col("canonical_id") > col("doc_id")).isEmpty)
    // corpus has no exact dups → everyone is their own canonical
    assert(e.filter(col("is_dup")).count() ==
      e.count() - e.select("fp").distinct().count())
  }

  test("ngram jaccard finds the planted near-dup pairs") {
    val pairs = Dedup.ngramJaccard(spark, sf, 0.5).cache()
    assert(pairs.count() > 0)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(pairs.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).isEmpty)
  }

  test("minhash LSH recalls every jaccard>=0.9 pair") {
    val truth = Dedup.ngramJaccard(spark, sf, 0.9)
      .select("doc_a", "doc_b")
    val lsh = Dedup.minhashLsh(spark, sf, 0.8).select("doc_a", "doc_b")
    val missed = truth.exceptAll(lsh)
    assert(missed.isEmpty,
      s"LSH missed ${missed.count()} of ${truth.count()} true pairs")
  }

  test("minhash LSH has no false positives below threshold") {
    val lsh = Dedup.minhashLsh(spark, sf, 0.8)
    assert(lsh.filter(col("jaccard") < 0.8).isEmpty)
  }

  test("clusters: members of a pair share a cluster, singletons are their own") {
    val cl = Dedup.clusters(spark, sf).cache()
    assert(cl.count() == Tables.documents(spark, sf).count())
    val pairs = Dedup.ngramJaccard(spark, sf, 0.5)
    val a = cl.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("cluster_id", "ca")
    val b = cl.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("cluster_id", "cb")
    assert(pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("ca") =!= col("cb")).isEmpty)
    // cluster id is always the minimum member
    assert(cl.filter(col("cluster_id") > col("doc_id")).isEmpty)
  }

  test("distributed CC path matches the driver union-find path") {
    import org.apache.spark.sql.functions.col
    val verts = Tables.documents(spark, sf).select(col("doc_id"))
    val edges = Dedup.ngramJaccard(spark, sf, 0.5)
      .select(col("doc_a"), col("doc_b"))
    val small = Dedup.componentsOver(verts, edges, 20) // driver union-find
    val dist = Dedup.componentsOver(verts, edges, 20, driverCutoff = 0)
    assert(small.exceptAll(dist).isEmpty && dist.exceptAll(small).isEmpty,
      "driver and distributed components disagree")
  }

  test("both CC paths collapse a diameter-99 chain to one cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val verts = (0L until 100L).toDF("doc_id")
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    for (cutoff <- Seq(0L, 1000L)) { // distributed loop, then union-find
      val cl = Dedup.componentsOver(verts, edges, 20, driverCutoff = cutoff)
      assert(cl.filter(col("cluster_id") =!= 0L).isEmpty,
        s"cutoff=$cutoff: chain not fully collapsed to min id 0")
    }
  }

  test("simhash pairs are within the hamming bound and ordered") {
    val s = Dedup.simhash(spark, sf, 3).cache()
    assert(s.filter(col("hamming") > 3).isEmpty)
    assert(s.filter(col("doc_a") >= col("doc_b")).isEmpty)
  }

  test("embedding near-dup pairs respect the cosine threshold") {
    val e = Dedup.embeddingNearDupLsh(spark, sf, 0.45).cache()
    assert(e.filter(col("cos") < 0.45 || col("cos") > lit(1.0000001)).isEmpty)
    assert(e.filter(col("vec_a") >= col("vec_b")).isEmpty)
  }
}
