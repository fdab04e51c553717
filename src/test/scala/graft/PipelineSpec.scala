package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline}

class PipelineSpec extends SparkSpec {

  test("curate keeps only canonical, wordy, english docs") {
    val c = Pipeline.curate(spark, sf, minWords = 20).cache()
    assert(c.count() > 0)
    assert(c.count() < Tables.documents(spark, sf).count())
    assert(c.filter(col("n_words") < 20).isEmpty)
    assert(c.filter(col("pred_lang") =!= "en").isEmpty)
    // no two near-dup cluster members survive
    val clusters = Dedup.clusters(spark, sf)
    val survivors = c.join(clusters, "doc_id")
    assert(survivors.groupBy("cluster_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("vector stats cover every label with sane norms") {
    val v = Pipeline.vectorStats(spark, sf).cache()
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(v.count() == labels)
    assert(v.filter(col("min_norm") <= 0 || col("max_norm") < col("min_norm")).isEmpty)
    assert(v.agg(sum("n")).head().getLong(0) ==
      Tables.embeddings(spark, sf).count())
  }
}
