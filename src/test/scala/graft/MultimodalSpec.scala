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
}
