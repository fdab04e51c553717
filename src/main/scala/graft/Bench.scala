package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries are materialized through the noop sink — `.count()` would
  * let Catalyst prune every computed column and under-measure by 10×.
  * A warmup query first so JVM/codegen startup isn't billed to the
  * first query in the map.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JIT + codegen + parquet footer caches
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { n =>
      val t = run(n)
      // full per-query map goes to stderr line-by-line: the driver's
      // tail buffer truncates a single 114-entry JSON line, leaving
      // the summary unparseable
      System.err.println(f"[bench] $n%-24s ${t}%.3f sec")
      n -> t
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // the one stdout JSON line stays compact: totals + a headline
    // subset, so it survives the driver's tail capture intact
    val headline = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q9_product_profit", "q18_large_orders", "mr_wordcount",
      "dedup_ngram_jaccard", "dedup_minhash_lsh", "ann_topk_brute",
      "text_bm25", "q_pagerank", "q_bucketed_join", "stream_events_hourly")
    val byName = results.toMap
    val qs = headline.flatMap(k => byName.get(k).map(v => "\"" + k + "\":" + v))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
