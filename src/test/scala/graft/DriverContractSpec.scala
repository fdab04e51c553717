package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Mirrors the driver's own gates: the entry smoke check, the
  * queries/oracleSql contract invariants, and AQE's runtime skew
  * handling (the piece of the skew toolkit that isn't in q_salted_agg).
  */
class DriverContractSpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("the rows-only set is EXACTLY the declared no-oracle keys — " +
      "an accidentally dropped oracle cannot silently weaken a gate") {
    val declared = Set(
      // sketch/hash internals DuckDB cannot reproduce
      "agg_welford", "q_approx_distinct", "text_compression",
      // SRP/PQ/Lloyd/IRLS families (recall/accuracy floors spec-pinned)
      "ann_ivfpq", "ann_persisted_pq", "ann_pq", "dedup_semantic",
      "q_embed_kmeans", "q_embed_pca", "q_linear_probe",
      "q_probe_mislabel", "stream_kmeans",
      // data-adaptive stopping (round count not a fixed unroll; the
      // fixed-round twins gate the trajectories)
      "q_hits_converged", "q_pagerank_converged",
      "q_label_prop_converged")
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == declared,
      s"undeclared rows-only keys: ${actual -- declared}; " +
        s"stale declarations: ${declared -- actual}")
  }

  test("SURVEY §2 tables list exactly the registered query keys " +
      "(coverage checklist cannot drift from the registry)") {
    val lines = scala.io.Source.fromFile("SURVEY.md")("UTF-8")
      .getLines().toList
    val s2 = lines
      .dropWhile(!_.startsWith("## §2"))
      .takeWhile(l => !l.startsWith("## §3"))
    val KeyRow = """\|\s*`([a-z0-9_]+)`\s*\|.*""".r
    val documented = s2.collect { case KeyRow(k) => k }.toSet
    val registered = SparkEntry.queries.keySet
    assert(documented == registered,
      s"SURVEY §2 missing: ${registered -- documented}; " +
        s"stale rows: ${documented -- registered}")
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = try fn(spark, sf).count() catch {
        case e: Throwable => fail(s"$name threw: ${e.getMessage}")
      }
      if (n == 0) Some(name) else None
    }
    // dedup pair queries may legitimately be empty at tiny SF; nothing
    // else should be
    val allowedEmpty = Set("dedup_embedding", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_minhash_lsh", "ann_lsh")
    assert((empty.toSet -- allowedEmpty).isEmpty,
      s"unexpected empty results: ${empty.toSet -- allowedEmpty}")
  }

  test("AQE splits a skewed join at runtime") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one hot key carrying ~90% of rows, with wide payload
      val left = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat_ws("", Seq.fill(20)(col("id").cast("string")): _*).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), lit("d").as("v"))
      val joined = left.join(right, "k")
      // materialize THIS plan (count() would execute a different copy
      // and leave this one un-finalized under AQE)
      val n = joined.toLocalIterator().asScala.length
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      // the skew marker appears on the sort-merge join after AQE replan
      assert(plan.contains("skew=true"), s"no skew handling in:\n$plan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
    }
  }
}
