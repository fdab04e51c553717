package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input-hygiene behavior a pipeline relies on: malformed records
  * degrade to nulls (PERMISSIVE), never fail the job — at 100 TB some
  * records WILL be garbage.
  */
class MalformedInputSpec extends SparkSpec {

  test("malformed JSON props degrade to null, valid ones parse") {
    import spark.implicits._
    // Spark 4 runs ANSI mode: a plain cast THROWS on malformed input.
    // try_cast is the hygiene pattern for untrusted payloads.
    val df = Seq(
      """{"k": 42}""",
      """not json at all""",
      """{"k": "strval"}""",
      """{"other": 1}""").toDF("props")
      .withColumn("k",
        expr("try_cast(get_json_object(props, '$.k') AS LONG)"))
    val rows = df.select("k").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows(0).contains(42L))
    assert(rows(1).isEmpty) // not JSON
    assert(rows(2).isEmpty) // wrong type → cast null
    assert(rows(3).isEmpty) // key absent
  }

  test("from_json with schema: corrupt rows null out, batch survives") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq("""{"k": 7}""", """{"k":""", "").toDF("props")
      .withColumn("parsed", from_json(col("props"), schema))
    val ok = df.filter(col("parsed.k").isNotNull).count()
    assert(ok == 1)
    assert(df.count() == 3) // nothing dropped, nothing thrown
  }

  test("degenerate corpora: empty / single-doc / all-hot inputs " +
      "produce empty-but-well-formed dedup results") {
    import spark.implicits._
    import graft.operators.Dedup
    // empty corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.spanDedupOver(empty, 10).collect().isEmpty)
    assert(Dedup.ngramJaccardOver(
      Seq.empty[(Long, Seq[String])].toDF("doc_id", "sh"), 0.5).collect().isEmpty)
    // single doc: no pairs, span stats still emitted
    val one = Seq((7L, "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu")).toDF("doc_id", "text")
    val spans = Dedup.spanDedupOver(one, 10).collect()
    assert(spans.length == 1 && spans.head.getLong(2) == 0L) // no dup spans
    // maxDf = 0: EVERY shingle is "hot" → zero candidates, no failure
    val shd = Seq((1L, Seq("x", "y")), (2L, Seq("x", "y"))).toDF("doc_id", "sh")
    assert(Dedup.ngramJaccardOver(shd, 0.5, maxDf = 0).collect().isEmpty)
  }

  test("sketch aggregates on empty groups never throw") {
    import spark.implicits._
    import graft.functions.{KllSketch, ThetaSketch}
    // a filter that keeps nothing → agg over zero rows
    val none = Seq(1.0, 2.0).toDF("v").filter(col("v") > 100)
    val kll = none.agg(KllSketch.kll_quantiles(col("v"), 64, Seq(0.5)).as("q"))
      .head().getSeq[Double](0)
    assert(kll.size == 1 && kll.head.isNaN) // declared empty-group value
    val th = none.select(col("v").cast("string").as("s"))
      .agg(ThetaSketch.theta_sketch(col("s"), 64).as("sk"))
      .select(ThetaSketch.theta_estimate(col("sk"), 64).as("n"))
      .head().getLong(0)
    assert(th == 0L)
  }

  test("csv with malformed rows under PERMISSIVE keeps the batch alive") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-badcsv")
    Files.writeString(Paths.get(dir.toString, "data.csv"),
      "a,b\n1,2\nnot_a_number,3\n4,5\n")
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType)))
    val df = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .schema(schema).csv(dir.toString)
    assert(df.count() == 3)
    assert(df.filter(col("a").isNull).count() == 1)
  }
}
