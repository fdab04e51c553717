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
