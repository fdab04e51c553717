package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItemsSketch.freq_items

class FreqItemsSpec extends SparkSpec {

  test("sketch counts are exact when k >= distinct items") {
    val got = SparkEntry.queries("agg_freq_items")(spark, sf)
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("word"))
      Tables.documents(spark, sf)
        .select(col("lang"),
          explode(split(col("text"), "[^\\p{L}]+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select("lang", "word", "cnt", "rnk")
    }
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bounded capacity still surfaces the heavy hitter") {
    import spark.implicits._
    // one heavy item (40%) among many light ones; k far below distinct
    val data = (Seq.fill(400)("heavy") ++ (0 until 600).map(i => s"light$i"))
    val df = data.toDF("item")
      .agg(freq_items(col("item"), 8).as("sk"))
      .select(explode(col("sk")))
      .select(col("col.item").as("item"), col("col.cnt").as("cnt"))
    val items = df.collect().map(_.getString(0)).toSet
    assert(items.contains("heavy"))
    // MG lower-bound property: retained count ≤ true count
    val heavyCnt = df.filter(col("item") === "heavy").head().getLong(1)
    assert(heavyCnt <= 400)
    assert(heavyCnt >= 400 - 1000 / 9) // N/(k+1) error bound
  }

  test("sketch merge across many partitions stays correct") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"w${i % 10}").toDF("item")
      .repartition(13)
      .agg(freq_items(col("item"), 64).as("sk"))
      .select(explode(col("sk")))
      .select(col("col.item").as("item"), col("col.cnt").as("cnt"))
    // k=64 ≥ 10 distinct → exact: every item appears 100 times
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(1) == 100L))
  }
}
