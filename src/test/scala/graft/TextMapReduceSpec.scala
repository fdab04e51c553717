package graft

import org.apache.spark.sql.functions._

import graft.operators.TextMapReduce

class TextMapReduceSpec extends SparkSpec {

  test("wordCount totals equal total token count") {
    val wc = TextMapReduce.wordCount(spark, sf).cache()
    assert(wc.count() > 0)
    val totalFromCounts =
      wc.agg(sum("cnt")).head().getLong(0)
    val totalTokens =
      TextMapReduce.words(Tables.documents(spark, sf)).count()
    assert(totalFromCounts == totalTokens)
  }

  test("wordCount API variant matches DataFrame variant exactly") {
    val a = TextMapReduce.wordCount(spark, sf)
    val b = TextMapReduce.wordCountViaApi(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("invertedIndex: docs list is sorted, distinct, and n_docs-consistent") {
    val ii = TextMapReduce.invertedIndex(spark, sf).cache()
    assert(ii.count() > 0)
    val bad = ii.filter(
      size(split(col("docs"), ",")) =!= col("n_docs") ||
        array_sort(split(col("docs"), ",")) =!= split(col("docs"), ","))
    assert(bad.isEmpty)
  }

  test("grep only returns matching docs") {
    val hits = TextMapReduce.grep(spark, sf, "the").count()
    val direct = Tables.documents(spark, sf)
      .filter(col("text").contains("the")).count()
    assert(hits == direct)
  }

  test("sortedWordCount rank is a dense 1..n total order by word") {
    val s = TextMapReduce.sortedWordCount(spark, sf)
      .orderBy("rnk").collect()
    assert(s.map(_.getLong(2)).toSeq == (1L to s.length).toSeq)
    val ws = s.map(_.getString(0)).toSeq
    assert(ws == ws.sorted)
  }

  test("generic mapReduce API runs ii.go's mapF/reduceF ported verbatim") {
    // ii.go mapF (ii.go:22-36): emit (word, document) per token;
    // reduceF (ii.go:41-66): "<count> <sorted distinct docs joined by ,>"
    import spark.implicits._
    import graft.operators.MapReduceLib
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)]
    val splitter = TextMapReduce.WordSplit.r
    val ported = MapReduceLib.mapReduce[(String, String), String, String, (String, String)](
      docs,
      { case (document, value) =>
        splitter.split(value).iterator.filter(_.nonEmpty).map(w => (w, document)) },
      (key, values) => {
        val sorted = values.toSet.toArray.sorted
        (key, s"${sorted.length} ${sorted.mkString(",")}")
      })
    val got = ported.toDF("word", "out")
    val want = TextMapReduce.invertedIndex(spark, sf)
      .select(col("word"),
        concat_ws(" ", col("n_docs"), col("docs")).as("out"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("books parity: wordcount over the reference's own Gutenberg inputs") {
    // The reference's test-wc.sh runs wc.go over pg-*.txt; same
    // computation here through the Spark-native operator.
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val books = spark.read.text("/root/reference/src/main/pg-being_ernest.txt",
        "/root/reference/src/main/pg-metamorphosis.txt")
      .withColumnRenamed("value", "text")
    val wc = TextMapReduce.wordCountOver(books).cache()
    assert(wc.count() > 1000)
    // spot-check against an independent line-level count
    val theCount = wc.filter(col("word") === "the").head().getLong(1)
    val direct = books.collect().iterator
      .flatMap(_.getString(0).split("[^\\p{L}]+")).count(_ == "the")
    assert(theCount == direct)
  }

  test("topWords is count-desc, word-asc and bounded") {
    val t = TextMapReduce.topWords(spark, sf, 10).collect()
    assert(t.length <= 10)
    val pairs = t.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(pairs == pairs.sorted)
  }
}
