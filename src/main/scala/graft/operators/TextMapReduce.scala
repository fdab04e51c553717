package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MapReduceLib

/** Spark-native equivalents of the reference's two MapReduce programs
  * (wc.go, ii.go) plus the map-only / sorted-merge shapes its
  * framework supports, generalized over the `documents` table.
  *
  * Reference semantics:
  *  - wc.go:23-37  mapF splits contents on every non-letter rune and
  *    emits (word, 1); reduceF sums (wc.go:42-57).
  *  - ii.go:22-36  mapF emits (word, document); reduceF outputs
  *    "<count> <doc1>,<doc2>,…" over sorted distinct docs
  *    (ii.go:41-66).
  *  - master_splitmerge.go merges reduce output sorted by key.
  *
  * Design for scale: tokenization stays inside whole-stage codegen
  * (`split`/`explode` built-ins, no UDF). Per-document de-duplication
  * for the inverted index happens in the array domain
  * (`array_distinct` before `explode`) so the shuffle carries one row
  * per (word, doc) instead of one per occurrence — at 100 TB of text
  * that is the difference between shuffling token count and shuffling
  * postings count. Word count relies on Spark's partial aggregation
  * (map-side combine) so the shuffle carries one row per word per
  * partition.
  */
object TextMapReduce {

  /** wc.go word definition: maximal runs of Unicode letters. */
  val WordSplit = "[^\\p{L}]+"

  /** documents.text tokenized to one word per row, empties dropped. */
  def words(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), WordSplit)).as("word"))
      .filter(col("word") =!= "")

  /** wc.go semantics over any DataFrame with a `text` column —
    * including the reference's own Project Gutenberg inputs read via
    * `spark.read.text` (see TextMapReduceSpec "books parity").
    */
  def wordCountOver(text: DataFrame): DataFrame =
    text
      .select(explode(split(col("text"), WordSplit)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** wc.go: (word, total occurrences across all documents). */
  def wordCount(spark: SparkSession, sfDir: String): DataFrame =
    wordCountOver(Tables.documents(spark, sfDir).select("text"))

  /** wordCount through the reference-shaped generic API
    * (MapReduceLib.reduceByKeyAlg ≙ Sequential(mapF, reduceF) with a
    * combiner). Proves a reference user can port mapF/reduceF verbatim.
    */
  def wordCountViaApi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).as[String]
    val splitter = WordSplit.r
    MapReduceLib
      .reduceByKeyAlg[String, String, Long](
        docs,
        text => splitter.split(text).iterator.filter(_.nonEmpty).map(w => (w, 1L)),
        _ + _)
      .toDF("word", "cnt")
  }

  /** ii.go semantics over any DataFrame with `source` and `text`
    * columns — including the reference's own Project Gutenberg books
    * (source = filename), which is exactly what test-ii.sh feeds it
    * (see TextMapReduceSpec's golden-diff replay).
    */
  def invertedIndexOver(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(array_distinct(split(col("text"), WordSplit))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(collect_set(col("source")).as("srcs"))
      .select(col("word"),
        size(col("srcs")).cast("long").as("n_docs"),
        array_join(array_sort(col("srcs")), ",").as("docs"))

  /** ii.go: word → (distinct-doc count, comma-joined sorted docs).
    * Single shuffle: per-document dedup happens in the array domain
    * before the explode, cross-document dedup inside `collect_set` —
    * no separate `distinct` pass.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    invertedIndexOver(Tables.documents(spark, sfDir).select("source", "text"))

  /** Map-only job (the framework with nReduce=0 → identity reduce):
    * distributed grep over documents.
    */
  def grep(spark: SparkSession, sfDir: String, pattern: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"), col("source"), col("n_chars"))

  /** master_splitmerge.go parity: globally key-sorted reduce output.
    * Spark's range-partitioned sort reproduces the master's merge of
    * per-reducer sorted files — rank makes the total order a
    * first-class, oracle-checkable column.
    *
    * The rank is assigned with the zipWithIndex pattern, NOT a
    * global `row_number()` window (which would move every row to a
    * single partition): after the range sort, one metadata-sized job
    * counts rows per partition (one long per partition crosses the
    * driver), and each partition then adds its cumulative offset to a
    * local counter in place. The data itself never funnels through
    * one task — this is exactly the reference master's merge of
    * per-reducer sorted files, expressed as offsets.
    */
  def sortedWordCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sorted = wordCount(spark, sfDir)
      .select(col("word"), col("cnt"))
      .orderBy(col("word")) // range-partitioned total sort
    val indexed = sorted.as[(String, Long)].rdd
      .zipWithIndex()
      .map { case ((w, c), i) => (w, c, i + 1L) }
    spark.createDataset(indexed).toDF("word", "cnt", "rnk")
  }

  /** Top-k words: the groupBy+orderBy+limit shape, k small enough to
    * collect — on a cluster this is a partial top-k per partition then
    * a single-reducer merge (Spark's TakeOrderedAndProject).
    */
  def topWords(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame =
    wordCount(spark, sfDir)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(k)
}
