package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every operator the engine supports is exposed here as a named query
  * over a scale-factor directory; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextMapReduce.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. MapReduce-core parity
    "mr_wordcount" -> ((s, d) => TextMapReduce.wordCount(s, d)),
    "mr_wordcount_api" -> ((s, d) => TextMapReduce.wordCountViaApi(s, d)),
    "mr_inverted_index" -> ((s, d) => TextMapReduce.invertedIndex(s, d)),
    "mr_grep" -> ((s, d) => TextMapReduce.grep(s, d, GrepPattern)),
    "mr_sort" -> ((s, d) => TextMapReduce.sortedWordCount(s, d)),
    "mr_top_words" -> ((s, d) => TextMapReduce.topWords(s, d, 100)),
  )

  /** Regex valid with identical semantics in Java regex (Spark rlike)
    * and RE2 (DuckDB regexp_matches): unanchored contains.
    */
  val GrepPattern = "vector [a-z]+ merge"

  private val wordcountSql =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "mr_wordcount" -> wordcountSql,
    "mr_wordcount_api" -> wordcountSql,
    "mr_inverted_index" ->
      """SELECT word, count(*) AS n_docs,
        |       string_agg(source, ',' ORDER BY source) AS docs
        |FROM (SELECT DISTINCT source, word
        |      FROM (SELECT source,
        |                   unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |            FROM documents))
        |WHERE word <> ''
        |GROUP BY word""".stripMargin,
    "mr_grep" ->
      s"SELECT doc_id, source, n_chars FROM documents WHERE regexp_matches(text, '$GrepPattern')",
    "mr_sort" ->
      s"""SELECT word, cnt, row_number() OVER (ORDER BY word) AS rnk
         |FROM ($wordcountSql)""".stripMargin,
    "mr_top_words" ->
      s"""SELECT word, cnt FROM ($wordcountSql)
         |ORDER BY cnt DESC, word LIMIT 100""".stripMargin,
  )
}
