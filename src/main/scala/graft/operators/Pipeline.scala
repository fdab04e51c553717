package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CatalystExprs.dot_product

/** End-to-end corpus curation — the composition this engine exists
  * for: near-dup removal (keep one canonical doc per cluster) ∘
  * quality filter ∘ language filter, in one declarative plan. Each
  * stage is an already-verified operator; composing them costs no
  * extra passes because Catalyst fuses the projections.
  */
object Pipeline {

  def curate(spark: SparkSession, sfDir: String,
      minWords: Long = 20): DataFrame = {
    // near-dup edges come from the MinHash-LSH path (threshold-matched
    // to the exact-Jaccard oracle): at 100 TB the candidate join is
    // keyed on band signatures, never an all-pairs shingle self-join
    val canonical = Dedup.clustersLsh(spark, sfDir)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")
    val quality = TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), col("n_words"))
      .filter(col("n_words") >= minWords)
    val lang = TextAnalysis.langId(spark, sfDir)
      .filter(col("pred_lang") === "en")
      .select(col("doc_id"), col("pred_lang"))
    canonical
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .select("doc_id", "n_words", "pred_lang")
  }

  /** Vector-table statistics per label: min/max norm (order-stable
    * extremes — a SUM of norms would be shuffle-order-dependent) and
    * cardinality.
    */
  def vectorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"),
        sqrt(dot_product(
          transform(col("embedding"), _.cast("double")),
          transform(col("embedding"), _.cast("double")))).as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
}
