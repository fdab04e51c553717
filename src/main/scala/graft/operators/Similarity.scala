package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY §2.D).
  *
  * `annTopkBrute` is the exact baseline: broadcast the (small) query
  * set against the corpus — the corpus side streams, so it scales to
  * any corpus size as long as the query batch is broadcastable.
  * `annLsh` is the 100 TB path: sign-random-projection buckets keyed
  * by a 16-bit code; the self-join shuffles on bucket codes instead of
  * comparing n² pairs.
  *
  * Cosine is computed in double via `zip_with` + left-fold
  * `aggregate` — sequential summation order, which DuckDB's
  * `list_cosine_similarity` reproduces bit-for-bit, keeping the brute
  * variant oracle-gated.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns (codegen'd HOFs,
    * left-to-right summation).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  /** Exact top-k neighbors for the first nQueries vectors.
    * Output (query_id, neighbor_id, rnk); the similarity value itself
    * stays internal so ordering (not float formatting) is what the
    * oracle checks. Self-matches excluded.
    */
  def annTopkBrute(spark: SparkSession, sfDir: String,
      k: Int = 10, nQueries: Int = 20): DataFrame = {
    val all = vecs(spark, sfDir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    joined
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  val NumPlanes = 16

  /** Deterministic pseudo-random hyperplanes: component d of plane p
    * is derived from xxhash64 of "p:d" mapped into [-0.5, 0.5).
    * Derivation happens in-plan (codegen'd), no driver-side state.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(concat_ws(":", lit(p), d)), lit(100000L)).cast("double")
      / 100000.0d) - 0.5d

  /** 16-bit sign-random-projection bucket code for a vector column. */
  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { p =>
      val proj = aggregate(
        transform(v, (x, i) => x * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed near-neighbor pairs: vectors sharing a bucket code,
    * verified by exact cosine ≥ threshold. The shuffle key is the
    * 16-bit code — linear in corpus size.
    */
  def annLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    val coded = vecs(spark, sfDir)
      .withColumn("bucket", lshBucket(col("v")))
    coded.as("x").join(coded.as("y"),
        col("x.bucket") === col("y.bucket")
          && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosine(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.bucket").as("bucket"), col("cos"))
  }
}
