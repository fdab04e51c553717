// Synthesize the sf10 BATCH tables (10x the synthetic sf1, 100x the
// gate sf0.1) for the round-19 parallelism measurement — VERDICT r18
// item 9: the c8-vs-c32 block at sf0.1 (and, measured this round, at
// sf1) is fixed-cost-bound, so demonstrating parallel speedup needs a
// decade more data under the scan/join/explode keys. Run with:
//   /opt/spark/bin/spark-shell --master local[32] -I scripts/gen_sf10_batch.sc
//
// Same discipline as scripts/gen_sf1.sc, one level up:
//   - keys strided by 1e11 (sf1 ids top out below 1e10), so join
//     integrity holds within a copy and nothing collides across;
//   - documents: EVERY word of a copied doc gets a second-level
//     copy salt ('qA'..'qI', disjoint from sf1's lowercase salts) —
//     a bijection on the copy's vocabulary, so within-copy equality
//     structure is preserved verbatim and cross-copy shingle overlap
//     stays zero;
//   - embeddings are NOT scaled: sf1 already uses the 10 distinct
//     64-dim rotations; 100 copies would need 100 decorrelated
//     isometries and rotation composition collides mod 64 (identical
//     vectors across copies = planted mega-cliques, an artifact).
//     The sf10 parallelism demo therefore uses scan/join/text keys.
spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val src = "/root/repo/.benchdata/sf1"
val dst = "/root/repo/.benchdata/sf10"
val S = 100000000000L
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame = (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
def shift(c: String, i: Int) = col(c) + lit(i.toLong * S)
val li = spark.read.parquet(s"$src/lineitem.parquet")
copies(li, (d, i) => d.withColumn("l_orderkey", shift("l_orderkey", i)).withColumn("l_partkey", shift("l_partkey", i)).withColumn("l_suppkey", shift("l_suppkey", i))).repartition(64).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
val or = spark.read.parquet(s"$src/orders.parquet")
copies(or, (d, i) => d.withColumn("o_orderkey", shift("o_orderkey", i)).withColumn("o_custkey", shift("o_custkey", i))).repartition(32).write.mode("overwrite").parquet(s"$dst/orders.parquet")
val cu = spark.read.parquet(s"$src/customer.parquet")
copies(cu, (d, i) => d.withColumn("c_custkey", shift("c_custkey", i))).repartition(8).write.mode("overwrite").parquet(s"$dst/customer.parquet")
val pa = spark.read.parquet(s"$src/part.parquet")
copies(pa, (d, i) => d.withColumn("p_partkey", shift("p_partkey", i))).repartition(8).write.mode("overwrite").parquet(s"$dst/part.parquet")
val su = spark.read.parquet(s"$src/supplier.parquet")
copies(su, (d, i) => d.withColumn("s_suppkey", shift("s_suppkey", i))).repartition(4).write.mode("overwrite").parquet(s"$dst/supplier.parquet")
val doc = spark.read.parquet(s"$src/documents.parquet")
def salt(i: Int) = if (i == 0) col("text") else { val sfx = ('A' + i).toChar; concat_ws(" ", expr(s"transform(split(text, ' '), w -> concat(w, 'q$sfx'))")) }
copies(doc, (d, i) => d.withColumn("doc_id", shift("doc_id", i)).withColumn("text", salt(i)).withColumn("n_chars", length(col("text")).cast("long"))).repartition(16).write.mode("overwrite").parquet(s"$dst/documents.parquet")
for (t <- Seq("nation", "region")) spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
println("GEN_SF10_BATCH_DONE " + Seq("lineitem", "orders", "documents").map(t => t + "=" + spark.read.parquet(s"$dst/$t.parquet").count()).mkString(" "))
sys.exit(0)
