// Synthesize an sf1-scale dataset (10x sf0.1) for scaling-exponent
// measurement — SURVEY §6.5. Run with:
//   /opt/spark/bin/spark-shell --master local[32] -I scripts/gen_sf1.sc
//
// Copy 0 is the untouched sf0.1 data; copies 1..9 stride every key
// column by i * 1e9 so join integrity holds within a copy and no key
// collides across copies. Two distribution guards keep the scaled
// corpus honest for the operators that care:
//   - documents: EVERY word of a copied doc is salted with a copy
//     letter (a bijection on the copy's vocabulary, so all within-
//     copy equality structure — exact dups, shingle matches,
//     substring repeats — is preserved verbatim while cross-copy
//     shingle overlap is zero). A weaker 1-in-3 salt left enough
//     shared shingles that the 10 copies formed near-dup cliques
//     (measured: 256 -> 201k similarity edges, 786x for 10x docs) —
//     which benchmarks a data artifact, not the engine;
//   - embeddings: copy i's vectors are the originals with their
//     dimensions circularly ROTATED by i — a norm- and inner-
//     product-preserving permutation, so each copy is the same
//     corpus in a rotated basis (within-copy neighbor structure
//     exact) while cross-copy cosines decorrelate to ~0. A small
//     additive perturbation was not enough: ~0.999-cosine clones
//     share every SRP band code, stuff the LSH buckets, and square
//     the candidate count — an artifact, not a measurement.
// Dimension tables (nation, region) stay fixed — dims don't scale.
// read the driver parquet's naive microsecond timestamps as LTZ
// (session=UTC) — without this the copies land NTZ-annotated and the
// watermarked streaming keys refuse the column
spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val src = "/root/testdata/sf0.1"
val dst = "/root/repo/.benchdata/sf1"
val S = 1000000000L
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
  (0 until 10).map(i => f(df, i)).reduce(_ unionByName _)
def shift(c: String, i: Int) = col(c) + lit(i.toLong * S)
val li = spark.read.parquet(s"$src/lineitem.parquet")
copies(li, (d, i) => d.withColumn("l_orderkey", shift("l_orderkey", i)).withColumn("l_partkey", shift("l_partkey", i)).withColumn("l_suppkey", shift("l_suppkey", i))).repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
val or = spark.read.parquet(s"$src/orders.parquet")
copies(or, (d, i) => d.withColumn("o_orderkey", shift("o_orderkey", i)).withColumn("o_custkey", shift("o_custkey", i))).repartition(16).write.mode("overwrite").parquet(s"$dst/orders.parquet")
val cu = spark.read.parquet(s"$src/customer.parquet")
copies(cu, (d, i) => d.withColumn("c_custkey", shift("c_custkey", i))).repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")
val pa = spark.read.parquet(s"$src/part.parquet")
copies(pa, (d, i) => d.withColumn("p_partkey", shift("p_partkey", i))).repartition(4).write.mode("overwrite").parquet(s"$dst/part.parquet")
val su = spark.read.parquet(s"$src/supplier.parquet")
copies(su, (d, i) => d.withColumn("s_suppkey", shift("s_suppkey", i))).repartition(2).write.mode("overwrite").parquet(s"$dst/supplier.parquet")
// events: the STREAMING keys impose two extra constraints —
//   (1) copies must be TIME-SHIFTED (x10 copies of the same month
//       re-cover the watermark window and mass-drop whole copies as
//       late: the first measurement emitted ZERO join rows), making
//       sf1 a 10x-LONGER stream with within-copy dynamics exact;
//   (2) the table must land as ONE parquet FILE like the driver's
//       (the stream keys symlink "$dir/events.parquet" into a feed
//       dir, and FileStreamSource does NOT follow a directory
//       symlink — a dir-shaped table feeds zero rows silently).
val ev = spark.read.parquet(s"$src/events.parquet")
copies(ev, (d, i) => d.withColumn("event_id", shift("event_id", i)).withColumn("user_id", shift("user_id", i)).withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 40} DAYS"))).orderBy("ts").coalesce(1).write.mode("overwrite").parquet(s"$dst/events_dir.parquet")
{ val part = new java.io.File(s"$dst/events_dir.parquet").listFiles.filter(_.getName.endsWith(".parquet")).head
  java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dst/events.parquet"), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  new java.io.File(s"$dst/events_dir.parquet").listFiles.foreach(_.delete()); new java.io.File(s"$dst/events_dir.parquet").delete() }
val doc = spark.read.parquet(s"$src/documents.parquet")
def salt(i: Int) = if (i == 0) col("text") else { val sfx = ('a' + i).toChar; concat_ws(" ", expr(s"transform(split(text, ' '), w -> concat(w, 'q$sfx'))")) }
copies(doc, (d, i) => d.withColumn("doc_id", shift("doc_id", i)).withColumn("text", salt(i)).withColumn("n_chars", length(col("text")).cast("long"))).repartition(8).write.mode("overwrite").parquet(s"$dst/documents.parquet")
val em = spark.read.parquet(s"$src/embeddings.parquet")
def perturb(i: Int) = if (i == 0) col("embedding") else expr(s"transform(sequence(0, size(embedding) - 1), j -> element_at(embedding, ((j + $i) % size(embedding)) + 1))")
copies(em, (d, i) => d.withColumn("embedding", perturb(i)).withColumn("vec_id", shift("vec_id", i))).repartition(4).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
for (t <- Seq("nation", "region")) spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
println("GEN_SF1_DONE " + Seq("lineitem", "orders", "events", "documents", "embeddings").map(t => t + "=" + spark.read.parquet(s"$dst/$t.parquet").count()).mkString(" "))
