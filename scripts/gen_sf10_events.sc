// Synthesize the sf10 EVENTS stream (10x the synthetic sf1, so 100x
// the gate sf0.1) for the round-18 stream re-measure — SURVEY §6.5's
// ADVICE-3 residual: stream_dedup (exp 0.34 at sf1) and
// stream_sessionize (0.22) carry the largest state-churn exponents
// and need one more decade before the 100 TB claim is trusted.
// Run with:
//   /opt/spark/bin/spark-shell --master local[32] -I scripts/gen_sf10_events.sc
//
// Only events is needed: both keys feed on "$dir/events.parquet"
// alone. The sf1 lessons apply verbatim (scripts/gen_sf1.sc):
//   - copies TIME-SHIFTED far apart (sf1 spans ~1 year, so stride
//     400 days x 10 copies ~ 11 years of stream time) — overlapping
//     copies re-cover the watermark window and mass-drop as late;
//   - ids strided so no event/user collides across copies;
//   - the table must land as ONE parquet FILE, ts-sorted
//     (FileStreamSource does not follow a directory symlink).
spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")
import org.apache.spark.sql.functions._
val src = "/root/repo/.benchdata/sf1/events.parquet"
val dst = "/root/repo/.benchdata/sf10"
new java.io.File(dst).mkdirs()
val S = 100000000000L // above sf1's max strided id (9e9 + sf0.1 ids)
val ev = spark.read.parquet(src)
val all = (0 until 10).map(i => ev
  .withColumn("event_id", col("event_id") + lit(i * S))
  .withColumn("user_id", col("user_id") + lit(i * S))
  .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 400} DAYS"))
).reduce(_ unionByName _)
all.orderBy("ts").coalesce(1).write.mode("overwrite")
  .parquet(s"$dst/events_dir.parquet")
{ val part = new java.io.File(s"$dst/events_dir.parquet").listFiles
    .filter(_.getName.endsWith(".parquet")).head
  java.nio.file.Files.move(part.toPath,
    java.nio.file.Paths.get(s"$dst/events.parquet"),
    java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  new java.io.File(s"$dst/events_dir.parquet").listFiles.foreach(_.delete())
  new java.io.File(s"$dst/events_dir.parquet").delete() }
println("GEN_SF10_DONE n=" +
  spark.read.parquet(s"$dst/events.parquet").count())
