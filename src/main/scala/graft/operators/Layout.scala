package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering.
  *
  * A 100 TB fact table is pruned through per-file min/max statistics;
  * a single `ORDER BY time` layout gives perfect pruning on time and
  * none on anything else. Interleaving the bits of two dimensions
  * into one Morton key and range-partitioning + sorting on it gives
  * every file a SMALL BOUNDING BOX in both dimensions at once — the
  * layout trick behind Delta/Iceberg `ZORDER BY`, here expressed as
  * plain declarative Spark: a projection (the bit cascade is pure
  * column arithmetic, whole-stage-codegen'd), a `repartitionByRange`
  * on the key, and `sortWithinPartitions`.
  *
  * Scale shape: the key is computed per-row with no shuffle; the one
  * exchange is the range partition that any layout rewrite must pay.
  * Nothing is collected; file statistics come from the engine's own
  * parquet footers on the way back in.
  */
object Layout {

  /** Number of low bits of each dimension that participate in the
    * interleave (11 bits covers user_id at every shipped SF without
    * wrapping; the mask keeps the cascade correct for any input).
    */
  private val DimBits = 11
  private val DimMask = (1L << DimBits) - 1

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit word — the classic mask cascade (public-domain "Bit
    * Twiddling Hacks" interleave). Four masked shift-or steps, all
    * plain integer arithmetic, so Catalyst keeps the whole key inside
    * one codegen'd projection.
    */
  private def spreadBits(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key: bits of `u` at even positions, bits of `d` at odd. */
  def mortonZ(u: Column, d: Column): Column =
    spreadBits(u).bitwiseOR(shiftleft(spreadBits(d), 1))

  /** Events mapped to Z-cells over (user, epoch-day). */
  private def eventCells(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("user_id").bitwiseAND(lit(DimMask)).as("ub"),
      datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
        .cast("long").bitwiseAND(lit(DimMask)).as("db"))
      .withColumn("z", mortonZ(col("ub"), col("db")))

  /** The gated query: per-Z-bucket occupancy and bounding box.
    *
    * `bucket = z >> 8` fixes all but the low 4 bits of EACH
    * dimension, so every bucket's bounding box is at most 16×16 cells
    * regardless of data volume — the structural guarantee that makes
    * the layout prune (asserted as `u_span`/`d_span` ≤ 15 by
    * LayoutSpec, and hash-gated against the same cascade replayed in
    * the oracle).
    */
  def zorderEvents(spark: SparkSession, sfDir: String): DataFrame =
    eventCells(spark, sfDir)
      .withColumn("bucket", shiftright(col("z"), 8).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        min(col("ub")).as("min_u"), max(col("ub")).as("max_u"),
        min(col("db")).as("min_d"), max(col("db")).as("max_d"))
      .withColumn("u_span", col("max_u") - col("min_u"))
      .withColumn("d_span", col("max_d") - col("min_d"))

  /** Write the Z-ordered layout and return per-FILE bounding boxes
    * from the re-read — the statistics min/max pruning actually uses.
    * Spec-gated (file boundaries depend on range sampling, so this is
    * measured, not oracle-hashed): the mean per-file user span must
    * beat the natural time-ordered layout by a wide margin.
    */
  def zorderFileStats(spark: SparkSession, sfDir: String,
      nFiles: Int = 16, ordered: Boolean = true): DataFrame = {
    val cells = eventCells(spark, sfDir)
    val laid = if (ordered)
      cells.repartitionByRange(nFiles, col("z")).sortWithinPartitions("z")
    else cells.repartition(nFiles)
    val dir = graft.TempDirs.create(
      if (ordered) "graft_zorder" else "graft_zorder_base").toString
    laid.write.mode(SaveMode.Overwrite).parquet(dir)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ub")) - min(col("ub"))).as("u_span"),
        (max(col("db")) - min(col("db"))).as("d_span"))
  }

  /** Small-file COMPACTION — the other chronic 100 TB layout disease
    * beside poor clustering: streaming ingest and over-parallel
    * writers leave thousands of KB-sized files whose per-file open/
    * footer cost dominates the scan. The op simulates the diseased
    * landing zone (the corpus scattered across `smallFiles` shards),
    * then compacts by rewriting through `repartition(targetFiles)` —
    * one round-robin shuffle, no ordering assumption — and returns
    * the re-read of the compacted copy. The driver gate hashes it
    * against the source table: compaction must move BYTES, never
    * change CONTENT. LayoutSpec pins the file counts before/after.
    *
    * (At 100 TB the same rewrite runs per-partition-directory with
    * `maxRecordsPerFile` sizing; the shape — read small, shuffle
    * once, write big — is identical.)
    */
  def compactFiles(spark: SparkSession, sfDir: String,
      smallFiles: Int = 64, targetFiles: Int = 4): DataFrame =
    spark.read.parquet(compactRun(spark, sfDir, smallFiles, targetFiles)._2)

  /** The write half of [[compactFiles]]: builds the scattered landing
    * zone and its compacted rewrite, returning both dirs so the spec
    * can count files.
    */
  private[graft] def compactRun(spark: SparkSession, sfDir: String,
      smallFiles: Int = 64, targetFiles: Int = 4): (String, String) = {
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val small = graft.TempDirs.create("graft_compact_small").toString
    rows.repartition(smallFiles)
      .write.mode(SaveMode.Overwrite).parquet(small)
    val compacted = graft.TempDirs.create("graft_compact_big").toString
    spark.read.parquet(small)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(compacted)
    (small, compacted)
  }

  /** Parquet data-file count in a written directory — LayoutSpec's
    * before/after compaction measure.
    */
  private[graft] def parquetFileCount(dir: String): Long =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))

  /** ZONE-MAP SKIP accounting — the Delta/Iceberg file-skipping
    * mechanic made measurable: per-file min/max statistics on the
    * QUERY column (event day) decide which files a 5-day time-window
    * scan may skip, reported for the SAME corpus under two layouts —
    * day-CLUSTERED buckets (4-day ranges) versus user-hash SCATTERED
    * buckets. The report is the point: clustered zone maps prune most
    * buckets; scattered ones prune nothing because every file's
    * [min, max] day spans the whole month — zone maps are only as
    * good as the clustering beneath them ([[zorderEvents]] is what
    * buys the tight boxes). Both layouts round-trip through REAL
    * partitioned parquet writes, so the gate hashes the write →
    * read-back → footer-style stats → skip decision end to end.
    * Bucket rules are deterministic projections (day range / user
    * hash) rather than sampled range splits — what keeps the file
    * population oracle-replayable.
    *
    * Scale shape: one scan per layout write (any layout rewrite pays
    * it), stats are a partial-aggregated groupBy to O(#files) rows,
    * and the skip predicate is evaluated on that tiny frame.
    */
  def zonemapSkip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("date").as("day"))
    val d0 = ev.agg(min(col("day")).as("m"))
    val clustered = ev.crossJoin(broadcast(d0))
      .withColumn("bucket",
        floor(datediff(col("day"), col("m")) / lit(4.0)).cast("long"))
      .drop("m")
    val scattered = ev.withColumn("bucket", pmod(col("user_id"), lit(8L)))
    def roundTrip(df: DataFrame, name: String): DataFrame = {
      val dir = graft.TempDirs.create(s"graft_zonemap_$name").toString
      df.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(name))
    }
    // the probe window is DERIVED from the corpus epoch (days 10-14
    // of the month), not calendar literals — a regenerated testdata
    // epoch (it has happened) must not silently turn the report
    // all-scanned
    roundTrip(clustered, "clustered").union(roundTrip(scattered, "scattered"))
      .crossJoin(broadcast(d0))
      .withColumn("scanned",
        !(col("max_day") < date_add(col("m"), 9) ||
          col("min_day") > date_add(col("m"), 13)))
      .select(col("layout"), col("bucket"), col("min_day"),
        col("max_day"), col("n_rows"), col("scanned"))
  }

  /** SHARD-REBALANCE AUDIT: how much data MOVES when the shard count
    * grows 8 → 9 under (a) mod-N hashing and (b) a 64-vnode
    * CONSISTENT-HASH ring — the measured case for why every real
    * 100 TB shard/cache layer runs a ring (mod-N relocates ~(N)/(N+1)
    * of all keys on every resize; the ring relocates ~1/(N+1), only
    * the arc the new shard's vnodes claim). Key and vnode positions
    * are 48-bit md5 prefixes (the engine's cross-engine hash recipe),
    * the ring is ONE sorted vnode array built from a bounded
    * `spark.range` and broadcast (512/576 structs), and each key's
    * owner is the hash's ring SUCCESSOR via an array `filter` head —
    * a pure per-row projection over the broadcast array, no join, no
    * window, one corpus scan for both strategies and both sizes.
    */
  def shardRebalance(spark: SparkSession, sfDir: String,
      vnodes: Int = 64): DataFrame = {
    def md5long(c: Column): Column =
      conv(substring(md5(c), 1, 12), 16, 10).cast("long")
    val keys = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5long(concat(lit("key:"), col("doc_id").cast("string")))
          .as("kh"))
    def ring(n: Int, name: String): DataFrame =
      spark.range(n.toLong * vnodes)
        .select((col("id") / vnodes).cast("long").as("s"),
          (col("id") % vnodes).cast("long").as("v"))
        .select(struct(
          md5long(concat(lit("vn:"), col("s").cast("string"), lit(":"),
            col("v").cast("string"))).as("hv"),
          col("s")).as("e"))
        .agg(sort_array(collect_list(col("e"))).as(name))
    val assigned = keys
      .crossJoin(broadcast(ring(8, "ring8")))
      .crossJoin(broadcast(ring(9, "ring9")))
      .select(
        pmod(col("doc_id"), lit(8L)).as("m8"),
        pmod(col("doc_id"), lit(9L)).as("m9"),
        coalesce(expr("get(filter(ring8, e -> e.hv >= kh), 0).s"),
          expr("ring8[0].s")).as("c8"),
        coalesce(expr("get(filter(ring9, e -> e.hv >= kh), 0).s"),
          expr("ring9[0].s")).as("c9"))
      .localCheckpoint()
    def report(name: String, a: Column, b: Column): DataFrame =
      assigned.agg(count(lit(1)).as("n_keys"),
          sum(when(a =!= b, 1L).otherwise(0L)).as("moved"))
        .select(lit(name).as("strategy"), col("n_keys"), col("moved"),
          round(col("moved").cast("double") / col("n_keys").cast("double"),
            6).as("moved_share"))
    report("mod", col("m8"), col("m9"))
      .unionByName(report("ring", col("c8"), col("c9")))
  }
}
