package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

class SourcesV2Spec extends SparkSpec {

  private def grid(rows: Long, slices: Int) =
    spark.read.format("graft.sources.v2.SyntheticSource")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  test("dsv2: the grid is the declared arithmetic, end to end") {
    val got = grid(1000, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 1000)
    assert(got(17) == ((17L, 17, (17L * 2654435761L) % 1000000007L)))
    assert(got.map(_._1).toSeq == (0L until 1000L))
  }

  test("dsv2: id-range predicates prune partitions at planning time " +
      "and leave no residual Filter node") {
    val df = grid(200000, 8)
      .filter(col("id") >= 120000L && col("id") < 180000L)
    // 8 slices of 25k over [0, 200k); [120k, 180k) overlaps exactly 4
    assert(df.rdd.getNumPartitions == 4,
      s"partitions=${df.rdd.getNumPartitions}")
    // the absorbed predicates must NOT be re-evaluated above the scan
    val filters = df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.isEmpty, s"residual filters: $filters")
    assert(df.count() == 60000)
    // a NON-absorbable predicate stays in the plan (conservative path)
    val mixed = grid(1000, 4).filter(col("grp") === 3)
    val residual = mixed.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(residual.nonEmpty, "grp predicate should stay post-scan")
    assert(mixed.count() == 50)
  }

  test("dsv2: column pruning narrows the scan's read schema") {
    val df = grid(1000, 4).select("grp").distinct()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=grp"), plan)
    assert(!plan.contains("cols=id,grp,val"), plan)
    assert(df.count() == 20)
  }

  test("dsv2: the registry query matches the range() oracle shape") {
    val r = SparkEntry.queries("q_dsv2_source")(spark, sf)
      .orderBy("grp").collect()
    assert(r.length == 20)
    // every group sees 60000/20 = 3000 ids
    assert(r.forall(_.getLong(1) == 3000L))
  }

  test("dsv2 catalog: SQL through the TableCatalog equals the DataFrame " +
      "connector, keeps pushdown and pruning, and rejects DDL") {
    val viaSql = graft.sources.Formats.catalogGridRollup(spark)
    val viaDf = graft.sources.Formats.dsv2Aggregate(spark)
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    // the catalog path must preserve planning-time pruning (4 of 8
    // slices) and absorbed filters (no residual Filter over the scan)
    val resolved = spark.sql(
      """SELECT id, grp FROM graftcat.main.grid
        |WHERE id >= 120000 AND id < 180000""".stripMargin)
    assert(resolved.rdd.getNumPartitions == 4,
      s"partitions=${resolved.rdd.getNumPartitions}")
    val filters = resolved.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.isEmpty, s"residual filters through catalog: $filters")
    // SHOW TABLES resolves through listTables
    val shown = spark.sql("SHOW TABLES IN graftcat.main").collect()
      .map(_.getString(1))
    assert(shown.contains("grid"), s"listTables missing grid: ${shown.toSeq}")
    // unknown tables surface as analysis errors, not silent nulls
    intercept[Exception] {
      spark.sql("SELECT * FROM graftcat.main.nope").collect()
    }
    // the catalog is read-only: DDL rejects loudly
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graftcat.main.grid")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("read-only")),
      s"DROP failed for the wrong reason: $e")
  }

  test("dsv2 function catalog: the magic-method path agrees with " +
      "produceResult, the rollup matches the stored column, and the " +
      "scan prunes away the recomputed column") {
    import graft.sources.v2.{KnuthVal, SyntheticTable}
    // both evaluation paths implement the same arithmetic
    for (id <- Seq(0L, 1L, 17L, 123456L)) {
      assert(KnuthVal.Bound.invoke(id) == SyntheticTable.valOf(id))
      assert(KnuthVal.Bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(id)) ==
        SyntheticTable.valOf(id))
    }
    // recomputing val through the function equals reading the column
    val viaFn = graft.sources.Formats.catalogFnRollup(spark)
    val viaCol = graft.sources.Formats.catalogGridRollup(spark)
    assert(viaFn.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaFn).isEmpty)
    // the function consumes only id, so the scan must not read val
    val scans = viaFn.queryExecution.executedPlan.toString
    assert(scans.contains("cols=id,grp") || scans.contains("cols=grp,id"),
      s"scan did not prune val:\n$scans")
    // resolver surfaces: SHOW FUNCTIONS lists it, unknown names fail
    val fns = spark.sql("SHOW FUNCTIONS IN graftcat.main").collect()
      .map(_.getString(0))
    assert(fns.exists(_.contains("knuth_val")), s"missing: ${fns.toSeq}")
    intercept[Exception] {
      spark.sql("SELECT graftcat.main.nope(1)").collect()
    }
  }

  test("dsv2 sink: the committed round-trip preserves content exactly " +
      "and readers see only manifest-listed files") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_spec").toString
    val src = Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"), col("event_type"), col("n"),
        col("sv").cast("decimal(18,2)").as("sum_value"))
      .cache()
    src.write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val back = GraftSink.readBack(spark, dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "sink round-trip changed content")
    // visibility contract: a stray file in the directory that the
    // manifest does not list is invisible to readers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-99999.tsv"),
      "1\tbogus\t1\t1.00\n".getBytes("UTF-8"))
    val after = GraftSink.readBack(spark, dir)
    assert(after.filter(col("event_type") === "bogus").isEmpty,
      "reader picked up an uncommitted file")
    // and no temp files survive a clean commit
    val stray = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".tmp-"))
    assert(stray.isEmpty, s"leftover temps: ${stray.toSeq}")
    // a SECOND append job must not clobber the first: job-unique part
    // names and a merged manifest keep every earlier row visible
    val extra = src.limit(3).cache()
    extra.write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val merged = GraftSink.readBack(spark, dir)
      .filter(col("event_type") =!= "bogus")
    assert(merged.count() == src.count() + 3,
      "second append lost or clobbered rows")
    assert(merged.exceptAll(src.unionAll(extra)).isEmpty,
      "append-merged content diverged")
  }

  test("dsv2 sink: a first-attempt writer failure aborts its temp and " +
      "the re-attempt commits exactly-once output") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_retry").toString
    val src = Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"), col("event_type"), col("n"),
        col("sv").cast("decimal(18,2)").as("sum_value"))
      .cache()
    GraftSink.aborted.set(0)
    GraftSink.failFirstAttempt.set(true)
    try {
      src.write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).mode("append").save()
    } finally GraftSink.failFirstAttempt.set(false)
    assert(GraftSink.aborted.get() >= 1,
      "the injected failure never aborted a writer")
    val back = GraftSink.readBack(spark, dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "retried write duplicated or lost rows")
    val stray = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".tmp-"))
    assert(stray.isEmpty, s"aborted attempt left temps: ${stray.toSeq}")
  }

  test("dsv2 sink time travel: appends never rewrite a committed " +
      "snapshot, and every generation reads back as-of exactly") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_tt_spec").toString
    def write(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("doc_id", "n_chars")
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).mode("append").save()
    write(Seq((1L, 10L), (2L, 20L)))
    assert(GraftSink.versions(dir) == Seq(1))
    val v1Bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, s"${GraftSink.VersionPrefix}1"))
    val v1Before = GraftSink.readBackAsOf(spark, dir, 1, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    write(Seq((3L, 30L)))
    assert(GraftSink.versions(dir) == Seq(1, 2))
    // the committed snapshot is byte-identical after the append,
    // and the as-of read is repeatable
    assert(java.util.Arrays.equals(v1Bytes,
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"${GraftSink.VersionPrefix}1"))))
    assert(GraftSink.readBackAsOf(spark, dir, 1, schema)
      .as[(Long, Long)].collect().sorted.toSeq == v1Before)
    assert(v1Before == Seq((1L, 10L), (2L, 20L)))
    assert(GraftSink.readBackAsOf(spark, dir, 2, schema)
      .as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // the live manifest equals the latest generation
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // asking for an uncommitted generation fails loudly
    intercept[IllegalArgumentException] {
      GraftSink.readBackAsOf(spark, dir, 3, schema)
    }
  }

  test("dsv2 sink vacuum: strays and expired snapshots go, every " +
      "referenced file and retained generation stays") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_vac_spec").toString
    def write(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("doc_id", "n_chars")
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).mode("append").save()
    write(Seq((1L, 10L)))
    write(Seq((2L, 20L)))
    Files.write(Paths.get(dir, ".tmp-orphan"), "x".getBytes)
    Files.write(Paths.get(dir, "part-stray.tsv"), "y".getBytes)
    val before = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    val (data, mans) = GraftSink.vacuum(dir, keepGenerations = 1)
    assert(data == 2, s"deleted $data strays, planted 2")
    assert(mans == 1, s"expired $mans manifests, want generation 1 only")
    assert(!Files.exists(Paths.get(dir, ".tmp-orphan")))
    assert(!Files.exists(Paths.get(dir, "part-stray.tsv")))
    // retention: generation 2 survives and reads; generation 1 is gone
    assert(GraftSink.versions(dir) == Seq(2))
    intercept[IllegalArgumentException] {
      GraftSink.readBackAsOf(spark, dir, 1, schema)
    }
    // the live read-back is untouched byte-for-byte
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq == before)
    assert(GraftSink.readBackAsOf(spark, dir, 2, schema)
      .as[(Long, Long)].collect().sorted.toSeq == before)
    // idempotent: a second vacuum finds nothing to do
    assert(GraftSink.vacuum(dir, keepGenerations = 1) == ((0, 0)))
    // expiring ALL generations is rejected — generation numbers
    // derive from the newest snapshot, so a full expiry would let a
    // later commit reuse an expired number with different content
    intercept[IllegalArgumentException] {
      GraftSink.vacuum(dir, keepGenerations = 0)
    }
  }

  test("dsv2 sink concurrency: a writer losing the generation race " +
      "retries and merges — final state equals the serialized order") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_race").toString
    val g0 = GraftSink.commitAppend(dir, Seq("part-base-00000.tsv\t1"))
    assert(g0 == 1)
    // interleave: writer B commits COMPLETELY between writer A's head
    // read and A's CREATE_NEW publish attempt — the classic
    // lost-update window, forced deterministically via the hook
    GraftSink.beforePublish.set(() =>
      GraftSink.commitAppend(dir, Seq("part-b-00000.tsv\t2")))
    val gA = GraftSink.commitAppend(dir, Seq("part-a-00000.tsv\t3"))
    // B stole generation 2; A lost, re-read B's head, and won 3
    assert(gA == 3, s"loser should retry into generation 3, got $gA")
    assert(GraftSink.versions(dir) == Seq(1, 2, 3))
    val headFiles = GraftSink.head(dir)._2.map(_.split("\t")(0))
    assert(headFiles.sorted ==
      Seq("part-a-00000.tsv", "part-b-00000.tsv", "part-base-00000.tsv"),
      s"merged head lost an append: $headFiles")
    // B's intermediate snapshot shows exactly the serialized prefix
    assert(GraftSink.head(dir)._1 == 3)
  }

  test("dsv2 sink concurrency: N threads' appends all serialize — " +
      "every entry exactly once, generations strictly append-only") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_stress").toString
    val threads = 8
    val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit =
          (0 until perThread).foreach { i =>
            GraftSink.commitAppend(dir, Seq(f"part-t$t-$i%03d.tsv\t1"))
          }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val total = threads * perThread
    assert(GraftSink.versions(dir) == (1 to total),
      "every commit must win exactly one generation")
    val head = GraftSink.head(dir)._2.map(_.split("\t")(0))
    assert(head.size == total && head.distinct.size == total,
      s"head must list each of the $total appends exactly once")
    // append-only monotonicity: every generation's files are a subset
    // of its successor's
    import scala.jdk.CollectionConverters._
    val gens = GraftSink.versions(dir).map(v =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(dir,
        s"${GraftSink.VersionPrefix}$v")).asScala
        .filter(_.nonEmpty).map(_.split("\t")(0)).toSet)
    gens.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "a later generation dropped an earlier file")
    case _ => () }
  }

  test("dsv2 sink concurrency: a replace commit over a moved head " +
      "fails loudly instead of resurrecting deleted rows") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_cas").toString
    val parent = GraftSink.commitAppend(dir, Seq("part-x-00000.tsv\t1"))
    // the head moves after the replacer computed its new manifest
    GraftSink.commitAppend(dir, Seq("part-y-00000.tsv\t1"))
    intercept[java.util.ConcurrentModificationException] {
      GraftSink.commitReplace(dir, Seq("part-z-00000.tsv\t1"), parent)
    }
    // nothing was published by the failed replace
    assert(GraftSink.head(dir)._2.map(_.split("\t")(0)).sorted ==
      Seq("part-x-00000.tsv", "part-y-00000.tsv"))
  }

  test("dsv2 sink concurrency: two REAL Spark write jobs racing into " +
      "one directory both commit, content is the exact union") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_race2").toString
    // the full DSv2 path (tasks -> temps -> renames -> snapshot CAS)
    // from two driver threads at once, several rounds to give the
    // generation race real chances to fire
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = (0 until 2).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = (0 until 5).foreach { i =>
          val base = (t * 5 + i) * 1000L
          (base + 1 to base + 100).map(j => (j, j))
            .toDF("doc_id", "n_chars").repartition(2)
            .write.format("graft.sources.v2.GraftSinkSource")
            .option("path", dir).mode("append").save()
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    assert(GraftSink.versions(dir) == (1 to 10),
      s"10 jobs must win 10 generations, got ${GraftSink.versions(dir)}")
    val got = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    val want = (0 until 10).flatMap { k =>
      (k * 1000L + 1 to k * 1000L + 100).map(j => (j, j)) }.sorted
    assert(got == want, "concurrent jobs lost or duplicated rows")
    // no stray temps survive the races
    val stray = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".tmp-"))
    assert(stray.isEmpty, s"leftover temps: ${stray.toSeq}")
  }

  test("dsv2 sink txn: a replayed epoch commit is skipped — " +
      "exactly-once under duplicate delivery, parts cleaned up") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_txn").toString
    def write(rows: Seq[(Long, Long)], txn: String): Unit =
      rows.toDF("doc_id", "n_chars")
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).option("txn", txn).mode("append").save()
    write(Seq((1L, 10L)), "epoch-0")
    write(Seq((2L, 20L)), "epoch-1")
    // duplicate delivery of epoch-1 (a restarted stream replaying its
    // last batch): the commit must publish NOTHING new
    val before = GraftSink.head(dir)
    write(Seq((2L, 20L)), "epoch-1")
    assert(GraftSink.head(dir) == before,
      "replayed txn advanced the head")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq == Seq((1L, 10L), (2L, 20L)))
    // the replay's orphaned parts were removed, not left for vacuum
    val strays = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.startsWith("part-") &&
        !GraftSink.head(dir)._2.exists(_.startsWith(n)))
    assert(strays.isEmpty, s"replay left orphaned parts: ${strays.toSeq}")
    // direct API agrees: same txn → -1, new txn → next generation
    assert(GraftSink.commitAppend(dir, Seq("part-dup.tsv\t1"),
      Some("epoch-1")) == -1)
    assert(GraftSink.commitAppend(dir, Nil, Some("epoch-2")) == 3)
    // a replayed epoch must skip idempotently EVEN IF the constraint
    // set moved since it originally committed (its rows were
    // validated against the set in force back then; crashing a
    // correct streaming restart would be the real bug) — while a NEW
    // commit carrying the stale set still aborts atomically
    GraftSink.addConstraint(spark, dir, "pos", "n_chars > 0", schema)
    assert(GraftSink.commitAppend(dir, Seq("part-x.tsv\t1"),
      Some("epoch-2"), expectedChecks = Some(Set.empty)) == -1,
      "replay must skip before the constraint comparison")
    intercept[java.util.ConcurrentModificationException] {
      GraftSink.commitAppend(dir, Seq("part-y.tsv\t1"),
        Some("epoch-9"), expectedChecks = Some(Set.empty))
    }
  }

  test("dsv2 sink zonemap: a range-clustered layout prunes files by " +
      "manifest stats — fewer files opened, identical content") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_zm").toString
    (1L to 400L).map(i => (i, i * 10L)).toDF("doc_id", "n_chars")
      .repartitionByRange(8, col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val (kept, total) = GraftSink.filesFor(dir, "doc_id",
      BigDecimal(30), BigDecimal(70))
    assert(total == 8, s"expected 8 range files, listed $total")
    assert(kept.size < total,
      s"zonemap pruned nothing: ${kept.size} of $total files kept")
    val pruned = GraftSink.readBackWhere(spark, dir, "doc_id",
      BigDecimal(30), BigDecimal(70), schema)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(pruned == (30L to 70L).map(i => (i, i * 10L)),
      "pruned read lost or invented rows")
    // stats honesty: every file's manifest min/max brackets its rows
    val byFile = spark.read.schema(schema).option("sep", "\t")
      .csv(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath): _*)
      .withColumn("f", col("_metadata.file_name"))
      .groupBy("f").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    GraftSink.head(dir)._2.filterNot(_.startsWith("#")).foreach { e =>
      val f = e.split("\t")(0)
      val st = GraftSink.statsOf(e)("doc_id")
      assert(st == ((BigDecimal(byFile(f)._1), BigDecimal(byFile(f)._2))),
        s"manifest stats for $f disagree with file content")
    }
  }

  test("dsv2 sink compact: small files bin-pack into fewer parts, " +
      "content and time travel survive, vacuum reclaims the smalls") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_cpt").toString
    // 8 small parts of 25 rows each, two appends of 4
    (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartition(4).write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    (101L to 200L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartition(4).write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val before = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    val (nBefore, nAfter, gen) =
      GraftSink.compact(spark, dir, targetRows = 100L, schema)
    assert(nBefore == 8 && nAfter < 8 && gen == 3,
      s"got (before=$nBefore, after=$nAfter, gen=$gen)")
    assert(GraftSink.head(dir)._2.count(!_.startsWith("#")) == nAfter)
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq == before,
      "compaction changed content")
    // a large file (>= target) is never rewritten: compacting again
    // with the same target finds at most one small bin — no-op
    assert(GraftSink.compact(spark, dir, targetRows = 100L, schema)
      ._3 <= gen + 1)
    // pre-compaction snapshot still serves; expiry reclaims smalls
    assert(GraftSink.readBackAsOf(spark, dir, 2, schema).count() == 200)
    val (reclaimed, _) = GraftSink.vacuum(dir, keepGenerations = 1)
    assert(reclaimed >= 8 - nAfter,
      s"vacuum reclaimed only $reclaimed replaced files")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq == before)
  }

  test("dsv2 sink merge: updates replace in place, inserts append, " +
      "unmatched files carry by reference, one CAS generation") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_mrg").toString
    // two range-disjoint files: 1..50, 51..100
    (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartitionByRange(2, col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val preFiles = GraftSink.head(dir)._2.map(_.split("\t")(0)).toSet
    // updates touch ONLY the low file (ids 10, 20) + one insert (999)
    val updates = Seq((10L, 1000L), (20L, 2000L), (999L, 9990L))
      .toDF("doc_id", "n_chars")
    val (replaced, inserted, gen) =
      GraftSink.mergeUpsert(spark, dir, updates, "doc_id", schema)
    assert(replaced == 2L && inserted == 1L && gen == 2,
      s"got (replaced=$replaced, inserted=$inserted, gen=$gen)")
    val postFiles = GraftSink.head(dir)._2.map(_.split("\t")(0)).toSet
    assert((preFiles intersect postFiles).size == 1,
      "the untouched high file must survive by reference")
    val got = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 101)
    assert(got(10L) == 1000L && got(20L) == 2000L && got(999L) == 9990L)
    assert(got(11L) == 11L && got(60L) == 60L,
      "non-matched rows must survive the rewrite untouched")
    // time travel still serves the pre-merge state
    assert(GraftSink.readBackAsOf(spark, dir, 1, schema)
      .as[(Long, Long)].collect().toMap.apply(10L) == 10L)
    // duplicate update keys are rejected loudly, nothing committed
    intercept[IllegalArgumentException] {
      GraftSink.mergeUpsert(spark, dir,
        Seq((5L, 1L), (5L, 2L)).toDF("doc_id", "n_chars"), "doc_id", schema)
    }
    assert(GraftSink.versions(dir).max == 2)
  }

  test("dsv2 sink cluster: a hash-scrambled store prunes nothing, the " +
      "clustered rewrite prunes for real, content identical") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_clu").toString
    (1L to 400L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartition(8) // hash-scrambled: every file spans the range
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val (keptBefore, totBefore) =
      GraftSink.filesFor(dir, "doc_id", BigDecimal(30), BigDecimal(70))
    assert(totBefore == 8 && keptBefore.size == 8,
      "hash layout should defeat the zonemap entirely")
    val before = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    GraftSink.cluster(spark, dir, "doc_id", 8, schema)
    val (keptAfter, totAfter) =
      GraftSink.filesFor(dir, "doc_id", BigDecimal(30), BigDecimal(70))
    assert(totAfter == 8 && keptAfter.size < 8,
      s"clustering should enable pruning, kept ${keptAfter.size}/8")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq == before,
      "clustering changed content")
    assert(GraftSink.readBackWhere(spark, dir, "doc_id",
        BigDecimal(30), BigDecimal(70), schema)
      .as[(Long, Long)].collect().sorted.toSeq ==
      (30L to 70L).map(i => (i, i)))
  }

  test("dsv2 sink analyze: persisted colstats match the data, go " +
      "visibly stale after a write, and refresh on re-analyze") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_analyze_spec").toString
    (1L to 100L).map(i => (i, i * 2)).toDF("doc_id", "n_chars")
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    GraftSink.analyze(spark, dir, schema)
    val s1 = GraftSink.colStatsOf(GraftSink.head(dir)._2)
      .map(s => s.column -> s).toMap
    assert(s1("doc_id").nRows == 100 && s1("doc_id").ndv == 100 &&
      s1("doc_id").min == "1" && s1("doc_id").max == "100")
    assert(s1("n_chars").max == "200" && s1("n_chars").atGeneration == 1)
    // a later append moves the head past the stats' generation —
    // stale is VISIBLE, never silently wrong
    Seq((200L, 999L)).toDF("doc_id", "n_chars")
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val s2 = GraftSink.colStatsOf(GraftSink.head(dir)._2)
    assert(s2.forall(_.atGeneration < GraftSink.versions(dir).max),
      "stats must read as stale after the append")
    // re-analyze refreshes in one CAS commit
    GraftSink.analyze(spark, dir, schema)
    val s3 = GraftSink.colStatsOf(GraftSink.head(dir)._2)
      .map(s => s.column -> s).toMap
    assert(s3("doc_id").nRows == 101 && s3("doc_id").max == "200" &&
      s3("n_chars").max == "999")
    assert(GraftSink.colStatsOf(GraftSink.head(dir)._2).size == 2,
      "re-analyze must replace, not accumulate, stat lines")
  }

  test("dsv2 sink optimize: every branch of the decision matrix fires " +
      "on its planted store and executes the right maintenance") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    def plant(name: String, parts: Int, scrambled: Boolean): String = {
      val dir = graft.TempDirs.create(s"graft_sink_opt_spec_$name").toString
      val df = (1L to 400L).map(i => (i, i)).toDF("doc_id", "n_chars")
      (if (scrambled) df.repartition(parts)
        else df.repartitionByRange(parts, org.apache.spark.sql.functions
          .col("doc_id")))
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).mode("append").save()
      dir
    }
    def content(dir: String) = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    val want = (1L to 400L).map(i => (i, i))

    // compact branch: 32 tiny files -> decision compact, file count
    // shrinks to the target, content identical
    val a = plant("tiny", 32, scrambled = true)
    val ra = GraftSink.optimize(spark, a, Seq("doc_id"), 8, schema)
    assert(ra.decision == "compact" && ra.nFilesBefore == 32 &&
      ra.generation == 2)
    assert(GraftSink.filesFor(a, "doc_id", BigDecimal(1),
      BigDecimal(400))._2 <= 8, "compact should shrink the file count")
    assert(content(a) == want)

    // cluster branch: scrambled + one declared dim -> zonemap prunes
    // only AFTER the executed rewrite
    val c = plant("scat1", 8, scrambled = true)
    assert(GraftSink.filesFor(c, "doc_id", BigDecimal(30),
      BigDecimal(70))._1.size == 8)
    val rc = GraftSink.optimize(spark, c, Seq("doc_id"), 8, schema)
    assert(rc.decision == "cluster" && rc.dispersed && rc.generation == 2)
    assert(GraftSink.filesFor(c, "doc_id", BigDecimal(30),
      BigDecimal(70))._1.size < 8, "cluster branch must enable pruning")
    assert(content(c) == want)

    // zorder branch: two declared dims -> prunes on BOTH afterwards
    val z = plant("scat2", 8, scrambled = true)
    val rz = GraftSink.optimize(spark, z, Seq("doc_id", "n_chars"), 8,
      schema)
    assert(rz.decision == "zorder" && rz.generation == 2)
    assert(GraftSink.filesFor(z, "doc_id", BigDecimal(1),
      BigDecimal(50))._1.size < 8)
    assert(GraftSink.filesFor(z, "n_chars", BigDecimal(1),
      BigDecimal(50))._1.size < 8)
    assert(content(z) == want)

    // none branch: a healthy range-clustered store is NOT rewritten —
    // no new generation, manifest untouched
    val n = plant("healthy", 8, scrambled = false)
    val genBefore = GraftSink.versions(n).max
    val rn = GraftSink.optimize(spark, n, Seq("doc_id"), 8, schema)
    assert(rn.decision == "none" && !rn.dispersed &&
      rn.generation == genBefore)
    assert(GraftSink.versions(n).max == genBefore,
      "optimize must not commit on the healthy store")
  }

  test("dsv2 sink history: the manifest-only audit trail reports rows, " +
      "file deltas, and txn markers per generation") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_hist").toString
    def write(rows: Seq[(Long, Long)], txn: Option[String]): Unit = {
      val w = rows.toDF("doc_id", "n_chars").coalesce(1)
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir)
      txn.fold(w)(t => w.option("txn", t)).mode("append").save()
    }
    write((1L to 10L).map(i => (i, i)), None)
    write((11L to 15L).map(i => (i, i)), Some("epoch-0"))
    GraftSink.deleteWhere(spark, dir, col("doc_id") <= 3L, schema)
    val h = GraftSink.history(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // (n_rows, rows_added, rows_removed, n_files, n_txn)
    assert(h(1L) == ((10L, 10L, 0L, 1L, 0L)))
    assert(h(2L) == ((15L, 5L, 0L, 2L, 1L)))
    // the delete rewrote the 10-row file into a 7-row file
    assert(h(3L) == ((12L, 7L, 10L, 2L, 1L)))
  }

  test("dsv2 sink changes: an upsert surfaces as delete(old) + " +
      "insert(new), rewrite survivors cancel, appends are pure inserts") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_cdc").toString
    (1L to 20L).map(i => (i, i)).toDF("doc_id", "n_chars").coalesce(1)
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    (21L to 30L).map(i => (i, i)).toDF("doc_id", "n_chars").coalesce(1)
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    GraftSink.mergeUpsert(spark, dir,
      Seq((5L, 500L), (99L, 990L)).toDF("doc_id", "n_chars"),
      "doc_id", schema)
    def changes(a: Int, b: Int): Set[(Long, Long, String)] =
      GraftSink.readChanges(spark, dir, a, b, schema)
        .as[(Long, Long, String)].collect().toSet
    // pure append: every upper row an insert, nothing deleted
    assert(changes(1, 2) == (21L to 30L).map(i => (i, i, "insert")).toSet)
    // the upsert: old row out, new row in, insert appended; the 19
    // co-resident rewrite survivors and the untouched file cancel
    assert(changes(2, 3) == Set((5L, 5L, "delete"), (5L, 500L, "insert"),
      (99L, 990L, "insert")))
    // windows compose: 1->3 equals the multiset of both steps' net
    assert(changes(1, 3) == (21L to 30L).map(i => (i, i, "insert")).toSet
      ++ Set((5L, 5L, "delete"), (5L, 500L, "insert"),
        (99L, 990L, "insert")))
    // a same-generation window is rejected loudly
    intercept[IllegalArgumentException] {
      GraftSink.readChanges(spark, dir, 2, 2, schema)
    }
  }

  test("dsv2 sink evolve: appended columns default on old files, old " +
      "readers still serve new files — two-way compatibility") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = graft.TempDirs.create("graft_sink_evo").toString
    Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    Seq((3L, 30L, "en"), (4L, 40L, "fr"))
      .toDF("doc_id", "n_chars", "lang")
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val oldSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val evolved = StructType(oldSchema.fields :+
      StructField("lang", StringType))
    // the evolved reader: old rows take the default, new keep theirs
    val got = GraftSink.readBackEvolved(spark, dir, evolved,
        Map("lang" -> lit("unknown")))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L, "unknown"), (2L, 20L, "unknown"),
      (3L, 30L, "en"), (4L, 40L, "fr")))
    // the day-1 reader: the appended trailing column is invisible,
    // every row (old AND new files) still serves
    assert(GraftSink.readBack(spark, dir, oldSchema)
      .as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("dsv2 sink zorder: the Morton-key rewrite prunes on BOTH raw " +
      "dimensions at once, content identical") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_zo").toString
    // two INDEPENDENT dims: id 1..1024, chars = bit-reversed-ish id
    val rows = (1L to 1024L).map(i => (i, (i * 389L) % 1024L))
    rows.toDF("doc_id", "n_chars").repartition(8)
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    def kept(dim: String): Int =
      GraftSink.filesFor(dir, dim, BigDecimal(0), BigDecimal(120))._1.size
    assert(kept("doc_id") == 8 && kept("n_chars") == 8,
      "hash layout should defeat both dims")
    val z = graft.operators.Layout.mortonZ(col("doc_id"), col("n_chars"))
    GraftSink.clusterByExpr(spark, dir, z, 16, schema)
    val (kd, kc) = (kept("doc_id"), kept("n_chars"))
    assert(kd < 16 && kc < 16,
      s"z-order should prune both dims, kept doc_id=$kd n_chars=$kc /16")
    val got = GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == rows.sorted, "z-order rewrite changed content")
    assert(GraftSink.readBackWhere(spark, dir, "n_chars",
        BigDecimal(0), BigDecimal(120), schema)
      .as[(Long, Long)].collect().toSet ==
      rows.filter(_._2 <= 120).toSet)
  }

  test("dsv2 sink hardening: retention-age vacuum guard, below-head " +
      "replace rejection, expired-parent history nulls, non-finite " +
      "doubles write and round-trip") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val dir = graft.TempDirs.create("graft_sink_hard").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("v", DoubleType)))
    // non-finite doubles: the write must succeed (stats skip them —
    // sound for range pruning) and NaN/±Inf must round-trip the TSV
    Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
        (4L, Double.NegativeInfinity), (5L, 4.5))
      .toDF("doc_id", "v").coalesce(1)
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val back = GraftSink.readBack(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(back(2L).isNaN && back(3L).isPosInfinity
      && back(4L).isNegInfinity && back(1L) == 1.5 && back(5L) == 4.5)
    // stats tracked only the finite values, so a window covering them
    // keeps the file and the filter still excludes the non-finite rows
    val st = GraftSink.head(dir)._2.filterNot(_.startsWith("#"))
      .map(GraftSink.statsOf).head
    assert(st("v") == ((BigDecimal(1.5), BigDecimal(4.5))),
      s"stats must span only the finite values, got ${st("v")}")
    // a young unreferenced stray survives an age-guarded vacuum and
    // falls to an immediate one
    Files.write(Paths.get(dir, "part-stray.tsv"), "9\t9.0\n".getBytes)
    assert(GraftSink.vacuum(dir, minAgeMs = 3600L * 1000)._1 == 0,
      "age guard must protect a young unreferenced file")
    assert(GraftSink.vacuum(dir)._1 == 1)
    // below-head replace after retention expiry is rejected loudly
    GraftSink.commitAppend(dir, Seq("part-g2-00000.tsv\t0"))
    GraftSink.commitAppend(dir, Seq("part-g3-00000.tsv\t0"))
    GraftSink.vacuum(dir, keepGenerations = 1)
    intercept[java.util.ConcurrentModificationException] {
      GraftSink.commitReplace(dir, Seq("part-evil.tsv\t0"),
        expectedParent = 1)
    }
    assert(GraftSink.versions(dir) == Seq(3),
      "the stale replace must not publish anything")
    // history after expiry: the oldest retained generation's deltas
    // are NULL, never misattributed as one giant append
    val h = GraftSink.history(spark, dir).collect()
    assert(h.length == 1 && h(0).getLong(0) == 3L)
    assert(h(0).isNullAt(2) && h(0).isNullAt(3),
      "expired-parent deltas must be null")
  }

  test("dsv2 sink txn x maintenance: the idempotence ledger survives " +
      "compaction — a replayed epoch still publishes nothing") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_txncpt").toString
    def write(rows: Seq[(Long, Long)], txn: String): Unit =
      rows.toDF("doc_id", "n_chars").repartition(2)
        .write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).option("txn", txn).mode("append").save()
    write((1L to 50L).map(i => (i, i)), "epoch-0")
    write((51L to 100L).map(i => (i, i)), "epoch-1")
    // the maintenance rewrite must CARRY the txn marker lines — they
    // are the exactly-once ledger, not file entries
    GraftSink.compact(spark, dir, targetRows = 1000L, schema)
    val head = GraftSink.head(dir)._2
    assert(head.count(_.startsWith("#txn")) == 2,
      s"compact dropped txn markers: $head")
    // a post-compaction replay of either epoch publishes nothing
    val gen = GraftSink.versions(dir).max
    write((1L to 50L).map(i => (i, i)), "epoch-0")
    write((51L to 100L).map(i => (i, i)), "epoch-1")
    assert(GraftSink.versions(dir).max == gen,
      "replayed epochs committed after compaction")
    assert(GraftSink.readBack(spark, dir, schema).count() == 100)
  }

  test("dsv2 sink delete: copy-on-write rewrites only matching files, " +
      "time travel keeps the pre-delete snapshot, vacuum reclaims it") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_del").toString
    // two range-disjoint files: ids 1..50 and 51..100
    (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartitionByRange(2, col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val preGen = GraftSink.versions(dir).max
    val preFiles = GraftSink.head(dir)._2.map(_.split("\t")(0)).toSet
    // the predicate only hits the low file — the high file must be
    // carried over BY REFERENCE, not rewritten
    val (deleted, rewritten, gen) =
      GraftSink.deleteWhere(spark, dir, col("doc_id") <= 25L, schema)
    assert(deleted == 25L && rewritten == 1 && gen == preGen + 1,
      s"got (deleted=$deleted, rewritten=$rewritten, gen=$gen)")
    val postFiles = GraftSink.head(dir)._2.map(_.split("\t")(0)).toSet
    assert((preFiles intersect postFiles).size == 1,
      "the unmatched file should survive by reference")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq == (26L to 100L),
      "live read must exclude exactly the deleted rows")
    // time travel: the pre-delete generation still serves everything
    assert(GraftSink.readBackAsOf(spark, dir, preGen, schema).count() == 100)
    // a delete matching nothing commits nothing
    assert(GraftSink.deleteWhere(spark, dir, col("doc_id") < 0L, schema)
      == ((0L, 0, gen)))
    // retention expiry + vacuum reclaims the replaced pre-delete file
    val replaced = (preFiles -- postFiles).head
    assert(Files.exists(Paths.get(dir, replaced)),
      "replaced file must survive while its snapshot is retained")
    GraftSink.vacuum(dir, keepGenerations = 1)
    assert(!Files.exists(Paths.get(dir, replaced)),
      "vacuum must reclaim the replaced file once its snapshot expired")
    intercept[IllegalArgumentException] {
      GraftSink.readBackAsOf(spark, dir, preGen, schema)
    }
    assert(GraftSink.readBack(spark, dir, schema).count() == 75)
  }

  test("dsv2 sink rollback: restore is a verbatim CAS copy of the " +
      "target snapshot — head equals it, bad gens stay auditable, " +
      "no-op and expired targets refuse") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_rb").toString
    def put(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong)).toDF("doc_id", "n_chars")
        .coalesce(1).write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).mode("append").save()
    put(1 to 50)   // gen 1
    put(51 to 100) // gen 2
    GraftSink.deleteWhere(spark, dir, col("doc_id") <= 25L, schema) // gen 3
    // restore gen 2: new generation, verbatim manifest bytes
    val gen = GraftSink.rollback(dir, 2)
    assert(gen == 4, s"restore must publish a NEW generation, got $gen")
    assert(GraftSink.versions(dir) == Seq(1, 2, 3, 4))
    def lines(g: Int) = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, s"${GraftSink.VersionPrefix}$g"))
    assert(lines(4) == lines(2), "restore must be a VERBATIM copy")
    assert(GraftSink.readBack(spark, dir, schema).count() == 100,
      "the restored head must serve the pre-delete content")
    // the bad generation stays servable for audit
    assert(GraftSink.readBackAsOf(spark, dir, 3, schema).count() == 75)
    // restoring the head itself is a refused no-op
    intercept[IllegalArgumentException] { GraftSink.rollback(dir, 4) }
    // unknown target refuses
    intercept[IllegalArgumentException] { GraftSink.rollback(dir, 99) }
    // retention expiry makes an old target un-restorable, loudly
    GraftSink.vacuum(dir, keepGenerations = 1)
    intercept[IllegalArgumentException] { GraftSink.rollback(dir, 2) }
    // and the restored head still serves everything after the vacuum
    assert(GraftSink.readBack(spark, dir, schema).count() == 100)
  }

  test("dsv2 sink merge-on-read delete: vectors mask rows without " +
      "rewriting files, a second delete unions, CoW purges, vacuum " +
      "protects then reclaims") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_mor").toString
    // two range-disjoint files (1..50, 51..100) plus a planted
    // DUPLICATE row (doc_id 10 twice): content-keyed vectors must
    // delete every copy of a matched line together
    ((1L to 100L) :+ 10L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartitionByRange(2, col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val preGen = GraftSink.versions(dir).max
    val files0 = GraftSink.head(dir)._2.filterNot(_.startsWith("#"))
      .map(_.split("\t")(0)).toSet
    // delete ids <= 25: hits only the low file; 26 rows (10 is doubled)
    val (d1, v1, g1) =
      GraftSink.deleteWhereMor(spark, dir, col("doc_id") <= 25L, schema)
    assert(d1 == 26L && v1 == 1 && g1 == preGen + 1,
      s"got (deleted=$d1, vectored=$v1, gen=$g1)")
    val lines1 = GraftSink.head(dir)._2
    val files1 = lines1.filterNot(_.startsWith("#"))
      .map(_.split("\t")(0)).toSet
    assert(files1 == files0, "MoR delete must rewrite NO data files")
    val dv1 = lines1.filter(_.startsWith("#dv\t"))
    assert(dv1.size == 1 && dv1.head.split("\t")(3) == "26",
      s"expected one 26-row vector marker, got $dv1")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq == (26L to 100L))
    assert(GraftSink.readBackAsOf(spark, dir, preGen, schema).count() == 101)
    // CDC across the MoR delete: exactly the 26 masked rows, as deletes
    val ch = GraftSink.readChanges(spark, dir, preGen, g1, schema)
      .groupBy("action").count().as[(String, Long)].collect().toMap
    assert(ch == Map("delete" -> 26L), s"got $ch")
    // second delete on the SAME file: marker replaced with the union
    val (d2, _, g2) =
      GraftSink.deleteWhereMor(spark, dir, col("doc_id") === 30L, schema)
    assert(d2 == 1L)
    val lines2 = GraftSink.head(dir)._2
    val dv2 = lines2.filter(_.startsWith("#dv\t"))
    assert(dv2.size == 1 && dv2.head.split("\t")(3) == "27",
      s"union vector must carry 27 rows, got $dv2")
    assert(dv2.head.split("\t")(2) != dv1.head.split("\t")(2),
      "the union must be a FRESH vector file, not an in-place edit")
    assert(GraftSink.readBack(spark, dir, schema).count() == 74)
    // the g1 snapshot still reads through its OLD vector
    assert(GraftSink.readBackAsOf(spark, dir, g1, schema).count() == 75)
    // history accounts in visible rows: the two MoR gens remove 26 + 1
    val h = GraftSink.history(spark, dir)
      .select("generation", "n_rows", "rows_removed")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(h.map(_._2).toSeq == Seq(101L, 75L, 74L))
    assert(h.drop(1).map(_._3).toSeq == Seq(26L, 1L))
    // vacuum with full retention protects BOTH vector files
    GraftSink.vacuum(dir)
    assert(GraftSink.readBackAsOf(spark, dir, g1, schema).count() == 75)
    assert(GraftSink.readBack(spark, dir, schema).count() == 74)
    // a copy-on-write delete now purges the vectors physically
    val (d3, r3, g3) =
      GraftSink.deleteWhere(spark, dir, col("doc_id") === 40L, schema)
    assert(d3 == 1L && r3 == 1 && g3 == g2 + 1)
    val lines3 = GraftSink.head(dir)._2
    assert(!lines3.exists(_.startsWith("#dv\t")),
      "the rewrite must drop the rewritten file's vector marker")
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      ((26L to 100L).filterNot(i => i == 30L || i == 40L)),
      "MoR-masked rows must stay deleted through the CoW rewrite")
    // retention expiry reclaims the replaced vector files
    val dvFiles = (dv1 ++ dv2).map(_.split("\t")(2))
    dvFiles.foreach(f => assert(Files.exists(Paths.get(dir, f))))
    GraftSink.vacuum(dir, keepGenerations = 1)
    dvFiles.foreach(f => assert(!Files.exists(Paths.get(dir, f)),
      s"expired vector $f must be vacuumed"))
    assert(GraftSink.readBack(spark, dir, schema).count() == 73)
  }

  test("dsv2 sink merge-on-read plan: the vector subtraction is a " +
      "BROADCAST anti-join and zonemap pruning still skips files") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_morplan").toString
    (1L to 1000L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartitionByRange(8, col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    GraftSink.deleteWhereMor(spark, dir, col("doc_id") % 10 === 0L, schema)
    // the DV side lists only deleted rows — tiny next to the data, so
    // the anti-join must broadcast, never shuffle the 100 TB side
    val plan = GraftSink.readBack(spark, dir, schema)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin")
        && plan.contains("LeftAnti"),
      s"expected a broadcast LEFT ANTI vector subtraction, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the vector subtraction must never sort-merge the data side")
    // zonemap pruning composes with vectors: a selective range opens
    // fewer files than listed, and the visible content is exact
    val (kept, listed) =
      GraftSink.filesFor(dir, "doc_id", BigDecimal(1), BigDecimal(100))
    assert(kept.size < listed, s"kept=${kept.size} listed=$listed")
    val got = GraftSink.readBackWhere(spark, dir, "doc_id",
        BigDecimal(1), BigDecimal(100), schema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq
    assert(got == (1L to 100L).filterNot(_ % 10 == 0),
      "pruned visible read must equal the filtered full read")
  }

  test("dsv2 sink sharded manifests: appends spill to immutable " +
      "shards carried by reference, the head stays O(shards) lines, " +
      "every reader resolves, a rewrite re-inlines and vacuum " +
      "reclaims the old shards") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_shard").toString
    def put(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong)).toDF("doc_id", "n_chars")
        .repartition(2).write.format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).option("shardThreshold", "4")
        .mode("append").save()
    // 6 appends × 2 files = 12 entries; threshold 4 forces periodic
    // spills — the head must list FAR fewer lines than entries
    (0 until 6).foreach(i => put(i * 10 + 1 to i * 10 + 10))
    val raw = GraftSink.head(dir)._2
    val inline = raw.count(l => !l.startsWith("#") && !l.startsWith("@"))
    val shards = raw.filter(_.startsWith("@shard\t"))
    assert(shards.nonEmpty, "appends above the threshold must shard")
    assert(inline <= 4, s"inline tail must stay under the threshold, " +
      s"got $inline of ${raw.size} lines")
    assert(raw.size < 12, s"the head must stay O(shards), got ${raw.size}")
    // every reader resolves references
    assert(GraftSink.readBack(spark, dir, schema).count() == 60)
    assert(GraftSink.readBackAsOf(spark, dir, 3, schema).count() == 30)
    assert(GraftSink.history(spark, dir)
      .agg(org.apache.spark.sql.functions.max("n_rows"))
      .head().getLong(0) == 60)
    assert(GraftSink.readChanges(spark, dir, 5, 6, schema).count() == 10)
    // zonemap pruning composes with shard resolution
    assert(GraftSink.readBackWhere(spark, dir, "doc_id",
      BigDecimal(1), BigDecimal(10), schema).count() == 10)
    // merge-on-read deletes resolve too
    val (d, _, _) =
      GraftSink.deleteWhereMor(spark, dir, col("doc_id") % 10 === 0L, schema)
    assert(d == 6L)
    assert(GraftSink.readBack(spark, dir, schema).count() == 54)
    // the threshold is TABLE metadata, not a per-write option: the MoR
    // delete above committed through commitReplace with the DEFAULT
    // threshold, and the persisted `#conf` marker must have made it
    // re-spill at 4 instead of silently re-inlining all 12 entries —
    // the O(table-files) manifest collapse a replace op used to cause
    val rawAfter = GraftSink.head(dir)._2
    assert(rawAfter.contains("#conf\tshardThreshold\t4"),
      "the shard threshold must persist in the manifest as table metadata")
    assert(rawAfter.exists(_.startsWith("@shard\t")),
      "a replace commit on a sharded table must stay sharded")
    assert(rawAfter.count(l =>
        !l.startsWith("#") && !l.startsWith("@")) <= 4,
      "a replace commit must re-spill at the persisted threshold")
    // a full rewrite resolves, re-packs, and abandons the old shards;
    // retention expiry then reclaims them (they were still protecting
    // the pre-rewrite snapshots until now)
    val shardFiles = shards.map(_.split("\t")(1))
    shardFiles.foreach(f => assert(Files.exists(Paths.get(dir, f))))
    GraftSink.compact(spark, dir, targetRows = Long.MaxValue, schema)
    assert(GraftSink.readBack(spark, dir, schema).count() == 54)
    GraftSink.vacuum(dir, keepGenerations = 1)
    shardFiles.foreach(f => assert(!Files.exists(Paths.get(dir, f)),
      s"expired shard $f must be vacuumed"))
    assert(GraftSink.readBack(spark, dir, schema).count() == 54)
  }

  test("dsv2 sink bloom index: point probes open fewer files than " +
      "listed, post-build appends stay covered by scan, MoR deletes " +
      "mask probed rows, vacuum protects then reclaims the sidecar") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_bloom_spec").toString
    // hash-scrambled layout: every file spans the id range, zonemaps
    // prune nothing — the bloom index is the only possible pruner
    (1L to 400L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartition(8, xxhash64(col("doc_id")))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    GraftSink.buildBloom(spark, dir, "doc_id", schema)
    val bloomFile = GraftSink.head(dir)._2
      .find(_.startsWith("#bloomidx\t")).get.split("\t")(2)
    // present key: found exactly, and the probe opened < listed files
    val (kept, listed) = GraftSink.bloomFilesFor(spark, dir, "doc_id", "7")
    assert(listed == 8 && kept.size < listed,
      s"bloom must prune: kept=${kept.size} of $listed")
    assert(GraftSink.readBackBloomEq(spark, dir, "doc_id", "7", schema)
      .as[(Long, Long)].collect().toSeq == Seq((7L, 7L)))
    // absent key: zero rows, and (at 65536 bits over 50 ids/file) the
    // probe prunes at least one file
    val (keptMiss, _) = GraftSink.bloomFilesFor(spark, dir, "doc_id", "9999")
    assert(keptMiss.size < listed)
    assert(GraftSink.readBackBloomEq(spark, dir, "doc_id", "9999", schema)
      .isEmpty)
    // a post-build append is NOT in the sidecar: its file must be
    // scanned unconditionally — coverage degrades to a scan, never to
    // a false negative
    Seq((1001L, 1L)).toDF("doc_id", "n_chars")
      .coalesce(1).write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    val (kept2, listed2) = GraftSink.bloomFilesFor(spark, dir, "doc_id", "1001")
    assert(listed2 == 9 && kept2.size < listed2,
      "covered bloom-negative files still prune after an append")
    assert(GraftSink.readBackBloomEq(spark, dir, "doc_id", "1001", schema)
      .as[(Long, Long)].collect().toSeq == Seq((1001L, 1L)))
    // a MoR delete masks the row even when the (now stale) bloom
    // still probes its file positive — blooms only ever prune
    GraftSink.deleteWhereMor(spark, dir, col("doc_id") === 7L, schema)
    assert(GraftSink.readBackBloomEq(spark, dir, "doc_id", "7", schema)
      .isEmpty)
    // the sidecar is load-bearing for every retained generation…
    GraftSink.vacuum(dir, keepGenerations = 3)
    assert(Files.exists(Paths.get(dir, bloomFile)),
      "vacuum must protect a retained generation's bloom sidecar")
    // …and reclaimable once a rebuild supersedes it everywhere
    GraftSink.buildBloom(spark, dir, "doc_id", schema)
    GraftSink.vacuum(dir, keepGenerations = 1)
    assert(!Files.exists(Paths.get(dir, bloomFile)),
      "a superseded unreferenced bloom sidecar must be reclaimed")
    assert(GraftSink.readBackBloomEq(spark, dir, "doc_id", "8", schema)
      .as[(Long, Long)].collect().toSeq == Seq((8L, 8L)))
  }

  test("dsv2 sink merge-on-read delete survives adopted data-file " +
      "names the partitioned writer URL-escapes") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_escape").toString
    (1L to 20L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .coalesce(1).write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    // adoptSideFiles carries file names VERBATIM, so a foreign ingest
    // can hand the manifest a name containing '=' — a character the
    // DV writer's partition directory will escape as %3D; simulate by
    // renaming the data file and CAS-committing the patched entry
    val (parent, lines) = GraftSink.head(dir)
    val entry = lines.find(l => !l.startsWith("#")).get
    val old = entry.split("\t")(0)
    val hostile = "adopted=verbatim.tsv"
    Files.move(Paths.get(dir, old), Paths.get(dir, hostile),
      StandardCopyOption.ATOMIC_MOVE)
    val patched = lines.map(l =>
      if (l == entry) hostile + entry.substring(old.length) else l)
    GraftSink.commitReplace(dir, patched, parent)
    // pre-fix this threw NoSuchFileException: the DV job wrote its
    // part under __file=adopted%3Dverbatim.tsv but the adopter listed
    // the UNESCAPED directory
    val (d, nf, _) =
      GraftSink.deleteWhereMor(spark, dir, col("doc_id") % 2 === 0L, schema)
    assert(d == 10L && nf == 1)
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      (1L to 20L).filterNot(_ % 2 == 0))
  }

  private val DocSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.LongType)))

  private def putDocs(dir: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "n_chars").repartition(1)
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
  }

  test("dsv2 sink constraints: existing violations block the add, a " +
      "violating write publishes nothing, drop re-opens the gate") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_check_spec").toString
    putDocs(dir, Seq((1L, 10L), (2L, 20L)))
    val g1 = GraftSink.versions(dir).max
    // existing data violates -> the add itself must refuse to commit
    intercept[IllegalArgumentException] {
      GraftSink.addConstraint(spark, dir, "big", "n_chars >= 15", DocSchema)
    }
    assert(GraftSink.versions(dir).max == g1, "failed add published")
    GraftSink.addConstraint(spark, dir, "nonneg", "n_chars >= 0", DocSchema)
    val g2 = GraftSink.versions(dir).max
    // a violating write fails the JOB: head unchanged, temps cleaned
    intercept[Exception] { putDocs(dir, Seq((3L, -5L))) }
    assert(GraftSink.versions(dir).max == g2,
      "violating write moved the head")
    val s = Files.list(Paths.get(dir))
    val stray =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".tmp-")).toSeq
      finally s.close()
    assert(stray.isEmpty, s"leftover temps: $stray")
    // a valid write still passes through the constrained path
    putDocs(dir, Seq((3L, 5L)))
    assert(GraftSink.readBack(spark, dir, DocSchema).count() == 3)
    // drop re-opens
    GraftSink.dropConstraint(dir, "nonneg")
    putDocs(dir, Seq((4L, -1L)))
    assert(GraftSink.readBack(spark, dir, DocSchema).count() == 4)
  }

  test("dsv2 sink constraints: a constraint committed MID-JOB aborts " +
      "the publish as a metadata conflict, cleaning the job's temps") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_check_race").toString
    putDocs(dir, Seq((1L, 10L)))
    // drive the DSv2 BatchWrite by hand so a constraint can land
    // between task completion and the job commit
    val bw = new graft.sources.v2.GraftSinkBatchWrite(DocSchema, dir, None)
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(2L, 20L))
    val msg = w.commit()
    GraftSink.addConstraint(spark, dir, "nonneg", "n_chars >= 0", DocSchema)
    val gAfterAdd = GraftSink.versions(dir).max
    intercept[java.util.ConcurrentModificationException] {
      bw.commit(Array(msg))
    }
    assert(GraftSink.versions(dir).max == gAfterAdd,
      "conflicted job still published")
    val s = Files.list(Paths.get(dir))
    val stray =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".tmp-")).toSeq
      finally s.close()
    assert(stray.isEmpty, s"leftover temps: $stray")
    assert(GraftSink.readBack(spark, dir, DocSchema).count() == 1)
  }

  test("dsv2 sink shallow clone: zero data copied, both sides diverge " +
      "independently, constraints inherit, vacuum stays local, " +
      "clone-of-clone resolves the chain") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    import graft.sources.v2.GraftSink
    val parent = graft.TempDirs.create("graft_clone_parent").toString
    putDocs(parent, (1L to 6L).map(i => (i, i * 10L)))
    GraftSink.addConstraint(spark, parent, "nonneg", "n_chars >= 0",
      DocSchema)
    val clone = graft.TempDirs.create("graft_clone_c").toString + "/t"
    GraftSink.cloneShallow(parent, clone)
    // ZERO-COPY: the clone directory holds manifests only
    val s0 = Files.list(Paths.get(clone))
    val names =
      try s0.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s0.close()
    assert(names.forall(_.startsWith("_MANIFEST")),
      s"clone dir holds data files: $names")
    def ids(dir: String): Seq[Long] =
      GraftSink.readBack(spark, dir, DocSchema)
        .as[(Long, Long)].collect().map(_._1).sorted.toSeq
    assert(ids(clone) == (1L to 6L), "clone content != parent content")
    // the parent's CHECK constraint is table metadata the clone keeps
    intercept[Exception] { putDocs(clone, Seq((9L, -1L))) }
    // diverge: append to the clone, CoW-delete on the parent
    putDocs(clone, Seq((7L, 70L)))
    GraftSink.deleteWhere(spark, parent, col("doc_id") === 1L, DocSchema)
    assert(ids(parent) == (2L to 6L), "parent lost more than the delete")
    assert(ids(clone) == (1L to 7L),
      "the parent's delete leaked into the clone")
    // merge-on-read delete ON the clone: vector local, data inherited
    GraftSink.deleteWhereMor(spark, clone, col("doc_id") === 2L, DocSchema)
    assert(ids(clone) == Seq(1L, 3L, 4L, 5L, 6L, 7L))
    assert(ids(parent) == (2L to 6L), "the clone's MoR delete leaked")
    // vacuum on the clone deletes only local files — the parent's
    // inherited files survive and both sides still read
    GraftSink.vacuum(clone, keepGenerations = 1, minAgeMs = 0L)
    assert(ids(clone) == Seq(1L, 3L, 4L, 5L, 6L, 7L))
    assert(ids(parent) == (2L to 6L))
    // clone-of-clone: the #parent CHAIN resolves files living in the
    // grandparent, the parent, and locally
    val clone2 = graft.TempDirs.create("graft_clone_c2").toString + "/t"
    GraftSink.cloneShallow(clone, clone2)
    assert(ids(clone2) == Seq(1L, 3L, 4L, 5L, 6L, 7L))
  }

  test("dsv2 sink tags: a tagged generation survives retention " +
      "vacuum, re-tagging moves the exemption, drop releases it") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_tags").toString
    putDocs(dir, Seq((1L, 10L)))
    putDocs(dir, Seq((2L, 20L)))
    putDocs(dir, Seq((3L, 30L)))
    GraftSink.addTag(dir, "keep", 1) // gen 4 (a metadata commit)
    GraftSink.vacuum(dir, keepGenerations = 1)
    // retention kept the head (4) AND the tagged snapshot (1);
    // untagged 2 and 3 expired
    assert(GraftSink.versions(dir) == Seq(1, 4),
      s"versions = ${GraftSink.versions(dir)}")
    assert(GraftSink.readBackTag(spark, dir, "keep", DocSchema)
      .count() == 1)
    // re-tagging MOVES the exemption: gen 1 becomes reclaimable
    GraftSink.addTag(dir, "keep", 4) // gen 5
    GraftSink.vacuum(dir, keepGenerations = 1)
    assert(GraftSink.versions(dir) == Seq(4, 5))
    assert(GraftSink.readBackTag(spark, dir, "keep", DocSchema)
      .count() == 3)
    // dropping the tag releases the snapshot to retention
    GraftSink.dropTag(dir, "keep") // gen 6
    GraftSink.vacuum(dir, keepGenerations = 1)
    assert(GraftSink.versions(dir) == Seq(6))
    // tagging an uncommitted generation fails loudly
    intercept[IllegalArgumentException] {
      GraftSink.addTag(dir, "nope", 99)
    }
  }

  test("dsv2 sink branch publish: the branch state fast-forwards onto " +
      "the parent, local files adopt, divergence refuses") {
    import spark.implicits._
    import graft.sources.v2.GraftSink
    val parent = graft.TempDirs.create("graft_wapb_p").toString
    putDocs(parent, (1L to 4L).map(i => (i, i * 10L)))
    val branch = graft.TempDirs.create("graft_wapb_b").toString + "/t"
    GraftSink.cloneShallow(parent, branch)
    putDocs(branch, Seq((5L, 50L), (6L, 60L)))
    GraftSink.deleteWhere(spark, branch, col("doc_id") === 2L, DocSchema)
    val preGen = GraftSink.versions(parent).max
    GraftSink.publishClone(parent, branch)
    def ids(dir: String): Seq[Long] =
      GraftSink.readBack(spark, dir, DocSchema)
        .as[(Long, Long)].collect().map(_._1).sorted.toSeq
    assert(ids(parent) == Seq(1L, 3L, 4L, 5L, 6L),
      "publish must deliver the branch state exactly")
    // the pre-publish snapshot still serves (time travel intact)
    assert(GraftSink.readBackAsOf(spark, parent, preGen, DocSchema)
      .count() == 4)
    // divergence: the parent moves after a second branch is taken;
    // the fast-forward must refuse, publishing nothing
    val b2 = graft.TempDirs.create("graft_wapb_b2").toString + "/t"
    GraftSink.cloneShallow(parent, b2)
    putDocs(b2, Seq((7L, 70L)))
    putDocs(parent, Seq((9L, 90L))) // the parent moves
    val headBefore = GraftSink.versions(parent).max
    intercept[java.util.ConcurrentModificationException] {
      GraftSink.publishClone(parent, b2)
    }
    assert(GraftSink.versions(parent).max == headBefore)
    assert(ids(parent) == Seq(1L, 3L, 4L, 5L, 6L, 9L))
  }

  test("dsv2 sink publish race: two publishers of the same branch — " +
      "the loser's cleanup must not delete files the winner's " +
      "committed manifest references") {
    import spark.implicits._
    import graft.sources.v2.GraftSink
    val parent = graft.TempDirs.create("graft_pubrace_p").toString
    putDocs(parent, (1L to 4L).map(i => (i, i * 10L)))
    val branch = graft.TempDirs.create("graft_pubrace_b").toString + "/t"
    GraftSink.cloneShallow(parent, branch)
    putDocs(branch, Seq((5L, 50L), (6L, 60L)))
    // the crash-retry twin: two concurrent publishes of the SAME
    // branch stage identical UUID-named copies into the parent; the
    // loser's CAS-failure cleanup used to delete them unconditionally,
    // orphaning the data the winner's manifest had just committed
    import java.util.concurrent.{Callable, CyclicBarrier, Executors}
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val fs = (1 to 2).map(_ => pool.submit(new Callable[Option[Throwable]] {
        def call(): Option[Throwable] = {
          barrier.await()
          try { GraftSink.publishClone(parent, branch); None }
          catch { case t: Throwable => Some(t) }
        }
      }))
      val outcomes = fs.map(_.get())
      // exactly one commit wins; the loser fails (CME at the precheck
      // or the CAS — or a copy race if the winner already reclaimed
      // the branch-local files mid-flight; the exception class is
      // interleaving-dependent, the data invariant below is not)
      assert(outcomes.count(_.isEmpty) == 1,
        s"exactly one publisher must win: $outcomes")
    } finally pool.shutdown()
    // the decisive check: every file the committed manifest references
    // still exists — a lost update here is silent data destruction
    assert(GraftSink.readBack(spark, parent, DocSchema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "published branch rows must survive the losing publisher's cleanup")
  }

  test("dsv2 sink publish vs vacuum race: a swept .adopt temp " +
      "RETRIES (source still present) instead of publishing a " +
      "dangling manifest entry; persistent sweeps fail loudly") {
    import spark.implicits._
    import graft.sources.v2.GraftSink
    val parent = graft.TempDirs.create("graft_adoptrace_p").toString
    putDocs(parent, (1L to 3L).map(i => (i, i * 10L)))
    val branch = graft.TempDirs.create("graft_adoptrace_b").toString + "/t"
    GraftSink.cloneShallow(parent, branch)
    putDocs(branch, Seq((5L, 50L)))
    // a concurrent vacuum(parent, minAgeMs=0) sweeping the
    // unreferenced temp between staging and the atomic move — the
    // NoSuchFileException the old code conflated with "racing winner
    // owns the name" and silently skipped, publishing a manifest
    // entry whose only copy lived in the branch dir. Sweep each
    // adoption ONCE: the retry must notice the source still exists
    // and re-stage.
    val swept = new java.util.concurrent.atomic.AtomicInteger(0)
    val sweptOnce = scala.collection.mutable.Set.empty[String]
    GraftSink.adoptRaceHook = tmp => {
      val key = tmp.getFileName.toString.dropRight(8)
      if (sweptOnce.add(key)) {
        java.nio.file.Files.delete(tmp)
        swept.incrementAndGet()
        ()
      }
    }
    try GraftSink.publishClone(parent, branch)
    finally GraftSink.adoptRaceHook = _ => ()
    assert(swept.get() > 0, "the race hook never fired")
    assert(GraftSink.readBack(spark, parent, DocSchema)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L),
      "retried adoptions must deliver the full branch state")
    // a PERSISTENT sweeper (every attempt loses its temp) must fail
    // the publish loudly — never commit a reference without a file
    val b2 = graft.TempDirs.create("graft_adoptrace_b2").toString + "/t"
    GraftSink.cloneShallow(parent, b2)
    putDocs(b2, Seq((7L, 70L)))
    GraftSink.adoptRaceHook = tmp => {
      java.nio.file.Files.delete(tmp); ()
    }
    try intercept[java.io.IOException] {
      GraftSink.publishClone(parent, b2)
    } finally GraftSink.adoptRaceHook = _ => ()
  }

  test("dsv2 sink optimize: files without zonemap stats count as " +
      "dispersed — a mostly-stats-less store cannot read healthy off " +
      "its stats-bearing minority") {
    import spark.implicits._
    import graft.sources.v2.GraftSink
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_opt_nostats").toString
    (1L to 400L).map(i => (i, i)).toDF("doc_id", "n_chars")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("doc_id"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", dir).mode("append").save()
    // fully-stats'd range-clustered store reads healthy
    assert(GraftSink.optimize(spark, dir, Seq("doc_id"), 8, schema)
      .decision == "none")
    // strip the stats segment from 7 of the 8 data entries (the
    // pre-stats manifest shape statsOf documents) via a CAS commit
    val (gen, lines) = GraftSink.head(dir)
    var stripped = 0
    val rewritten = lines.map { l =>
      val p = l.split("\t")
      if (!l.startsWith("#") && p.length >= 3 && stripped < 7) {
        stripped += 1; s"${p(0)}\t${p(1)}\t"
      } else l
    }
    assert(stripped == 7)
    GraftSink.commitReplace(dir, rewritten, gen)
    // 7 of 8 files now carry no pruning information for the declared
    // dim: the store MUST read dispersed and execute the rewrite
    val r = GraftSink.optimize(spark, dir, Seq("doc_id"), 8, schema)
    assert(r.decision == "cluster" && r.dispersed,
      s"stats-less files must count as dispersed, got $r")
    import spark.implicits._
    assert(GraftSink.readBack(spark, dir, schema)
      .as[(Long, Long)].collect().sorted.toSeq ==
      (1L to 400L).map(i => (i, i)),
      "the executed rewrite must preserve content")
  }

  test("dsv2 sink colstats: escaped tab/newline/backslash min/max " +
      "values round-trip through the manifest line parse") {
    import graft.sources.v2.GraftSink
    // the exact bytes analyze() persists for min = "a\tb\nc" and
    // max = "z\\w": tab -> \t, newline -> \n, backslash -> \\
    val line = "#colstats\tc\t5\t3\t" + "a\\tb\\nc" + "\t" + "z\\\\w" + "\t7"
    val s = GraftSink.colStatsOf(Seq(line))
    assert(s.size == 1)
    assert(s.head == GraftSink.ColStats("c", 5L, 3L, "a\tb\nc", "z\\w", 7),
      s"parsed $s")
  }

  test("dsv2 sink cdc stream: append windows emit inserts, a DV move " +
      "emits exactly the newly-masked rows as deletes, and a rewrite " +
      "window's insert/delete pairs cancel") {
    import graft.sources.v2.GraftSink
    val dir = graft.TempDirs.create("graft_sink_cdc_spec").toString
    putDocs(dir, (1L to 4L).map(i => (i, i * 10L)))
    putDocs(dir, (5L to 8L).map(i => (i, i * 10L)))
    GraftSink.deleteWhereMor(spark, dir,
      col("doc_id").isin(2L, 6L), DocSchema)
    GraftSink.compact(spark, dir, targetRows = Long.MaxValue, DocSchema)
    assert(GraftSink.versions(dir) == (1 to 4))
    val stream = new graft.sources.v2.GraftSinkCdcStream(DocSchema, dir)
    def window(s: Int, e: Int): Seq[(Long, String)] = {
      val rf = stream.createReaderFactory()
      stream.planInputPartitions(stream.deserializeOffset(s.toString),
        stream.deserializeOffset(e.toString)).toSeq.flatMap { p =>
        val r = rf.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        while (r.next()) {
          val row = r.get()
          buf += ((row.getLong(0), row.getUTF8String(2).toString))
        }
        r.close()
        buf.toSeq
      }
    }
    // append windows: pure inserts of every committed row
    assert(window(0, 2).sorted ==
      (1L to 8L).map(i => (i, "insert")).sorted)
    // the DV move emits exactly the newly-masked rows as deletes
    assert(window(2, 3).sorted == Seq((2L, "delete"), (6L, "delete")))
    // the compaction window swaps every file: the survivors' insert
    // and delete multisets must be identical (they cancel in a fold)
    val w34 = window(3, 4)
    val ins = w34.filter(_._2 == "insert").map(_._1).sorted
    val del = w34.filter(_._2 == "delete").map(_._1).sorted
    assert(ins == Seq(1L, 3L, 4L, 5L, 7L, 8L), s"inserts: $ins")
    assert(del == ins, "rewrite survivors must cancel exactly")
    // composing every window sign-folds to the visible head state
    val fold = (window(0, 2) ++ window(2, 3) ++ w34)
      .groupBy(_._1).view.mapValues(_.map(v =>
        if (v._2 == "insert") 1 else -1).sum).toMap
    assert(fold.filter(_._2 != 0).keys.toSeq.sorted ==
      Seq(1L, 3L, 4L, 5L, 7L, 8L))
  }

  test("dsv2 sink planners stream generation-range shards: optimize " +
      "decides, compact rewrites, history accounts and vacuum sweeps " +
      "a sharded store from bounded entry batches — the resolved " +
      "head NEVER materializes on the driver") {
    import graft.sources.v2.GraftSink
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val dir = graft.TempDirs.create("graft_sink_streamplan").toString
    // 4 appends × 16 files of 16 rows = 64 entries at threshold 8:
    // each commit spills one 16-entry shard, the inline tail stays ≤ 8
    (0 until 4).foreach { g =>
      spark.range(g * 256, (g + 1) * 256)
        .select(col("id").as("doc_id"), col("id").as("n_chars"))
        .repartition(16).write
        .format("graft.sources.v2.GraftSinkSource")
        .option("path", dir).option("shardThreshold", "8")
        .mode("append").save()
    }
    GraftSink.peakEntryBatch.set(0)
    val resolves0 = GraftSink.fullResolves.get()
    // OPTIMIZE: 64 files > CompactFileBudget → decides compact and
    // EXECUTES it — decide phase folds entry batches, execute reads
    // only the affected files' sub-manifest
    val rep = GraftSink.optimize(spark, dir, Seq("doc_id"), 8, schema)
    assert(rep.decision == "compact" && rep.nFilesBefore == 64)
    // HISTORY on the sharded store: the distributed accounting path
    // (shard files read through Spark, deltas via a gen-shifted join)
    val h = GraftSink.history(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(h.toSeq == Seq(
      (1L, 256L, 256L, 0L, 16L), (2L, 512L, 256L, 0L, 32L),
      (3L, 768L, 256L, 0L, 48L), (4L, 1024L, 256L, 0L, 64L),
      // the compaction generation: full file-level churn, same rows
      (5L, 1024L, 1024L, 1024L, 8L)),
      s"history mismatch: ${h.toSeq}")
    // VACUUM: the referenced set streams per retained generation
    val (dataDeleted, expired) = GraftSink.vacuum(dir, 1)
    assert(expired == 4, s"expired=$expired")
    assert(dataDeleted >= 64, s"dataDeleted=$dataDeleted")
    assert(GraftSink.readBack(spark, dir, schema)
      .agg(count(lit(1)), sum(col("n_chars"))).head() match {
        case r => r.getLong(0) == 1024L && r.getLong(1) == 523776L
      })
    // THE CONTRACT: none of the above expanded a sharded manifest on
    // the driver, and no streamed batch exceeded one commit's spill
    // (16 entries) — at 1e5 files the planners would still hold
    // O(shard) lines, not O(#files)
    assert(GraftSink.fullResolves.get() == resolves0,
      "a planner materialized the resolved head")
    assert(GraftSink.peakEntryBatch.get() <= 16,
      s"entry batch ballooned: ${GraftSink.peakEntryBatch.get()}")
  }

  test("dsv2 sink shallow clone carries parent shards BY REFERENCE " +
      "and publishClone adopts only the branch divergence") {
    import graft.sources.v2.GraftSink
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val parent = graft.TempDirs.create("graft_sink_cloneref_p").toString
    val branch =
      graft.TempDirs.create("graft_sink_cloneref_b").toString + "/t"
    spark.range(0, 64)
      .select(col("id").as("doc_id"), col("id").as("n_chars"))
      .repartition(16).write.format("graft.sources.v2.GraftSinkSource")
      .option("path", parent).option("shardThreshold", "4")
      .mode("append").save()
    GraftSink.cloneShallow(parent, branch)
    // zero-copy for METADATA too: the clone directory holds no local
    // shard files — the parent's `@shard` refs resolve through the
    // `#parent` chain
    val cloneRaw = GraftSink.head(branch)._2
    assert(cloneRaw.exists(_.startsWith("@shard\t")),
      "clone must inherit the parent's shard refs by reference")
    val s0 = Files.list(Paths.get(branch))
    val local = try s0.iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_SHARD."))
      .toSeq finally s0.close()
    assert(local.isEmpty, s"clone localized shards: $local")
    assert(GraftSink.readBack(spark, branch, schema).count() == 64)
    // diverge the branch, then publish: only the divergence copies
    spark.range(1000, 1016)
      .select(col("id").as("doc_id"), col("id").as("n_chars"))
      .write.format("graft.sources.v2.GraftSinkSource")
      .option("path", branch).mode("append").save()
    GraftSink.publishClone(parent, branch)
    val back = GraftSink.readBack(spark, parent, schema)
    assert(back.count() == 80)
    assert(back.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head().getLong(0) == (0L until 64L).sum + (1000L until 1016L).sum)
  }
}
