package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSourceV2 surface (the read half is
  * [[SyntheticSource]]): a file sink implementing the full two-phase
  * batch commit protocol —
  *
  *   `TableProvider` → `SupportsWrite` → `WriteBuilder` → `BatchWrite`
  *   → per-task `DataWriter`s → task `commit()` messages → ONE
  *   driver-side job `commit(messages)`.
  *
  * Exactly-once semantics come from the protocol, not from luck:
  * every task attempt writes to its own `.tmp-<part>-<task>` file; a
  * failed/aborted attempt's `abort()` deletes its temp; only the
  * single authorized attempt per partition (Spark's commit
  * coordinator) contributes a commit message; and the job-level
  * `commit` publishes atomically — temp files rename to final parts
  * and a `_MANIFEST` lists exactly the committed files. Readers go
  * THROUGH the manifest ([[GraftSink.readBack]]), so uncommitted or
  * orphaned files are invisible by construction. This is the
  * Hadoop-committer pattern restated in DSv2 terms; on a real cluster
  * the renames are same-filesystem moves on the shared store, and at
  * 100 TB the payoff is that task retries and speculative attempts
  * never double-write a row (a spec injects a first-attempt writer
  * failure and pins the output identical).
  *
  * Rows serialize as TSV (schema-driven: long/int/string/decimal/
  * double; nulls rejected loudly — the sink's declared demo schema is
  * non-null). Free-text strings must not carry tabs/newlines; the
  * writer enforces it per value.
  */
class GraftSinkSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSink.Schema

  // the writer is schema-driven (see GraftSinkWriter.fieldOf), so a
  // caller may write any TSV-serializable row shape — Spark then
  // passes the input frame's schema into getTable instead of
  // validating against the declared default rollup schema
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft sink needs option 'path'")
    new GraftSinkTable(schema, path)
  }
}

object GraftSink {
  /** The sink table's declared schema: a per-(user, event_type)
    * rollup — every field TSV-safe.
    */
  val Schema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("n", LongType),
    StructField("sum_value", DecimalType(18, 2))))

  val ManifestName = "_MANIFEST"

  /** Read a committed sink directory back — ONLY the manifest-listed
    * files, never a directory listing: uncommitted temps and orphans
    * are invisible, which is the sink's visibility contract. `schema`
    * must match what the writing job serialized (the sink is
    * schema-driven; the default is the declared rollup schema).
    */
  def readBack(spark: SparkSession, path: String,
      schema: StructType = Schema): DataFrame = {
    val manifest = Paths.get(path, ManifestName)
    require(Files.exists(manifest), s"no committed manifest under $path")
    val files = Files.readAllLines(manifest).asScala
      .filter(_.nonEmpty)
      .map(_.split("\t")(0))
      .map(f => Paths.get(path, f).toString)
      .toSeq
    // A committed empty write publishes a manifest listing no files;
    // csv() with an empty path list errors, so honor the visibility
    // contract with an explicitly empty frame instead.
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("sep", "\t").csv(files: _*)
  }

  /** Retained snapshot prefix: every commit also publishes its
    * manifest as `_MANIFEST.v<gen>` (atomic, never rewritten), so any
    * past committed state stays readable — TIME TRAVEL, the
    * Delta/Iceberg snapshot contract in its smallest honest form.
    */
  val VersionPrefix = "_MANIFEST.v"

  /** Committed generations under `path`, ascending (1-based). */
  def versions(path: String): Seq[Int] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith(VersionPrefix))
        .map(_.stripPrefix(VersionPrefix).toInt)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Read the sink AS OF a committed generation — the same
    * manifest-scoped visibility as [[readBack]], keyed on the
    * retained `_MANIFEST.v<gen>` snapshot instead of the live
    * manifest. Later appends never mutate an existing snapshot, so
    * an AS-OF read is repeatable forever.
    */
  def readBackAsOf(spark: SparkSession, path: String, version: Int,
      schema: StructType = Schema): DataFrame = {
    val manifest = Paths.get(path, s"$VersionPrefix$version")
    require(Files.exists(manifest),
      s"no committed generation $version under $path " +
        s"(have: ${versions(path).mkString(",")})")
    val files = Files.readAllLines(manifest).asScala
      .filter(_.nonEmpty)
      .map(_.split("\t")(0))
      .map(f => Paths.get(path, f).toString)
      .toSeq
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("sep", "\t").csv(files: _*)
  }

  /** VACUUM: delete files the live manifest does not reference
    * (crash temps, aborted parts, foreign strays) and EXPIRE
    * generation snapshots beyond the newest `keepGenerations` —
    * the lakehouse maintenance twin of time travel. Manifests are
    * merge-on-append, so the live list is a superset of every
    * generation's list: vacuum can never orphan an as-of read that
    * is still within retention (expired generations fail loudly at
    * read time instead). Single concurrent writer per directory —
    * the sink's standing contract. Returns
    * (data files deleted, generation manifests expired).
    */
  def vacuum(path: String, keepGenerations: Int = Int.MaxValue)
      : (Int, Int) = {
    // the latest snapshot must always survive: generation numbers
    // derive from the newest retained snapshot, so expiring ALL of
    // them would let a later commit REUSE an expired number with
    // different content — silently breaking the never-rewritten /
    // loud-expired-read contract
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1, got $keepGenerations")
    val dir = Paths.get(path)
    val live = Paths.get(path, ManifestName)
    require(Files.exists(live), s"no committed manifest under $path")
    val referenced = Files.readAllLines(live).asScala
      .filter(_.nonEmpty).map(_.split("\t")(0)).toSet
    val expire = versions(path).dropRight(keepGenerations).toSet
    val GenName = (VersionPrefix.replace(".", "\\.") + "(\\d+)").r
    var dataDeleted = 0
    var manifestsExpired = 0
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq.foreach { p =>
      p.getFileName.toString match {
        case ManifestName => ()
        case GenName(g) =>
          if (expire(g.toInt)) { Files.delete(p); manifestsExpired += 1 }
        case name if !referenced(name) =>
          Files.delete(p); dataDeleted += 1
        case _ => ()
      }
    } finally s.close()
    (dataDeleted, manifestsExpired)
  }

  /** Test hook: when set, the writer for partition 0 throws on its
    * first task attempt (after writing some rows), exercising the
    * abort + re-attempt path. Mirrors [[graft] FaultInjector]].
    */
  val failFirstAttempt = new java.util.concurrent.atomic.AtomicBoolean(false)
  val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
}

class GraftSinkTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftSinkBatchWrite(info.schema(), path)
      }
    }
}

/** Job-level commit: rename every task's temp to its job-unique
  * final part name, then publish the manifest by writing a temp file
  * and ATOMIC_MOVE-ing it into place — readers key off the manifest,
  * so the commit really is all-or-nothing at that one rename (a
  * driver crash mid-publish leaves either the old manifest or the
  * new one, never a truncated half). Part names carry a per-job tag,
  * so a second append job can never clobber an earlier job's parts,
  * and the new manifest lists old + new files (single concurrent
  * writer per directory — the usual non-catalog table contract).
  */
class GraftSinkBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  Files.createDirectories(Paths.get(path))

  private val jobTag =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new GraftSinkWriterFactory(schema, path, jobTag)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[GraftSinkCommit])
    msgs.foreach { m =>
      Files.move(Paths.get(path, m.tmpName), Paths.get(path, m.finalName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val manifest = Paths.get(path, GraftSink.ManifestName)
    val existing =
      if (Files.exists(manifest))
        scala.jdk.CollectionConverters.ListHasAsScala(
          Files.readAllLines(manifest)).asScala.filter(_.nonEmpty).toSeq
      else Seq.empty[String]
    val lines = (existing ++ msgs.map(m => s"${m.finalName}\t${m.rows}"))
      .sorted
    // flip the LIVE manifest first, then publish the retained
    // generation snapshot (atomic, never rewritten — the time-travel
    // contract): a crash between the two loses that one snapshot
    // while live readers see a normal commit, so an EXISTING snapshot
    // can never list files the live manifest does not — the invariant
    // vacuum's "never orphan a retained as-of read" rests on. (The
    // reverse order would let a crashed job publish a phantom
    // "committed" generation whose files vacuum later deletes.)
    val gen = GraftSink.versions(path).lastOption.getOrElse(0) + 1
    val bytes = lines.mkString("\n").getBytes(StandardCharsets.UTF_8)
    val tmpManifest = Paths.get(path, s".${GraftSink.ManifestName}-$jobTag")
    Files.write(tmpManifest, bytes)
    Files.move(tmpManifest, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val tmpVer = Paths.get(path, s".${GraftSink.VersionPrefix}$gen-$jobTag")
    Files.write(tmpVer, bytes)
    Files.move(tmpVer, Paths.get(path, s"${GraftSink.VersionPrefix}$gen"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftSinkCommit => m }
      .foreach(m => Files.deleteIfExists(Paths.get(path, m.tmpName)))
}

case class GraftSinkCommit(tmpName: String, finalName: String, rows: Long)
    extends WriterCommitMessage

class GraftSinkWriterFactory(schema: StructType, path: String,
    jobTag: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftSinkWriter(schema, path, jobTag, partitionId, taskId)
}

class GraftSinkWriter(schema: StructType, path: String, jobTag: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val tmpName = f".tmp-$jobTag-$partitionId%05d-$taskId"
  private val out = Files.newBufferedWriter(
    Paths.get(path, tmpName), StandardCharsets.UTF_8)
  private var rows = 0L

  // field serializers resolved once per writer, never per row
  private val fieldOf: Array[InternalRow => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val get: InternalRow => String = f.dataType match {
        case LongType => r => r.getLong(i).toString
        case IntegerType => r => r.getInt(i).toString
        case DoubleType => r => r.getDouble(i).toString
        case StringType => r => {
          val s = r.getUTF8String(i).toString
          // CR matters too: the CSV read-back treats a bare \r as a
          // record terminator, so it would silently split the row
          require(!s.contains('\t') && !s.contains('\n')
              && !s.contains('\r'),
            s"TSV-unsafe string in column ${f.name}")
          s
        }
        case d: DecimalType =>
          r => r.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.toPlainString
        case other =>
          throw new IllegalArgumentException(
            s"graft sink does not serialize $other (column ${f.name})")
      }
      (r: InternalRow) => {
        require(!r.isNullAt(i), s"null in non-null sink column ${f.name}")
        get(r)
      }
    }

  override def write(row: InternalRow): Unit = {
    if (GraftSink.failFirstAttempt.get() && partitionId == 0 && rows == 1
        && org.apache.spark.TaskContext.get() != null
        && org.apache.spark.TaskContext.get().attemptNumber() == 0) {
      throw new RuntimeException("injected first-attempt sink failure")
    }
    var i = 0
    val sb = new StringBuilder
    while (i < fieldOf.length) {
      if (i > 0) sb.append('\t')
      sb.append(fieldOf(i)(row))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftSinkCommit(tmpName, f"part-$jobTag-$partitionId%05d.tsv", rows)
  }

  override def abort(): Unit = {
    GraftSink.aborted.incrementAndGet()
    try out.close() catch { case _: Exception => () }
    Files.deleteIfExists(Paths.get(path, tmpName))
  }

  override def close(): Unit = ()
}
