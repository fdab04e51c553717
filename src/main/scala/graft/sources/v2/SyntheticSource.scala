package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSourceV2 CONNECTOR — the remaining Spark extension
  * surface next to the engine's custom expressions, aggregates,
  * optimizer rule and physical strategy: `TableProvider` →
  * `ScanBuilder` (filter + column pushdown) → pruned
  * `InputPartition`s → `PartitionReader`.
  *
  * The table itself is a deterministic arithmetic grid (so the DuckDB
  * oracle reproduces it from `range()` with the same integer
  * arithmetic — no files involved):
  *
  *   id  ∈ [0, rows)
  *   grp = id % 20
  *   val = (id * 2654435761) % 1000000007   (Knuth multiplicative)
  *
  * What the connector demonstrates, each spec-pinned:
  *  - **planning-time partition pruning**: the grid splits into
  *    `slices` contiguous id-ranges; pushed id-range predicates drop
  *    whole slices before any task launches (the DSv2 analog of
  *    parquet partition pruning — at 100 TB this is the difference
  *    between launching 10⁵ tasks and launching the 3 that matter);
  *  - **exact filter pushdown**: id-range filters are absorbed into
  *    the scan (narrowing [lo, hi)) and REMOVED from the post-scan
  *    plan — no residual Filter node; non-id predicates are declined
  *    and stay in the plan;
  *  - **column pruning**: `pruneColumns` narrows the emitted schema,
  *    so a grp-only aggregate never materializes `val`.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SyntheticTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("val", LongType, nullable = false)))

  def valOf(id: Long): Long = (id * 2654435761L) % 1000000007L
}

class SyntheticTable(nRows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($nRows)"
  override def schema(): StructType = SyntheticTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(nRows, slices)
}

/** Absorbs id-range predicates into [lo, hi) (exact, so they are NOT
  * re-evaluated post-scan) and prunes the output schema. Anything not
  * an id-range comparison is declined — Spark keeps evaluating it
  * above the scan, which is the correct conservative contract.
  */
class SyntheticScanBuilder(nRows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = nRows
  private var pushed = Array.empty[Filter]
  private var required = SyntheticTable.Schema

  private def asLong(v: Any): Option[Long] = v match {
    case n: Long => Some(n)
    case n: Int => Some(n.toLong)
    case n: Short => Some(n.toLong)
    case n: Byte => Some(n.toLong)
    case _ => None
  }

  /** PURE narrowing: maps a filter to the [lo, hi) it implies, or
    * None if it cannot be fully absorbed. Purity matters — a
    * stateful fold would narrow the scan for the absorbable HALF of
    * a declined And, leaving `pushedFilters()` misreporting what the
    * scan did. The `n != Long.MaxValue` guards keep the exclusive
    * bound's +1 from overflowing (a wrapped bound would silently
    * prune everything while the filter, being "absorbed", is never
    * re-evaluated above the scan).
    */
  private def narrow(f: Filter, b: (Long, Long)): Option[(Long, Long)] =
    f match {
      case GreaterThan("id", v) =>
        asLong(v).collect { case n if n != Long.MaxValue =>
          (math.max(b._1, n + 1), b._2) }
      case GreaterThanOrEqual("id", v) =>
        asLong(v).map(n => (math.max(b._1, n), b._2))
      case LessThan("id", v) =>
        asLong(v).map(n => (b._1, math.min(b._2, n)))
      case LessThanOrEqual("id", v) =>
        asLong(v).collect { case n if n != Long.MaxValue =>
          (b._1, math.min(b._2, n + 1)) }
      case EqualTo("id", v) =>
        asLong(v).collect { case n if n != Long.MaxValue =>
          (math.max(b._1, n), math.min(b._2, n + 1)) }
      case And(l, r) => narrow(l, b).flatMap(narrow(r, _))
      case _ => None
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, declined) = filters.partition { f =>
      narrow(f, (lo, hi)) match {
        case Some((l, h)) => lo = l; hi = h; true
        case None => false
      }
    }
    pushed = accepted
    declined
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SyntheticScan(nRows, lo, hi, slices, required, pushed)
}

class SyntheticScan(nRows: Long, lo: Long, hi: Long, slices: Int,
    schema: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynthetic rows=$nRows range=[$lo,$hi) " +
      s"cols=${schema.fieldNames.mkString(",")} " +
      s"pushed=[${pushed.mkString(", ")}]"

  /** The FULL grid splits into `slices` fixed contiguous ranges;
    * slices outside the pushed [lo, hi) are dropped here, at planning
    * time — the task for a pruned slice never exists.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (nRows + slices - 1) / slices)
    (0L until nRows by step)
      .map(s => SyntheticRange(math.max(s, lo), math.min(s + step, hi)))
      .filter(r => r.lo < r.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(schema)
}

case class SyntheticRange(lo: Long, hi: Long) extends InputPartition

class SyntheticReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SyntheticReader(p.asInstanceOf[SyntheticRange], schema)
}

class SyntheticReader(r: SyntheticRange, schema: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = r.lo - 1

  // column generators resolved ONCE — no per-row string matching in
  // the scan hot loop (a fresh values array per row stays: rows may
  // be buffered by reference on non-codegen paths)
  private val gens: Array[Long => Any] = schema.fieldNames.map {
    case "id" => (id: Long) => id
    case "grp" => (id: Long) => (id % 20).toInt
    case "val" => (id: Long) => SyntheticTable.valOf(id)
  }

  override def next(): Boolean = { cur += 1; cur < r.hi }

  override def get(): InternalRow = {
    val buf = new Array[Any](gens.length)
    var i = 0
    while (i < gens.length) { buf(i) = gens(i)(cur); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(buf)
  }

  override def close(): Unit = ()
}
