package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 CATALOG PLUGIN (`TableCatalog`) — the surface that
  * makes connector tables first-class SQL citizens: registered under
  * `spark.sql.catalog.<name>`, a SQL author writes
  * `SELECT ... FROM <name>.main.grid` and Spark's resolver asks THIS
  * class for the table — no DataFrame-side `format()` call, no temp
  * view, and the full DSv2 scan machinery (filter pushdown, planning-
  * time partition pruning, column pruning of [[SyntheticSource]])
  * rides along unchanged because `loadTable` hands back the same
  * [[SyntheticTable]]. This is how Iceberg/Delta plug whole
  * metastores into Spark; here it closes the engine's last DSv2
  * extension surface (expressions, aggregates, rule, strategy,
  * connector read, connector write, catalog).
  *
  * The catalog is READ-ONLY by declaration — the grid is generated,
  * so every DDL/DML entry point rejects loudly rather than
  * pretending.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = "graftcat"
  private var rows = 200000L
  private var slices = 8

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rows = options.getOrDefault("rows", "200000").toLong
    slices = options.getOrDefault("slices", "8").toInt
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("main")

  private val GridName = "grid"

  /** The one declared namespace. Misspelled namespaces must surface
    * loudly (NoSuchNamespace/NoSuchTable), not silently resolve —
    * `graftcat.<typo>.grid` succeeding would mask user errors.
    */
  private val Namespace = Array("main")

  private def requireNamespace(namespace: Array[String]): Unit =
    if (!(namespace sameElements Namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    Array(Identifier.of(namespace, GridName))
  }

  override def loadTable(ident: Identifier): Table =
    if ((ident.namespace() sameElements Namespace) &&
        ident.name() == GridName) new SyntheticTable(rows, slices)
    else throw new NoSuchTableException(ident)

  private def readOnly: Nothing =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is read-only: the grid is generated")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly

  override def dropTable(ident: Identifier): Boolean = readOnly

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly

  // ---- FunctionCatalog: V2 SQL functions ----------------------------

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    Array(Identifier.of(namespace, KnuthVal.Name))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    if ((ident.namespace() sameElements Namespace) &&
        ident.name() == KnuthVal.Name) KnuthVal
    else throw new NoSuchFunctionException(ident)
}

/** A V2 catalog FUNCTION (`graftcat.main.knuth_val(id)`) — the SQL-
  * native function surface beside the session-extension expressions:
  * the resolver binds THIS object, and because the bound function
  * exposes the `invoke(Long): Long` MAGIC METHOD, Catalyst plans a
  * direct (codegen-friendly) `Invoke` call instead of the row-boxing
  * `produceResult` path — the spec asserts both paths agree and the
  * gate runs the magic one. The function is the grid's own value map,
  * so the `range()` oracle reproduces it exactly.
  */
object KnuthVal extends UnboundFunction {
  val Name = "knuth_val"

  override def name(): String = Name
  override def description(): String =
    "knuth_val(id BIGINT): the synthetic grid's Knuth-multiplicative value"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"knuth_val expects one BIGINT argument, got $inputType")
    Bound
  }

  object Bound extends ScalarFunction[java.lang.Long] {
    override def name(): String = Name
    override def canonicalName(): String = s"graft.$Name"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true

    /** The magic-method fast path Catalyst invokes directly. */
    def invoke(id: Long): Long = SyntheticTable.valOf(id)

    /** Row-boxing fallback; must agree with the magic path. */
    override def produceResult(input: InternalRow): java.lang.Long =
      SyntheticTable.valOf(input.getLong(0))
  }
}
