package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class GraftCatalog extends TableCatalog {

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

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, GridName))

  override def loadTable(ident: Identifier): Table =
    if (ident.name() == GridName) new SyntheticTable(rows, slices)
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
}
