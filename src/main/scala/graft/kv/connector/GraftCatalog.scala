package graft.kv.connector

import graft.kv.Catalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** SQL front door: a Spark V2 `TableCatalog` over [[graft.kv.Catalog]],
  * giving the reference's Calcite-server surface (reference:
  * HBaseSchema.kt:107-259 — CREATE/DROP TABLE arrive as SQL;
  * HBaseModifiableTable.kt:126-240 — INSERT/DELETE as SQL DML) as
  * plain `spark.sql`:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  *   spark.sql("CREATE TABLE graft.t (k BIGINT NOT NULL, v STRING) " +
  *             "TBLPROPERTIES ('primaryKey'='k')")
  *   spark.sql("INSERT INTO graft.t VALUES (1, 'a')")
  *   spark.sql("DELETE FROM graft.t WHERE k = 1")
  *   spark.sql("SELECT * FROM graft.t")
  * }}}
  *
  * Reads and appends delegate to Spark's own parquet DSv2 table over
  * the live COW snapshot directory — scans keep full pushdown/pruning;
  * DELETE is a copy-on-write rewrite through the catalog's versioned
  * snapshot pointer, the same bulk model every other graft mutation
  * uses.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_sql_warehouse").toString)
  }

  override def name(): String = catalogName

  private def cat: Catalog = new Catalog(SparkSession.active, warehouse)

  private def tableName(ident: Identifier): String = {
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("default")),
      s"graft catalog is single-namespace (got ${ident.namespace().mkString(".")})")
    ident.name()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    cat.listTables().map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val c = cat
    val t = tableName(ident)
    if (!c.tableExists(t))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Array(catalogName) :+ t)
    new GraftSqlTable(c, t)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables are rowkey-laid-out, not partitioned — omit PARTITIONED BY")
    val pk = Option(properties.get("primaryKey"))
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq(schema.fieldNames.head))
    val comment = Option(properties.get(TableCatalog.PROP_COMMENT)).getOrElse("")
    val layout = Option(properties.get("layout")).getOrElse("sorted")
    cat.createTable(tableName(ident), schema, pk, comment = comment, layout = layout)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported by the graft catalog")

  override def dropTable(ident: Identifier): Boolean = {
    val c = cat
    val t = tableName(ident)
    if (!c.tableExists(t)) false
    else { c.dropTable(t); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported by the graft catalog")

  /** Index DDL + store maintenance as SQL:
    * `CALL <catalog>.system.compact('t')` etc. — see
    * [[GraftProcedures]]. Procedures live ONLY in the `system`
    * namespace (bare `CALL cat.proc` is accepted as shorthand). */
  private def requireSystemNs(namespace: Array[String]): Unit =
    require(namespace.isEmpty || namespace.sameElements(Array("system")),
      s"no procedures in namespace '${namespace.mkString(".")}' — use system")

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    requireSystemNs(ident.namespace())
    GraftProcedures.load(cat, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    requireSystemNs(namespace)
    GraftProcedures.names.map(n => Identifier.of(Array("system"), n))
  }
}
