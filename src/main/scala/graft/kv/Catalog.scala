package graft.kv

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, Path}
import java.util.Comparator
import scala.collection.JavaConverters._

/** DDL + metadata catalog, the Spark-native re-expression of the
  * reference's system tables (reference: HBaseSchema.kt:107-259
  * createTable/dropTable/createIndex/dropIndex; HBaseTable.kt:197-216
  * SystemAttribute/ColumnAttribute stored in `table.sys`/`column.sys`).
  *
  * Here the warehouse is a directory tree:
  *   warehouse/<table>/_graft_meta.json   — table.sys row equivalent
  *   warehouse/<table>/data/  (parquet)   — rowkey-sorted data
  *   warehouse/<table>.<type>.<index>/    — index tables, same naming
  *     scheme as the reference (README.md "{表名}.{系统功能}.{扩展描述}",
  *     HBaseSchema.kt:306 indexTableRowkey).
  *
  * Metadata the reference stores per table: primary key, transactional
  * flag, index type, charset, comment (HBaseSchema.kt:118-137); per
  * column: datatype, precision, position, nullable, default
  * (HBaseSchema.kt:141-160). We persist the same fields. At cluster
  * scale this JSON-per-table catalog would be swapped for a metastore,
  * but the API surface is what matters here.
  */
final class Catalog(val spark: SparkSession, val warehouse: String) {

  private def tableDir(name: String): Path = Paths.get(warehouse, name)
  private def metaFile(name: String): Path = tableDir(name).resolve("_graft_meta.json")
  /** Data lives in versioned snapshot dirs (data_v0, data_v1, ...) with
    * the live version recorded in the metadata — copy-on-write pointer
    * swap, so a bulk merge can read snapshot N while writing N+1
    * (never overwriting its own input), and old snapshots remain
    * readable until vacuumed. */
  private def dataDir(name: String): String =
    tableDir(name).resolve(s"data_v${dataVersionOf(name)}").toString

  def dataVersionOf(name: String): Int = {
    val meta = Files.readString(metaFile(name))
    "\"dataVersion\":\"(\\d+)\"".r.findFirstMatchIn(meta).map(_.group(1).toInt).getOrElse(0)
  }

  /** Reference: column names may not be `id` (reserved for the
    * implicit uuid primary key) — HBaseSchema.kt:112-117. */
  def createTable(name: String,
                  schema: StructType,
                  primaryKey: Seq[String],
                  isTransactional: Boolean = true,
                  comment: String = ""): Unit = {
    require(primaryKey.nonEmpty, "no primary key") // PrimaryKeyMissedException
    require(!schema.fieldNames.exists(_.equalsIgnoreCase("id")),
      "column name should not be id") // IllegalColumnNameException
    require(!tableExists(name), s"table $name exists")
    Files.createDirectories(tableDir(name))
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"name":"${f.name}","datatype":"${f.dataType.sql}","position":$i,""" +
        s""""nullable":${f.nullable},"isPrimary":${primaryKey.contains(f.name)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"table":"$name","primary":"${primaryKey.mkString(",")}",""" +
        s""""isTransactional":$isTransactional,"indexType":"NONE","index":"","dataVersion":"0",""" +
        s""""lockStatus":"UNLOCK","charset":"UTF-8","comment":"$comment",""" +
        s""""columns":$cols}"""
    Files.writeString(metaFile(name), json)
    // materialize an empty rowkey-sorted layout
    KvLayout.writeSorted(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      primaryKey, dataDir(name))
  }

  def tableExists(name: String): Boolean = Files.exists(metaFile(name))

  /** Bulk load rows (the "Bulk read/write" path): write the next
    * snapshot, then swap the pointer. `rows` may derive from the
    * table's current snapshot (COW merge) — the write targets a new
    * directory, so that lineage stays valid. */
  def bulkLoad(name: String, rows: DataFrame): Unit = {
    val pk = primaryKeyOf(name)
    val next = dataVersionOf(name) + 1
    KvLayout.writeSorted(rows, pk,
      tableDir(name).resolve(s"data_v$next").toString)
    setMetaAttr(name, "dataVersion", next.toString)
  }

  /** Drop all snapshots except the live one. */
  def vacuum(name: String): Unit = {
    val live = s"data_v${dataVersionOf(name)}"
    Files.list(tableDir(name)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("data_v") &&
        p.getFileName.toString != live)
      .foreach(p => Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete))
  }

  /** Read a specific historical snapshot (time travel). */
  def tableAt(name: String, version: Int): KvTable =
    KvTable(spark.read.parquet(tableDir(name).resolve(s"data_v$version").toString),
      primaryKeyOf(name))

  def table(name: String): KvTable =
    KvTable(spark.read.parquet(dataDir(name)), primaryKeyOf(name))

  def primaryKeyOf(name: String): Seq[String] = {
    val meta = Files.readString(metaFile(name))
    "\"primary\":\"([^\"]*)\"".r.findFirstMatchIn(meta).get.group(1).split(",").toSeq
  }

  /** Reference dropTable: disable + delete + purge sys rows
    * (HBaseSchema.kt:225-259). Here: recursive delete of the dir. */
  def dropTable(name: String): Unit = {
    require(tableExists(name), s"table $name does not exist")
    // purge the table AND its index tables (reference dropTable clears
    // the sys rows and index tables too, HBaseSchema.kt:225-259)
    val doomed = tableDir(name) +: Files.list(Paths.get(warehouse))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith(s"$name.")).toSeq
    doomed.foreach(dir =>
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete))
  }

  def listTables(): Seq[String] =
    if (!Files.exists(Paths.get(warehouse))) Seq.empty
    else Files.list(Paths.get(warehouse)).iterator().asScala
      .filter(p => Files.exists(p.resolve("_graft_meta.json")))
      .map(_.getFileName.toString).toSeq.sorted

  /** Index DDL (reference: HBaseSchema.kt:262-319 createIndex — build
    * index table `{table}.{type}.{index}`, backfill from a scan, flip
    * the table's indexType/index attributes; dropIndex reverses).
    * Index flavors: "kv" (graft.index.KvIndex layout) and "bitmap"
    * (graft.index.BitmapIndex layout). */
  def createIndex(table: String, indexName: String, indexType: String,
                  cols: Seq[String]): Unit = {
    require(tableExists(table), s"table $table does not exist")
    require(cols.size == 1,
      s"single-column indexes only (got ${cols.size}); composite keys need one index per column today")
    val dir = indexDir(table, indexName, indexType)
    require(!Files.exists(dir),
      s"$table $indexName $indexType exists when create index") // IndexExistsException
    val t = this.table(table)
    val pk = primaryKeyOf(table).head
    // reference locks the table during DDL (table.sys lockStatus,
    // HBaseSchema.kt README: DDL修改时会锁定); COW analog: flip the
    // attribute around the backfill so readers can see DDL-in-progress
    setMetaAttr(table, "lockStatus", "LOCKED")
    try {
      Files.createDirectories(dir)
      indexType.toLowerCase match {
        case "kv" =>
          KvLayout.writeSorted(graft.index.KvIndex.build(t.df, pk, cols.head),
            Seq("ik"), dir.resolve("data").toString)
        case "bitmap" =>
          graft.index.BitmapIndex.build(t.df, pk, cols.head)
            .write.mode("overwrite").parquet(dir.resolve("data").toString)
        case "fulltext" =>
          // the reference's Lucene flavor: persisted inverted index
          // (postings term-sorted ⇒ term filters prune row groups)
          val postings = graft.index.FullText.buildPostings(t.df, pk, cols.head)
          KvLayout.writeSorted(postings, Seq("term"),
            dir.resolve("data").toString)
          KvLayout.writeSorted(graft.index.FullText.buildDictionary(postings),
            Seq("term"), dir.resolve("dict").toString)
        case other => throw new IllegalArgumentException(s"index type $other")
      }
      setMetaAttr(table, "indexType", indexType.toUpperCase)
      setMetaAttr(table, "index", cols.mkString(","))
    } finally setMetaAttr(table, "lockStatus", "UNLOCK")
  }

  def lockStatusOf(table: String): String = {
    val meta = Files.readString(metaFile(table))
    "\"lockStatus\":\"([^\"]*)\"".r.findFirstMatchIn(meta).get.group(1)
  }

  def indexDictionary(table: String, indexName: String, indexType: String): DataFrame =
    spark.read.parquet(indexDir(table, indexName, indexType).resolve("dict").toString)

  def dropIndex(table: String, indexName: String, indexType: String): Unit = {
    val dir = indexDir(table, indexName, indexType)
    require(Files.exists(dir),
      s"$table $indexName $indexType not exists when drop index")
    Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    setMetaAttr(table, "indexType", "NONE")
    setMetaAttr(table, "index", "")
  }

  def indexData(table: String, indexName: String, indexType: String): DataFrame =
    spark.read.parquet(indexDir(table, indexName, indexType).resolve("data").toString)

  def listIndexes(table: String): Seq[String] =
    if (!Files.exists(Paths.get(warehouse))) Seq.empty
    else Files.list(Paths.get(warehouse)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$table."))
      .toSeq.sorted

  /** Reference naming: {table}.{type}.{index} (HBaseSchema.kt:306,
    * README.md metadata scheme). */
  private def indexDir(table: String, indexName: String, indexType: String): Path =
    Paths.get(warehouse, s"$table.${indexType.toLowerCase}.$indexName")

  private def setMetaAttr(table: String, attr: String, value: String): Unit = {
    val meta = Files.readString(metaFile(table))
    val updated = s""""$attr":"[^"]*"""".r
      .replaceFirstIn(meta, s""""$attr":"$value"""")
    Files.writeString(metaFile(table), updated)
  }

  /** column.sys dump: one row per column with the reference's
    * ColumnAttribute fields (datatype, position, nullable, primary). */
  def describeTable(name: String): DataFrame = {
    val meta = Files.readString(metaFile(name))
    val colRe = ("\\{\"name\":\"([^\"]+)\",\"datatype\":\"([^\"]+)\"," +
      "\"position\":(\\d+),\"nullable\":(true|false),\"isPrimary\":(true|false)\\}").r
    val rows = colRe.findAllMatchIn(meta).map { m =>
      Row(name, m.group(1), m.group(2), m.group(3).toInt,
        m.group(4).toBoolean, m.group(5).toBoolean)
    }.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("table_name", StringType, false),
        StructField("column_name", StringType, false),
        StructField("datatype", StringType, false),
        StructField("position", IntegerType, false),
        StructField("nullable", BooleanType, false),
        StructField("is_primary", BooleanType, false))))
  }
}
