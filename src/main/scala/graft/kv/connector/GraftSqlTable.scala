package graft.kv.connector

import graft.kv.Catalog
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** The V2 `Table` the graft catalog serves. Scans and appends delegate
  * to Spark's parquet DSv2 implementation pointed at the live COW
  * snapshot (full pushdown, pruning, vectorized read — nothing
  * reimplemented); DELETE FROM is a catalog-level copy-on-write
  * rewrite, mirroring the reference's bulk mutation model
  * (HBaseModifiableTable.kt:219 removeAll). */
class GraftSqlTable(cat: Catalog, tableName: String)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  // the live snapshot is pinned at load time: one SQL statement reads
  // one consistent version, and a concurrent bulkLoad flips the pointer
  // for the NEXT loadTable rather than mid-query
  private val delegate: ParquetTable = ParquetTable(
    tableName,
    SparkSession.active,
    CaseInsensitiveStringMap.empty(),
    Seq(cat.liveDataPath(tableName)),
    Some(cat.schemaOf(tableName)),
    classOf[ParquetFileFormat])

  override def name(): String = tableName

  override def schema(): StructType = cat.schemaOf(tableName)

  override def capabilities(): util.Set[TableCapability] = delegate.capabilities()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    delegate.newWriteBuilder(info)

  /** V1 filter → Column. Conservative: unknown filters report
    * untranslatable, so Spark raises a clear error instead of silently
    * deleting the wrong rows. */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r)  => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r)   => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c0)    => toColumn(c0).map(!_)
    case AlwaysTrue()  => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(toColumn(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.flatMap(toColumn(_)).reduceOption(_ && _).getOrElse(lit(true))
    cat.bulkLoad(tableName, cat.table(tableName).deleteWhere(pred).df)
  }
}
