package graft.kv.connector

import graft.kv.Catalog
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
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
class GraftSqlTable(cat: Catalog, tableName: String,
                    versionAsOf: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {

  // the live snapshot is pinned at load time: one SQL statement reads
  // one consistent version, and a concurrent bulkLoad flips the pointer
  // for the NEXT loadTable rather than mid-query. The pinned version
  // doubles as the optimistic-CAS token for writes that derive a full
  // post-image from this snapshot (UPDATE/MERGE/DELETE). Time travel
  // (`VERSION AS OF n`) pins an explicit historical version instead —
  // reads resolve against that snapshot; Spark itself rejects writes
  // to time-travel relations.
  private val pinnedVersion: Int =
    versionAsOf.getOrElse(cat.dataVersionOf(tableName))

  private val delegate: ParquetTable = ParquetTable(
    tableName,
    SparkSession.active,
    CaseInsensitiveStringMap.empty(),
    Seq(cat.dataPathAt(tableName, pinnedVersion)),
    Some(cat.schemaOf(tableName)),
    classOf[ParquetFileFormat])

  override def name(): String = tableName

  override def schema(): StructType = cat.schemaOf(tableName)

  override def capabilities(): util.Set[TableCapability] = delegate.capabilities()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)

  /** Builds a WriteBuilder that stages into a fresh uniquely-named
    * directory and commits through the catalog — INSERT batches merge
    * via upsertStaged (PK last-writer-wins), row-level rewrites
    * publish the staged content as the whole post-image via
    * publishStaged. Writers never touch the live directory or a
    * shared staging path, so concurrent statements can't corrupt each
    * other: the version is allocated at commit time under the table
    * write lock. */
  private def stagedWriteBuilder(writeInfo: LogicalWriteInfo,
                                 stripOpColumn: Boolean)
                                (publish: String => Unit): WriteBuilder = {
    val stagingPath = cat.stagingPath(tableName)
    val staging = ParquetTable(
      s"$tableName@staged",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(stagingPath),
      Some(cat.schemaOf(tableName)),
      classOf[ParquetFileFormat])
    val inner = staging.newWriteBuilder(writeInfo)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val b = inner.build().toBatch
          override def createBatchWriterFactory(
              pInfo: PhysicalWriteInfo): DataWriterFactory = {
            val f = b.createBatchWriterFactory(pInfo)
            if (stripOpColumn) new OpStrippingWriterFactory(f) else f
          }
          override def useCommitCoordinator(): Boolean = b.useCommitCoordinator()
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            b.commit(messages)
            publish(stagingPath)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = {
            b.abort(messages)
            cat.discardStaged(stagingPath)
          }
        }
      }
    }
  }

  /** INSERT INTO: staged batch merged with primary-key last-writer-wins
    * semantics (HBase Put: same rowkey overwrites) — the upsert runs
    * under the table write lock against the CURRENT live snapshot, so
    * concurrent inserts serialize rather than erase each other and
    * duplicate keys never accumulate. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    stagedWriteBuilder(info, stripOpColumn = false)(
      staged => cat.upsertStaged(tableName, staged))

  /** SQL UPDATE / MERGE INTO via Spark's group-based row-level
    * operation framework: the operation's scan reads the live snapshot
    * (the whole table is one COW "group" — no runtime group filtering
    * is reported, so Spark rewrites the full post-image), and the
    * replacement write STAGES into the next snapshot directory, then
    * flips the version pointer on commit — the same stage-then-publish
    * protocol every graft bulk writer uses, so a failed UPDATE leaves
    * the live snapshot untouched. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()

        // The framework pushes the command's condition into this scan
        // for GROUP pruning, assuming unscanned groups stay in the
        // table. Our replacement write swaps the WHOLE snapshot (one
        // COW group), so record-level filtering would silently drop
        // every non-matching row — the wrapper refuses pushdown
        // (implements no SupportsPushDown* mixins) and the full
        // post-image flows through the rewrite.
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          new ScanBuilder {
            private val inner = delegate.newScanBuilder(options)
            override def build(): org.apache.spark.sql.connector.read.Scan = inner.build()
          }

        // CAS on the pinned version: the rewrite's post-image was
        // derived from this table's load-time snapshot, so if any
        // other writer published in between, committing it would
        // silently erase that write — fail the statement instead
        override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
          stagedWriteBuilder(writeInfo, stripOpColumn = true)(staged =>
            cat.publishStaged(tableName, staged,
              expectedVersion = Some(pinnedVersion)))
      }
    }

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
    // post-image derives from the pinned snapshot → CAS on publish, so
    // a row inserted concurrently is never silently swept away
    cat.bulkLoad(tableName,
      cat.tableAt(tableName, pinnedVersion).deleteWhere(pred).df,
      expectedVersion = Some(pinnedVersion))
  }
}
