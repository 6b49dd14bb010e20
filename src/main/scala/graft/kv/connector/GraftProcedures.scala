package graft.kv.connector

import graft.kv.Catalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** Stored procedures for the graft SQL catalog — the SQL front door
  * for index DDL and store maintenance:
  *
  * {{{
  *   CALL graft.system.create_index('t', 'by_seg', 'kv', 'segment')
  *   CALL graft.system.drop_index('t', 'by_seg', 'kv')
  *   CALL graft.system.compact('t')            -- bin-pack small files
  *   CALL graft.system.vacuum('t')             -- drop dead snapshots
  * }}}
  *
  * The reference serves CREATE/DROP INDEX as SQL through Calcite
  * (HBaseSchema.kt:262-319); Spark SQL has no CREATE INDEX statement,
  * so the DSv2 ProcedureCatalog is the idiomatic surface for the same
  * operations. compact/vacuum are the HBase-compaction/cleanup
  * analogs on the COW store. All bodies run through [[Catalog]] and
  * therefore under its table write lock.
  */
object GraftProcedures {

  val names: Array[String] =
    Array("compact", "vacuum", "create_index", "drop_index", "refresh_index",
      "compact_index", "recover_txns",
      "ms_get", "ms_scan", "ms_search", "ms_topk", "ms_ann")

  def load(cat: => Catalog, procName: String): UnboundProcedure =
    procName.toLowerCase match {
      case "compact" => proc("compact",
        Array(in("table", StringType),
          inDefault("target_bytes", LongType, (128L * 1024 * 1024).toString)),
        r => cat.compact(str(r, 0), r.getLong(1)))
      case "vacuum" => proc("vacuum",
        Array(in("table", StringType),
          inDefault("staging_grace_ms", LongType, "3600000")),
        r => cat.vacuum(str(r, 0), r.getLong(1)))
      case "create_index" => proc("create_index",
        Array(in("table", StringType), in("index", StringType),
          in("index_type", StringType), in("cols", StringType),
          // flavor options, `k=v` comma-joined: `analyzer=english`
          // (fulltext), `graph=true` / `m=8` (vector — build the
          // navigable-graph artifact in the backfill)
          inDefault("options", StringType, "''")),
        { r =>
          val opts = str(r, 4).split(",").map(_.trim).filter(_.contains("="))
            .map { kv =>
              val Array(k, v) = kv.split("=", 2)
              k.trim.toLowerCase -> v.trim
            }.toMap
          val known = Set("analyzer", "graph", "m")
          val unknown = opts.keySet.diff(known)
          require(unknown.isEmpty,
            s"unknown create_index options: ${unknown.mkString(", ")} " +
              s"(have: ${known.mkString(", ")})")
          cat.createIndex(str(r, 0), str(r, 1), str(r, 2),
            str(r, 3).split(",").map(_.trim).toSeq,
            analyzer = opts.getOrElse("analyzer", "standard"),
            graph = opts.get("graph").exists(_.toBoolean),
            graphM = opts.get("m").map(_.toInt).getOrElse(8))
        })
      case "drop_index" => proc("drop_index",
        Array(in("table", StringType), in("index", StringType),
          in("index_type", StringType)),
        r => cat.dropIndex(str(r, 0), str(r, 1), str(r, 2)))
      case "refresh_index" => proc("refresh_index",
        Array(in("table", StringType), in("index", StringType),
          in("index_type", StringType)),
        r => cat.refreshIndex(str(r, 0), str(r, 1), str(r, 2)))
      case "compact_index" => proc("compact_index",
        Array(in("table", StringType), in("index", StringType),
          in("index_type", StringType)),
        r => cat.compactIndex(str(r, 0), str(r, 1), str(r, 2)))
      // roll crashed multi-statement transactions forward from their
      // intent journals (also runs implicitly before every transaction
      // and vacuum — this is the explicit operational handle)
      case "recover_txns" => proc("recover_txns",
        Array.empty, _ => cat.recoverTransactions())

      // ---- millisecond serving, SQL-reachable --------------------
      // The driver serving family (Catalog.driverPointGet /
      // driverFtSearch / driverFtTopK / driverAnnTopK) runs entirely
      // on the calling thread; these procedures are its SQL front
      // door — the reference serves every read through Calcite SQL,
      // so a SQL-only client must reach the millisecond paths too.
      // Results come back as a LocalScan: the analyzer turns it into
      // a LocalRelation, so `CALL graft.system.ms_get('t', '5')`
      // returns rows with ZERO Spark jobs end to end.
      case "ms_get" => rowsProc("ms_get",
        Array(in("table", StringType), in("key", StringType)),
        { r =>
          val t = str(r, 0)
          val schema = cat.schemaOf(t)
          val pk = cat.primaryKeyOf(t)
          // composite keys bind comma-separated, in pk order
          val parts = str(r, 1).split(",", -1).map(_.trim).toSeq
          require(parts.length == pk.length,
            s"ms_get key must bind the full primary key ${pk.mkString(",")}")
          val key = pk.zip(parts).map { case (c, s) =>
            coerce(schema(c).dataType, s, c) }
          (schema, cat.driverPointGet(t, key: _*))
        })
      case "ms_scan" => rowsProc("ms_scan",
        Array(in("table", StringType), in("lo", StringType),
          in("hi", StringType), inDefault("max_rows", IntegerType, "10000")),
        { r =>
          val t = str(r, 0)
          val schema = cat.schemaOf(t)
          val kt = schema(cat.primaryKeyOf(t).head).dataType
          (schema, cat.driverRangeScan(t, coerce(kt, str(r, 1), "lo"),
            coerce(kt, str(r, 2), "hi"), r.getInt(3)))
        })
      case "ms_search" => rowsProc("ms_search",
        Array(in("table", StringType), in("index", StringType),
          in("query", StringType),
          // 'all' = every term must match (the Lucene MUST clause),
          // 'any' = at least one (SHOULD)
          inDefault("mode", StringType, "'all'")),
        { r =>
          val t = str(r, 0)
          val terms = str(r, 2).split("\\s+").filter(_.nonEmpty).toSeq
          val ids = str(r, 3).toLowerCase match {
            case "all" => cat.driverFtSearch(t, str(r, 1), terms)
            case "any" => cat.driverFtSearchAny(t, str(r, 1), terms)
            case other => throw new IllegalArgumentException(
              s"ms_search mode must be all|any, got '$other'")
          }
          val kt = rowkeyType(cat, t)
          (StructType(Seq(StructField("rk", kt, nullable = true))),
            ids.map(org.apache.spark.sql.Row(_)))
        })
      case "ms_topk" => rowsProc("ms_topk",
        Array(in("table", StringType), in("index", StringType),
          in("query", StringType), inDefault("k", IntegerType, "10")),
        { r =>
          val t = str(r, 0)
          val terms = str(r, 2).split("\\s+").filter(_.nonEmpty).toSeq
          val rows = cat.driverFtTopK(t, str(r, 1), terms, r.getInt(3))
          (StructType(Seq(
            StructField("rk", rowkeyType(cat, t), nullable = true),
            StructField("score", DoubleType, nullable = true))),
            rows.map { case (id, s) => org.apache.spark.sql.Row(id, s) })
        })
      case "ms_ann" => rowsProc("ms_ann",
        Array(in("table", StringType), in("index", StringType),
          // the query vector, comma-separated numbers
          in("query", StringType), inDefault("k", IntegerType, "10"),
          inDefault("nprobe", IntegerType, "4")),
        { r =>
          val t = str(r, 0)
          val qv = str(r, 2).split(",").map(_.trim.toDouble).toSeq
          val rows = cat.driverAnnTopK(t, str(r, 1), qv, r.getInt(3),
            r.getInt(4))
          (StructType(Seq(
            StructField("rk", rowkeyType(cat, t), nullable = true),
            StructField("score", DoubleType, nullable = true))),
            rows.map { case (id, s) => org.apache.spark.sql.Row(id, s) })
        })
      case other =>
        throw new UnsupportedOperationException(s"unknown procedure $other " +
          s"(have: ${names.mkString(", ")})")
    }

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()
  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  /** Void maintenance procedure: binds to itself (parameters are
    * static), runs the body, returns no result sets. */
  private def proc(n: String, ps: Array[ProcedureParameter],
                   body: InternalRow => Unit): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = n
      override def description(): String = s"graft maintenance procedure $n"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = ps
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        body(input)
        java.util.Collections.emptyIterator[Scan]()
      }
    }

  /** Row-returning serving procedure: the body computes (schema, rows)
    * ON THE CALLING THREAD (the driver serving contract — zero Spark
    * jobs), and the result rides back as a [[LocalScan]], which the
    * analyzer (InvokeProcedures) rewrites to a LocalRelation — the
    * whole CALL never schedules a job. */
  private def rowsProc(n: String, ps: Array[ProcedureParameter],
                       body: InternalRow =>
                         (StructType, Seq[org.apache.spark.sql.Row])): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = n
      override def description(): String = s"graft serving procedure $n"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = ps
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (schema, rows) = body(input)
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(schema)
        val data = rows.map(r => conv(r).asInstanceOf[InternalRow]).toArray
        val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema(): StructType = schema
          override def rows(): Array[InternalRow] = data
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }

  /** The leading rowkey column's type — what the serving results'
    * `rk` column carries. */
  private def rowkeyType(cat: Catalog, table: String): DataType =
    cat.schemaOf(table)(cat.primaryKeyOf(table).head).dataType

  /** SQL-string → typed key value, per the pk column's type. The
    * basic key families the serving paths accept; anything else is a
    * loud error naming the column. */
  private def coerce(dt: DataType, s: String, col: String): Any = dt match {
    case LongType => s.toLong
    case IntegerType => s.toInt
    case ShortType => s.toShort
    case ByteType => s.toByte
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case BooleanType => s.toBoolean
    case StringType => s
    case other => throw new IllegalArgumentException(
      s"ms_get cannot bind key column $col of type $other from SQL")
  }
}
