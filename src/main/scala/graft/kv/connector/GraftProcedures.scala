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
      "compact_index", "recover_txns")

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
}
