package graft.kv

import org.apache.spark.sql.{Column, DataFrame}

/** One multi-statement transaction over [[Catalog]] tables — the
  * Spark-bulk re-expression of the reference's Tephra transactional
  * tables (reference: index/keyvalue/KVTransactionalIndexTable.kt —
  * `TransactionAwareHTable`s joined under one `TransactionContext`, so
  * several statements and their base+index writes commit or abort
  * together).
  *
  * Usage (via [[Catalog.transaction]]):
  * {{{
  *   cat.transaction { txn =>
  *     val bal = txn.table("accounts").pointGet(42L)   // pinned read
  *     txn.upsert("accounts", debited)                 // buffered
  *     txn.insert("ledger", entry)                     // buffered
  *   } // ← commit: both tables flip atomically, or neither
  * }}}
  *
  * Isolation = optimistic snapshot isolation per table: reads pin the
  * table's snapshot at first touch and stay repeatable; writes buffer
  * as derived post-images (visible to this transaction's own reads,
  * invisible outside); commit CAS-fails on any write-write conflict
  * with a concurrent writer. There is no lock held while the
  * transaction body runs — only commit takes (sorted) write locks.
  *
  * Buffered statements compose lazily: each mutation derives the next
  * post-image DataFrame from the previous one, and the whole chain
  * materializes ONCE per table at commit (one bulk COW write per
  * table, not one per statement) — a multi-statement transaction
  * costs the same I/O as a single-statement one.
  *
  * Scope: DML only. DDL (create/drop table/index) stays immediate and
  * non-transactional, as in the reference (Tephra wraps table writes,
  * not HBase admin ops). Registered kv indexes are maintained at
  * commit; fulltext/bitmap indexes go STALE like under any bulk write
  * (the commit's post-image has no bounded patch) and refresh via
  * `CALL system.refresh_index`.
  */
final class Txn private[kv] (cat: Catalog) {
  import scala.collection.mutable
  private val pinned = mutable.LinkedHashMap[String, Int]()
  private val postImages = mutable.LinkedHashMap[String, DataFrame]()
  private var closed = false

  private def ensureActive(): Unit =
    if (closed) throw new IllegalStateException(
      "transaction already committed or rolled back")

  private def pin(name: String): Int =
    pinned.getOrElseUpdate(name, cat.dataVersionOf(name))

  /** Read view of a table: this transaction's own buffered post-image
    * if it wrote the table, else the snapshot pinned at first touch
    * (repeatable — concurrent commits don't move it). */
  def table(name: String): KvTable = {
    ensureActive()
    val pk = cat.primaryKeyOf(name)
    postImages.get(name) match {
      case Some(df) => KvTable(df, pk)
      case None =>
        val v = pin(name)
        KvTable(cat.spark.read.schema(cat.schemaOf(name))
          .parquet(cat.dataPathAt(name, v)), pk)
    }
  }

  private def buffer(name: String, post: DataFrame): Unit = {
    pin(name)
    postImages.update(name, post)
  }

  /** INSERT (duplicate rowkeys allowed, raw HBase-Put contract). */
  def insert(name: String, rows: DataFrame): Unit = {
    ensureActive(); buffer(name, table(name).insert(rows).df)
  }

  /** UPSERT by primary key (Put on an existing rowkey overwrites). */
  def upsert(name: String, rows: DataFrame): Unit = {
    ensureActive(); buffer(name, table(name).upsert(rows).df)
  }

  /** Column-wise UPDATE: set `valueCol` = `value` where `pred`. */
  def updateWhere(name: String, pred: Column, valueCol: String,
                  value: Column): Unit = {
    ensureActive(); buffer(name, table(name).updateWhere(pred, valueCol, value).df)
  }

  /** Batched DELETE by rowkey. */
  def delete(name: String, keys: Seq[Any]): Unit = {
    ensureActive(); buffer(name, table(name).delete(keys).df)
  }

  /** DELETE where the predicate is TRUE (SQL semantics). */
  def deleteWhere(name: String, pred: Column): Unit = {
    ensureActive(); buffer(name, table(name).deleteWhere(pred).df)
  }

  private[kv] def commit(): Unit = {
    ensureActive()
    closed = true
    cat.commitTxn(postImages.toSeq.map { case (t, df) => (t, df, pinned(t)) })
  }

  private[kv] def invalidate(): Unit = closed = true
}
