package graft.kv

import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
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
  *   warehouse/<table>/data_vN/ (parquet) — rowkey-sorted data snapshots
  *   warehouse/<table>.<type>.<index>/    — index tables, same naming
  *     scheme as the reference (README.md "{表名}.{系统功能}.{扩展描述}",
  *     HBaseSchema.kt:306 indexTableRowkey).
  *
  * Metadata the reference stores per table: primary key, transactional
  * flag, index registry, charset, comment (HBaseSchema.kt:118-137); per
  * column: datatype, precision, position, nullable, default
  * (HBaseSchema.kt:141-160). We persist the same fields. Metadata is
  * real JSON (Jackson, bundled with Spark) — arbitrary comments/column
  * names round-trip safely. At cluster scale this JSON-per-table
  * catalog would be swapped for a metastore, but the API surface is
  * what matters here.
  */
final class Catalog(val spark: SparkSession, val warehouse: String,
                    lockProviderOpt: Option[LockProvider] = None) {

  private val mapper = new ObjectMapper()

  /** Every write lock (bulk writers, transaction commits, DDL)
    * resolves through this seam — see [[LockProvider]] for the
    * multi-process / object-store story. Default: file locks under
    * each table dir. */
  private val lockProvider: LockProvider =
    lockProviderOpt.getOrElse(
      new FsLockProvider(res => tableDir(res.takeWhile(_ != '@'))))

  /** Stable warehouse identity baked into every lock/lease resource
    * name ([[lockResource]]). Lease resources used to be keyed by the
    * BARE table name, so two catalogs over DIFFERENT warehouses
    * sharing one lease authority and a same-named table shared one
    * lease AND one authority-held commit pointer — the lower-versioned
    * warehouse's commitSwap then returned STALE with its durable meta
    * behind, which publishVersion/commitTxn read as "a newer grant's
    * commit in flight" and aborted permanently. Qualifying the
    * resource with the canonical warehouse path's digest gives each
    * warehouse its own lease + pointer namespace at any shared
    * authority. */
  private val warehouseId: String = {
    val canon = Paths.get(warehouse).toAbsolutePath.normalize.toString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.take(6).map(b => f"$b%02x").mkString
  }

  /** The authority-side resource name for a table's write lock: the
    * table name (valid chars [A-Za-z0-9_], so '@' is unambiguous)
    * qualified by [[warehouseId]]. Test-visible so the concurrency
    * specs can contend with the exact resource this catalog holds. */
  private[graft] def lockResource(name: String): String =
    s"$name@$warehouseId"

  private def tableDir(name: String): Path = Paths.get(warehouse, name)
  private def metaFile(name: String): Path = tableDir(name).resolve("_graft_meta.json")
  /** Data lives in versioned snapshot dirs (data_v0, data_v1, ...) with
    * the live version recorded in the metadata — copy-on-write pointer
    * swap, so a bulk merge can read snapshot N while writing N+1
    * (never overwriting its own input), and old snapshots remain
    * readable until vacuumed. */
  private def dataDir(name: String): String =
    tableDir(name).resolve(s"data_v${dataVersionOf(name)}").toString

  private def readMeta(name: String): ObjectNode =
    mapper.readTree(Files.readString(metaFile(name))).asInstanceOf[ObjectNode]

  /** Meta writes are stage-then-rename: `Files.writeString` in place
    * truncates before it writes, and the meta file is read LOCK-FREE
    * on every version resolution — a reader racing an in-place write
    * sees an empty or partial JSON and crashes (observed: Jackson
    * MissingNode on an empty read). The rename publishes the complete
    * document atomically; a racing reader sees the old meta or the
    * new, never bytes in between. */
  private def writeMeta(name: String, meta: ObjectNode): Unit = {
    val tmp = tableDir(name).resolve(
      s".meta_tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    Files.writeString(tmp, mapper.writeValueAsString(meta))
    Files.move(tmp, metaFile(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Iterate a directory stream with a guaranteed close (long-lived
    * driver JVMs leak handles otherwise). */
  private def withList[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    try s.sorted(Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally s.close()
  }

  /** Raw pointer exactly as recorded in the table's meta. ONLY for the
    * recovery/heal paths, which must see the unoverlaid value to know
    * whether a journaled bump still needs applying — resolving through
    * [[dataVersionOf]] there would make the overlaid version look
    * already-bumped and skip (then delete) the journal, reverting the
    * table. */
  private def metaVersionOf(name: String): Int =
    readMeta(name).path("dataVersion").asInt(0)

  /** Live version as READERS must see it: the meta pointer overlaid
    * with any committed-transaction journal entry for this table.
    *
    * The journal is the transaction's atomically-published commit
    * record (written complete, via atomic rename, only after every
    * snapshot is staged and CAS-checked; deleted only after every
    * pointer bump landed). Resolving through it means ALL tables of a
    * multi-table transaction become visible at the single instant the
    * journal appears — a lock-free reader can never see table A at the
    * post-image and table B at the pre-image because it caught the
    * committer between two pointer bumps (reference semantics:
    * KVTransactionalIndexTable.kt:14-52 — Tephra's transaction manager
    * makes base+index+multi-table mutations visible atomically).
    *
    * Order matters: journals are scanned BEFORE the meta read. A
    * commit deletes its journal only after every bump, so "no journal"
    * observed first guarantees the meta read that follows sees the
    * bump; the reverse order could catch table B's meta pre-bump and
    * then miss the just-deleted journal — reviving the mixed window. */
  def dataVersionOf(name: String): Int = {
    val journaled = committedJournalVersions(name)
    val base = metaVersionOf(name)
    if (journaled.contains(base + 1) &&
        Files.exists(tableDir(name).resolve(s"data_v${base + 1}")))
      base + 1
    else base
  }

  /** Journals live in a dedicated subdirectory so the hot-path
    * overlay probe is O(1): [[dataVersionOf]] runs on every lock-free
    * version resolution, and listing the whole warehouse root (one
    * entry per table) there would make a point read pay O(tables)
    * dirents. This directory is absent or empty except in the
    * instants a commit is in flight or a committer crashed. Journals
    * written at the warehouse ROOT by pre-subdir builds are still
    * healed and recovered (those paths sweep both locations) — only
    * the read overlay skips them, degrading a legacy pending journal
    * to pre-overlay visibility until recovery runs. */
  private def txnDir: Path = Paths.get(warehouse, "_graft_txn")

  /** `next` versions journaled for `name` by committed transactions. */
  private def committedJournalVersions(name: String): Set[Int] =
    (pendingJournals(txnDir) ++ legacyRootJournals()).flatMap {
      case (_, Some(entries)) =>
        entries.collect { case (t, v) if t == name => v }
      case _ => Nil // corrupt: recoverTransactions quarantines
    }.toSet

  /** Pre-subdir builds wrote journals at the warehouse ROOT. The root
    * is scanned on the FIRST overlay resolution per Catalog instance
    * and stays in the scan set only while legacy journals remain — a
    * crashed pre-upgrade multi-table commit keeps atomic visibility
    * through the overlay without every resolution paying an O(tables)
    * root listing. Once observed clean it stays clean: new journals
    * are only ever written under [[txnDir]]. */
  @volatile private var legacyRootMayHaveJournals = true
  private def legacyRootJournals(): Seq[(Path, Option[Seq[(String, Int)]])] =
    if (!legacyRootMayHaveJournals) Nil
    else {
      val js = pendingJournals(Paths.get(warehouse))
      // A parse-corrupt legacy journal (entries None) contributes
      // nothing to the overlay — committedJournalVersions skips it and
      // only recoverTransactions (which scans the root itself, not via
      // this flag) quarantines it. Keeping the flag up for corrupt-only
      // residue would re-list the root and re-read/re-parse the corrupt
      // file on EVERY lock-free version resolution until recovery runs.
      if (js.forall(_._2.isEmpty)) { legacyRootMayHaveJournals = false; Nil }
      else js
    }

  /** Pending transaction journals under `dir`, as
    * (path, parsed-publishes or None-if-corrupt).
    *
    * Shared by the read overlay, the in-lock heal, and full recovery —
    * ONE error policy for all three:
    *   - absent dir → no journals;
    *   - NoSuchFileException on read → the journal drained between
    *     the listing and the read, so its bumps are already applied —
    *     treated as absent (the delete-after-bump commit order makes
    *     this safe);
    *   - any OTHER IOException (EACCES/EMFILE/EIO) is retried briefly
    *     and then THROWN: a caller that proceeded as if no journal
    *     existed would overwrite a committed transaction's staged
    *     snapshot (writers) or un-see a committed transaction
    *     (readers) — failing the operation is the only safe answer;
    *   - content read successfully but unparseable → entries None
    *     (genuinely corrupt); recoverTransactions quarantines those,
    *     every other caller skips them. */
  private def pendingJournals(dir: Path): Seq[(Path, Option[Seq[(String, Int)]])] = {
    if (!Files.exists(dir)) return Nil
    val journals = withList(dir) { it =>
      // .json suffix required: quarantined corrupt journals are renamed
      // to .json.corrupt and must not be re-listed forever
      it.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("_graft_txn_") && n.endsWith(".json")
      }.toList
    }
    journals.flatMap { j =>
      def read(attempt: Int): Option[String] =
        try Some(Files.readString(j))
        catch {
          case _: java.nio.file.NoSuchFileException => None
          case e: java.io.IOException =>
            if (attempt >= 3)
              throw new IllegalStateException(
                s"transaction journal $j unreadable after ${attempt + 1} " +
                "attempts — refusing to proceed as if the committed " +
                "transaction did not exist", e)
            Thread.sleep(10L << attempt)
            read(attempt + 1)
        }
      read(0).map { text =>
        val node = try mapper.readTree(text) catch { case _: Exception => null }
        if (node == null) (j, None)
        else (j, Some(node.path("publishes").elements().asScala.map { e =>
          (e.path("table").asText(), e.path("next").asInt())
        }.toList))
      }
    }
  }

  /** Reference: column names may not be `id` (reserved for the
    * implicit uuid primary key) — HBaseSchema.kt:112-117. */
  /** `layout`: "sorted" (default — lexicographic rowkey sort, the
    * HBase-region analog) or "zorder" (two-column primary keys only:
    * interleaved-bit clustering so range reads on EITHER key column
    * prune files; the HBase-world alternative is a second
    * salted-rowkey table). */
  def createTable(name: String,
                  schema: StructType,
                  primaryKey: Seq[String],
                  isTransactional: Boolean = true,
                  comment: String = "",
                  layout: String = "sorted",
                  charset: String = "UTF-8"): Unit = {
    require(primaryKey.nonEmpty, "no primary key") // PrimaryKeyMissedException
    require(layout == "sorted" || layout == "zorder",
      s"unknown layout '$layout' — use 'sorted' or 'zorder'")
    // the transaction-journal directory shares the warehouse root with
    // table dirs — a table of that name would collide with it
    require(name != "_graft_txn", "table name '_graft_txn' is reserved")
    // Name charset: a "." collides with the {table}.{type}.{index}
    // index-dir scheme (dropTable("a") would recursively delete a
    // table named "a.b"), and a path separator ("../x") would resolve
    // tableDir OUTSIDE the warehouse root — create/drop would then
    // read and recursively delete foreign paths. Reject both up front.
    require(name.matches("[A-Za-z0-9_]+"),
      s"invalid table name '$name' — use [A-Za-z0-9_]+ " +
        "(dots collide with index directories, separators escape the warehouse)")
    // validate BEFORE any metadata lands: a bad key column must not be
    // discovered by the v0 snapshot write below, which would leave a
    // meta file without data — tableExists forever true, every read
    // and re-create failing (case-insensitive, like Spark resolution)
    primaryKey.foreach { k =>
      require(schema.fields.exists(_.name.equalsIgnoreCase(k)),
        s"primary key column '$k' not in schema")
    }
    if (layout == "zorder") {
      require(primaryKey.size == 2,
        s"layout 'zorder' requires a two-column primary key (got ${primaryKey.size})")
      // z-values come from min/max-scaled doubles: non-numeric keys
      // would silently cast to null and lose all clustering.
      // Case-insensitive field lookup, like Spark's default resolution.
      primaryKey.foreach { k =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(k))
          .getOrElse(throw new IllegalArgumentException(
            s"primary key column '$k' not in schema"))
        require(f.dataType.isInstanceOf[NumericType],
          s"layout 'zorder' needs numeric key columns; '$k' is ${f.dataType.sql}")
      }
    }
    require(!schema.fieldNames.exists(_.equalsIgnoreCase("id")),
      "column name should not be id") // IllegalColumnNameException
    // Canonicalize the key to the SCHEMA's field case before it lands
    // anywhere: validation above is case-insensitive (Spark
    // resolution), but exact-match consumers downstream
    // (StructType.apply in manifestPersistable, fields.filterNot in
    // upsertStaged) would otherwise wedge every CDC merge and INSERT
    // on a table created with primaryKey=Seq("K") over field "k".
    val canonicalPk = primaryKey.map(k =>
      schema.fields.find(_.name.equalsIgnoreCase(k)).get.name)
    // The existence check runs INSIDE the write lock: two concurrent
    // creators both passing a bare check would write v0 into the same
    // dir mode-overwrite, and the loser's failure-unwind would then
    // deleteRecursively the winner's just-created table. The lock file
    // needs the dir to exist first; createDirectories is idempotent
    // and an empty dir without meta is not an existing table.
    Files.createDirectories(tableDir(name))
    withWriteLock(name) {
    require(!tableExists(name), s"table $name exists")
    val meta = mapper.createObjectNode()
    meta.put("table", name)
    meta.put("primary", canonicalPk.mkString(","))
    meta.put("isTransactional", isTransactional)
    meta.put("dataVersion", 0)
    meta.put("lockStatus", "UNLOCK")
    // per-table charset, like the reference's table.sys attribute
    // (HBaseTable.kt:197-216). Data at rest is parquet (UTF-8 by
    // format); the attribute is the declared interchange charset for
    // external writers, round-tripped through DDL.
    meta.put("charset", charset)
    meta.put("comment", comment)
    meta.put("layout", layout)
    // table.sys create-time attribute (reference HBaseTable.kt:197-216)
    meta.put("createdAt", System.currentTimeMillis())
    meta.set[JsonNode]("indexes", mapper.createArrayNode()): Unit
    // v0 (the empty snapshot below) publishes now — seeds the
    // TIMESTAMP AS OF map so even version 0 resolves from recorded
    // publish time, not directory mtime
    val publishTimes = mapper.createObjectNode()
    publishTimes.put("0", System.currentTimeMillis()): Unit
    meta.set[JsonNode]("publishTimes", publishTimes): Unit
    val cols = mapper.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val c = mapper.createObjectNode()
      c.put("name", f.name)
      c.put("datatype", f.dataType.sql)
      c.put("position", i)
      c.put("nullable", f.nullable)
      // case-insensitive, matching Spark resolution and the zorder
      // validation above — createTable(primaryKey=Seq("K")) on field
      // "k" works everywhere else, so column.sys must agree
      c.put("isPrimary", primaryKey.exists(_.equalsIgnoreCase(f.name)))
      // field metadata carries the column DEFAULT (Spark's
      // CURRENT_DEFAULT/EXISTS_DEFAULT keys — the column.sys default
      // attribute of the reference, HBaseSchema.kt:141-160); persisted
      // verbatim so INSERTs resolve defaults after a catalog restart
      if (f.metadata != Metadata.empty) c.put("metadata", f.metadata.json)
      cols.add(c): Unit
    }
    meta.set[JsonNode]("columns", cols): Unit
    writeMeta(name, meta)
    // materialize an empty rowkey-sorted layout; if this write fails
    // (disk, interrupted job), unwind the meta file too — a table that
    // "exists" without a v0 snapshot can neither be read nor recreated
    try KvLayout.writeSorted(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      canonicalPk, dataDir(name))
    catch {
      case e: Throwable =>
        try deleteRecursively(tableDir(name))
        catch { case _: Exception => () }
        throw e
    }
    }: Unit
  }

  def tableExists(name: String): Boolean = Files.exists(metaFile(name))

  def layoutOf(name: String): String =
    readMeta(name).path("layout").asText("sorted")

  /** Layout-dispatching snapshot writer: every write path persists
    * through the table's declared layout. */
  private def writeData(name: String, df: DataFrame, path: String,
                        partitions: Int = 0): Unit = {
    val pk = primaryKeyOf(name)
    if (layoutOf(name) == "zorder" && pk.size == 2)
      KvLayout.writeZOrdered(df, pk.head, pk(1), path, partitions)
    else KvLayout.writeSorted(df, pk, path, partitions)
  }

  /** Bulk load rows (the "Bulk read/write" path): stage the next
    * snapshot in a grant-scoped dir, then rename + swap the pointer
    * behind the commit-point fence ([[publishVersion]]). `rows` may
    * derive from the table's current snapshot (COW merge) — the write
    * targets a new directory, so that lineage stays valid. */
  def bulkLoad(name: String, rows: DataFrame, partitions: Int = 0,
               expectedVersion: Option[Int] = None): Unit = {
    withRecoveredWriteLock(name) {
      val cur = dataVersionOf(name)
      checkExpected(name, cur, expectedVersion)
      val next = cur + 1
      val nextDir = tableDir(name).resolve(s"data_v$next")
      val stage = newSnapshotStaging(name)
      writeData(name, rows, stage.toString, partitions)
      val maint = maintainIndexes(name, next, stage, pre = None, post = None)
      publishGuardingIndexAsOf(name, next, Seq(stage -> nextDir), maint)
    }
  }

  /** Grant-scoped unique staging dir for a table-snapshot write. Every
    * write path stages its heavy data write here and lets
    * [[publishVersion]] rename it onto the version-numbered dir AFTER
    * the commit-point fence passes — so a lease holder that lapses
    * MID-STAGE keeps writing only into its own dir and can never
    * cross-write the files the NEW owner staged or published under the
    * same version number (the HDFS/object-store "task attempt dir"
    * recipe). The `.staging_` prefix keeps a crashed attempt inside
    * vacuum's existing sweep; the grant epoch in the name is operator
    * forensics, uniqueness comes from the UUID. Reads that target a
    * staged dir (index rebuild's post-image scan, the merge's
    * scanRanges) work — Spark's hidden-path filter applies to
    * DIRECTORY CHILDREN during listing, not to an explicitly given
    * root (verified against the DSv2 stagingPath precedent; the
    * "All paths were ignored" DataSource log line is cosmetic). */
  private def newSnapshotStaging(name: String,
                                 handle: Option[LockProvider.Handle] = None): Path = {
    val tok = handle.orElse(heldWriteLock.value).map(_.fencingToken).getOrElse(0L)
    tableDir(name).resolve(s".staging_grant${tok}_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
  }

  /** Optimistic CAS for writers whose post-image derives from a pinned
    * snapshot: if another writer published in between, committing the
    * derived post-image would silently erase that writer's rows, so the
    * statement must fail instead (the live snapshot stays untouched —
    * the caller re-runs against the new version). */
  private def checkExpected(name: String, current: Int,
                            expected: Option[Int]): Unit =
    expected.filter(_ != current).foreach { e =>
      throw new java.util.ConcurrentModificationException(
        s"table $name advanced to data_v$current while this statement was " +
        s"pinned to data_v$e — a concurrent write would be lost; retry")
    }

  /** Writer mutual exclusion for the COW version pointer — the
    * single-warehouse analog of the reference's distributed DDL lock
    * (index/lucene/RedisLockFactory.kt, Tephra transactions in
    * KVTransactionalIndexTable.kt). Resolved through [[lockProvider]]
    * (default: atomic lock-file create under the table dir), so two
    * concurrent bulk writers serialize: each reads the version, writes
    * its snapshot and swaps the pointer under the lock, and neither
    * can clobber the other's data_vN directory or lose the other's
    * bump. Readers never take the lock (snapshots are immutable once
    * published). */
  private def withWriteLock[A](name: String, timeoutMs: Long = 600000L)(f: => A): A = {
    val lock = acquireWriteLock(name, timeoutMs)
    try heldWriteLock.withValue(Some(lock))(f) finally lock.release()
  }

  /** The write lock the current thread's write path holds, visible to
    * [[publishVersion]] so the commit point can fence on
    * [[LockProvider.Handle.ensureValid]] — a lease-based lock lost to
    * a pause (new owner writing concurrently) must fail the publish
    * loudly, not swap the pointer over the new owner's work.
    * Thread-bound like the lock itself; commitTxn fences its several
    * handles explicitly before journaling instead. */
  private val heldWriteLock =
    new scala.util.DynamicVariable[Option[LockProvider.Handle]](None)

  /** THE single-table write-path preamble, expressed once: heal
    * pending txn journals before taking the lock (a crashed
    * post-journal commit is committed-by-design, and writing
    * data_v(cur+1) would overwrite its staged snapshot and consume its
    * version number), then RE-heal under the lock (a journal written
    * while we waited on the lock owns data_v(cur+1) — without the
    * re-heal, breaking a dead committer's lock would overwrite its
    * committed staged snapshot). Every single-table write path
    * (bulkLoad, incrementalMerge, compact, vacuum, upsertStaged's bulk
    * branch, publishStaged) runs through here so a future fix to the
    * heal ordering lands in one place; commitTxn holds several locks
    * at once and keeps its own explicitly-ordered sequence. */
  private def withRecoveredWriteLock[A](name: String)(f: => A): A = {
    recoverTransactions()
    withWriteLock(name) {
      healPendingForLocked(name)
      f
    }
  }

  /** Target rows per output file for the incremental-merge rewrite's
    * patch-size partition floor. ~1M PK-unique rows lands in the
    * ballpark of the 128 MB parquet file the rest of the pruning
    * design assumes (FileRange manifests, splitByKeyIntersect's
    * 800k-entry example). */
  private val mergeTargetRowsPerFile: Int = 1000000

  /** Bare acquire — for [[commitTxn]], which holds locks on SEVERAL
    * tables at once (always acquired in sorted table order, so two
    * concurrent transactions can't deadlock). Everything else uses the
    * scoped [[withWriteLock]]. */
  private def acquireWriteLock(name: String,
                               timeoutMs: Long = 600000L): LockProvider.Handle =
    lockProvider.acquire(lockResource(name), timeoutMs)

  /** File-granular incremental COW merge — the CDC-ingest path. A
    * whole-table rewrite per micro-batch would rewrite 100 TB for a
    * trickle of mutations; instead only the files whose rowkey range
    * intersects the patch are decoded, merged and rewritten, and every
    * untouched file carries over into the next snapshot as a hard link
    * (byte-identical, no data I/O — on an object store this would be a
    * manifest reference, same idea).
    *
    * File→keyrange pruning uses a per-snapshot range manifest on the
    * LEADING primary-key column (computed lazily, one key-column scan
    * per snapshot, then carried forward incrementally) — a conservative
    * superset of the touched files, exactly how parquet row-group
    * min/max pruning reasons. Patch keys are collected to the driver:
    * micro-batches are bounded by the trigger, so this is a small set
    * by construction. */
  /** Streaming-sink merge entry: ONE bounded job collects the patch's
    * distinct keys, decides emptiness (an empty patch commits NOTHING
    * — the replay-idempotence contract a foreachBatch sink needs) and
    * feeds the merge's file pruning, so the merge never re-collects
    * and the caller never runs a separate emptiness probe — two
    * Spark actions saved per micro-batch (the upsertStaged recipe,
    * exposed for sinks). Returns whether a merge was committed. */
  def incrementalMergeIfNonEmpty(name: String, patch: DataFrame,
                                 maxIncrementalKeys: Int = 100000): Boolean = {
    val keyCol = primaryKeyOf(name).head
    // BOUNDED collect (round-20 advice — mirror upsertStaged): a
    // misconfigured trigger or a backfill replay can hand a sink a
    // patch with millions of keys, and an unbounded collect would
    // blow up driver memory and merge pruning. Past the bound the
    // statement falls back to the full snapshot rewrite, exactly
    // upsertStaged's bulk branch (same final content: the merge is a
    // PK upsert either way; analytic indexes go stale under a bulk
    // write by the documented staleness rule).
    val keys = patch.select(keyCol).distinct()
      .limit(maxIncrementalKeys + 1).collect().map(r => canonKey(r.get(0)))
    if (keys.isEmpty) false
    else if (keys.length <= maxIncrementalKeys) {
      incrementalMerge(name, patch, precollectedKeys = Some(keys))
      true
    } else {
      withRecoveredWriteLock(name) {
        val next = dataVersionOf(name) + 1
        val nextDir = tableDir(name).resolve(s"data_v$next")
        val stage = newSnapshotStaging(name)
        writeData(name, table(name).upsert(patch).df, stage.toString)
        val maint = maintainIndexes(name, next, stage, pre = None, post = None)
        publishGuardingIndexAsOf(name, next, Seq(stage -> nextDir), maint)
      }
      true
    }
  }

  /** Driver-resident merge entry for PATCH-SIZED batches a sink has
    * already collected (micro-batch-bounded by the trigger contract):
    * the patch becomes a LocalRelation, so the merge's key pruning and
    * the rewrite's anti-join build side need NO re-execution of the
    * batch lineage and no extra collect — the whole per-batch commit
    * schedules only the rewrite write + range scan. Same semantics as
    * [[incrementalMerge]] on the equivalent distributed frame (the
    * rows ARE the patch); returns false for an empty batch, committing
    * nothing — the replay-idempotence contract a foreachBatch sink
    * needs. */
  def incrementalMergeRows(name: String, rows: Array[Row]): Boolean = {
    if (rows.isEmpty) return false
    val schema = schemaOf(name)
    val keyIdx = schema.fieldIndex(primaryKeyOf(name).head)
    val keys = rows.map(r => canonKey(r.get(keyIdx))).distinct
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    incrementalMerge(name, local, precollectedKeys = Some(keys))
    true
  }

  def incrementalMerge(name: String, patch: DataFrame,
                       precollectedKeys: Option[Array[Any]] = None): Unit = {
    withRecoveredWriteLock(name) {
    val pk = primaryKeyOf(name)
    val keyCol = pk.head
    val cur = dataVersionOf(name)
    val curDir = tableDir(name).resolve(s"data_v$cur")
    // z tables record the SECOND key's per-file bounds too, so the
    // driver range scan on that dimension serves from the manifest
    // instead of opening every footer cold (one extra min/max pair in
    // the same columnar scan — no additional pass)
    val tableSchema = schemaOf(name)
    val secondCol =
      if (layoutOf(name) == "zorder" && pk.size == 2 &&
          manifestPersistable(tableSchema(pk(1)).dataType))
        Some(pk(1))
      else None
    val manifest = ensureRangeManifest(curDir, keyCol,
      manifestPersistable(tableSchema(keyCol).dataType), secondCol,
      schema = Some(tableSchema))
    val patchKeys = precollectedKeys.getOrElse(
      patch.select(keyCol).distinct().collect().map(r => canonKey(r.get(0))))
    // rowkeys are non-null (HBase rowkey semantics); a null here would
    // also poison the ordered key search below
    require(!patchKeys.contains(null),
      s"primary key $keyCol may not be null in a merge batch")
    val (touched, untouched) = splitByKeyIntersect(manifest, patchKeys)
    val nextDir = tableDir(name).resolve(s"data_v${cur + 1}")
    val stage = newSnapshotStaging(name)
    val tableCols = tableSchema.fieldNames.toSeq
    val touchedDf =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tableSchema)
      else spark.read.schema(tableSchema)
        .parquet(touched.map(e => curDir.resolve(e.file).toString): _*)
    // upsert keeps new keys too: patch rows outside every file range
    // simply don't anti-join away anything
    val merged = KvTable(touchedDf, pk)
      .upsert(patch.select(tableCols.map(org.apache.spark.sql.functions.col): _*))
    // explicit partition count = touched-file count: the rewrite
    // replaces exactly those files, so sizing output files to match
    // preserves file granularity at any scale AND skips
    // repartitionByRange's sampling pass — which would execute the
    // whole upsert plan (touched-file scan + anti-join + union) a
    // second time just to pick ranges. Floor on the patch size too:
    // a patch dominated by brand-new keys touches few/no files
    // (touched ≈ 0) yet still writes every patch row, and one
    // monolithic output file would degrade granularity for every
    // later merge; distinct patch keys ≈ merged new rows (PK
    // semantics), so they stand in for the row estimate.
    val patchParts =
      ((patchKeys.length + mergeTargetRowsPerFile - 1) / mergeTargetRowsPerFile).toInt
    writeData(name, merged.df, stage.toString,
      partitions = math.max(math.max(1, touched.size), patchParts))
    val newEntries = scanRanges(stage, keyCol, secondCol,
      schema = Some(tableSchema))
    // carry untouched files into the new snapshot without touching data
    untouched.foreach(e => linkOrCopy(curDir.resolve(e.file), stage.resolve(e.file)))
    writeRangeManifest(stage, newEntries ++ untouched)
    // synchronous KV-index maintenance (reference KVIndexTable.kt:
    // every base Put deletes the stale index row and writes the new
    // one): incremental when the touched entry set is bounded, else a
    // rebuild from the complete next snapshot
    val maint = maintainIndexes(name, cur + 1, stage,
      pre = Some(touchedDf), post = Some(merged.df))
    // analytic flavors (fulltext/bitmap) stay fresh through CDC via
    // patch-sized segments + tombstones — the Lucene segment model
    // (reference index/lucene/LuceneIndexTable.kt: the Lucene writer
    // appends segments per commit; HBaseDirectory.kt persists them) —
    // never re-reading untouched corpus files
    maintainAnalyticIndexes(name, cur + 1,
      patch.select(tableCols.map(org.apache.spark.sql.functions.col): _*),
      touchedDf.join(
        patch.select(pk.map(org.apache.spark.sql.functions.col): _*).distinct(),
        pk, "left_semi"))
    publishGuardingIndexAsOf(name, cur + 1, Seq(stage -> nextDir), maint)
  }
  }

  /** Strings compare in UTF-8 BYTE order, matching how Spark computed
    * file min/max (UTF8String binary order) — java.lang.String
    * compareTo is UTF-16 code-unit order and disagrees for
    * supplementary characters, which would misclassify a file as
    * untouched and duplicate its rows. */
  private[graft] def keyCmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) =>
      val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(xb.length, yb.length)
      while (i < n) {
        val c = (xb(i) & 0xFF) - (yb(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      xb.length - yb.length
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** (touched, untouched) split of file ranges against a patch-key
    * set: the keys are sorted once and each file's [lo,hi] does ONE
    * binary search — O((F+K)·log K) driver CPU. The naive nested scan
    * is O(F×K): a 100 TB table at 128 MB/file is ~800k manifest
    * entries, and with 100k patch keys that is ~10¹¹ comparisons on
    * the driver per micro-batch. Null-bounded entries (zero-row part
    * files) are always "touched" — they contribute no rows. Keys must
    * be non-null (callers enforce). */
  private[graft] def splitByKeyIntersect(entries: Seq[FileRange],
                                         keys: Array[Any]): (Seq[FileRange], Seq[FileRange]) = {
    val sorted = keys.sortWith(keyCmp(_, _) < 0)
    // first key >= lo exists and is <= hi  ⇔  some key falls in [lo,hi]
    def hasKeyIn(lo: Any, hi: Any): Boolean = {
      var l = 0; var r = sorted.length
      while (l < r) {
        val m = (l + r) >>> 1
        if (keyCmp(sorted(m), lo) < 0) l = m + 1 else r = m
      }
      l < sorted.length && keyCmp(sorted(l), hi) <= 0
    }
    entries.partition(e => e.lo == null || e.hi == null || hasKeyIn(e.lo, e.hi))
  }

  /** Canonical comparable form: every integral → Long, every floating
    * → Double, so a JSON-round-tripped bound compares against a typed
    * patch key without a ClassCastException. Other key types (decimal,
    * timestamp) pass through — they never persist to the manifest
    * (see [[ensureRangeManifest]]), so both sides stay same-typed. */
  private def canonKey(x: Any): Any = x match {
    case null => null
    case n: java.lang.Long    => n
    case n: java.lang.Integer => java.lang.Long.valueOf(n.longValue())
    case n: java.lang.Short   => java.lang.Long.valueOf(n.longValue())
    case n: java.lang.Byte    => java.lang.Long.valueOf(n.longValue())
    case n: java.lang.Float   => java.lang.Double.valueOf(n.doubleValue())
    case other => other
  }

  /** Per-file (min,max) of the leading key column — and of the second
    * key when asked (z tables) — scanning ONLY those columns
    * (columnar read) of the given snapshot, one pass for both. The
    * SAME pass folds the per-file rowkey Bloom bitset ([[BloomBits]])
    * for long/int/string keys: rows pre-hash with Spark's xxhash64
    * and the distributive [[BloomAgg]] ORs bit positions per file —
    * no extra scan, one more agg column. */
  private def scanRanges(dir: Path, keyCol: String,
                         secondCol: Option[String] = None,
                         schema: Option[StructType] = None): Seq[FileRange] = {
    import org.apache.spark.sql.functions.{input_file_name, udaf, xxhash64, min => fmin, max => fmax}
    val fcol = org.apache.spark.sql.functions.col _
    // callers that know the files' schema (table meta, a just-written
    // index layout) pass it: schema inference re-reads every footer,
    // and the merge path runs this once per micro-batch
    val df0 = schema.map(spark.read.schema(_)).getOrElse(spark.read)
      .parquet(dir.toString)
    val bloomable = df0.schema.fields.find(_.name == keyCol)
      .map(_.dataType).exists {
        case LongType | IntegerType | StringType => true
        case _ => false
      }
    // bloom sizing (see BloomBits' scaladoc): build every file's
    // filter at the power-of-two cap in the ONE aggregation pass; the
    // aggregator's finish folds it down to the file's own row count ×
    // bits-per-key EXECUTOR-SIDE, so the agg output and the collect
    // carry only the small folded filter — per-key sizing keeps the
    // false-positive rate scale-invariant where a flat constant is
    // all-pass at the 1M-row design point. The legacy flat knob, when
    // set, disables per-key sizing (no fold).
    val flatBits = spark.conf.getOption("spark.graft.manifest.bloomBits")
      .map(_.toInt)
    val bitsPerKey = spark.conf
      .getOption("spark.graft.manifest.bloomBitsPerKey")
      .map(_.toInt).getOrElse(10)
    val maxBits = flatBits.getOrElse {
      val m = spark.conf.getOption("spark.graft.manifest.bloomMaxBits")
        .map(_.toInt).getOrElse(1 << 23)
      require(m >= 1024 && Integer.bitCount(m) == 1,
        s"spark.graft.manifest.bloomMaxBits must be a power of two >= 1024: $m")
      m
    }
    val foldBpk = if (flatBits.isDefined) None else Some(bitsPerKey)
    val keyCols = fcol(keyCol).as("k") +: secondCol.map(c => fcol(c).as("k2")).toSeq
    val hashCols = if (bloomable) Seq(xxhash64(fcol(keyCol)).as("kh")) else Nil
    val aggs = Seq(fmin("k").as("lo"), fmax("k").as("hi")) ++
      secondCol.toSeq.flatMap(_ => Seq(fmin("k2").as("lo2"), fmax("k2").as("hi2"))) ++
      (if (bloomable)
        Seq(udaf(new BloomAgg(maxBits, foldBpk),
          org.apache.spark.sql.Encoders.scalaLong)(fcol("kh")).as("kbloom"))
      else Nil)
    df0.select(keyCols ++ hashCols :+ input_file_name().as("f"): _*)
      .groupBy("f").agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        val fname = r.getString(0).split("/").last
        val second = secondCol.map(_ =>
          (canonKey(r.getAs[Any]("lo2")), canonKey(r.getAs[Any]("hi2"))))
        val bloom =
          if (!bloomable) None
          else Option(r.getAs[Array[Byte]]("kbloom"))
        FileRange(fname, canonKey(r.getAs[Any]("lo")),
          canonKey(r.getAs[Any]("hi")), second, bloom)
      }
  }

  private def manifestFile(dir: Path): Path = dir.resolve("_graft_ranges.json")

  /** JSON-persistable key types: the manifest survives restarts for
    * these; anything else recomputes per merge (correct, one extra
    * key-column scan). */
  private def manifestPersistable(dt: DataType): Boolean =
    dt match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | StringType => true
      case _ => false
    }

  /** Parse a snapshot's persisted range manifest, if present. Bounds
    * come back canonicalized (Long/Double/String) like canonKey's
    * output. Shared by the merge path and the driver-side get — pure
    * JSON, no Spark.
    *
    * A corrupt manifest reads as ABSENT, never as an error: the file
    * is bookkeeping written without an atomic rename, so a crash (or
    * a lock-free reader racing the writer) can observe a truncated
    * byte stream — both consumers fall back to re-deriving ranges
    * (scanRanges here, footer statistics on the driver-get path) and
    * the next merge rewrites the file. Failing instead would wedge
    * every subsequent merge of the table on a scrap of bookkeeping. */
  private def readManifestJson(dir: Path): Option[Seq[FileRange]] =
    try {
      if (!Files.exists(manifestFile(dir))) None
      else ManifestCache.cached(manifestFile(dir)) {
        parseManifestJson(manifestFile(dir))
      }
    } catch {
      // the file can vanish between the existence check and the
      // cache's size/mtime stat (vacuumed snapshot) — absent, not fatal
      case _: java.io.IOException => None
    }

  private def parseManifestJson(f: Path): Option[Seq[FileRange]] =
    try {
      val root = mapper.readTree(Files.readString(f))
      if (root == null || !root.isArray) return None
      // sidecar-referenced bitsets load once per referenced sidecar
      // (content-addressed beside the manifest); a missing/corrupt
      // sidecar degrades the blooms to ABSENT, never the bounds
      val sidecars = scala.collection.mutable.Map[String,
        Option[Map[String, Array[Byte]]]]()
      Some(root.elements().asScala.map { e =>
        def v(n: JsonNode): Any =
          if (n.isNull) null
          else if (n.isIntegralNumber) java.lang.Long.valueOf(n.asLong())
          else if (n.isFloatingPointNumber) java.lang.Double.valueOf(n.asDouble())
          else n.asText()
        val second =
          if (e.has("lo2")) Some((v(e.path("lo2")), v(e.path("hi2"))))
          else None
        val fname = e.path("file").asText()
        // a bloom that fails to decode reads as ABSENT (no veto) —
        // the same fail-open stance as the whole manifest
        val bloom =
          if (e.has("bloomref")) {
            val ref = e.path("bloomref").asText()
            // reject path separators: the ref is a sibling file name,
            // never a path
            if (ref.contains('/') || ref.contains('\\')) None
            else sidecars.getOrElseUpdate(ref,
              readBloomSidecar(f.getParent.resolve(ref))).flatMap(_.get(fname))
          } else if (e.has("bloom"))
            scala.util.Try(
              java.util.Base64.getDecoder.decode(e.path("bloom").asText()))
              .toOption.filter(_.nonEmpty)
          else None
        FileRange(fname, v(e.path("lo")), v(e.path("hi")),
          second, bloom)
      }.toSeq)
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => None
      case _: java.io.IOException => None
    }

  private def ensureRangeManifest(dir: Path, keyCol: String,
                                  persistable: Boolean,
                                  secondCol: Option[String] = None,
                                  schema: Option[StructType] = None): Seq[FileRange] = {
    if (!persistable) return scanRanges(dir, keyCol, secondCol, schema)
    val cached: Option[Seq[FileRange]] = readManifestJson(dir)
    // a manifest is only trustworthy if it covers exactly the part
    // files present: SQL INSERT INTO appends files into the live
    // snapshot after the manifest was written, and pruning against a
    // stale manifest would silently DROP those files from the next
    // snapshot
    val present = withList(dir) { it =>
      it.map(_.getFileName.toString).filter(_.startsWith("part-")).toSet
    }
    cached match {
      case Some(entries) if entries.map(_.file).toSet == present &&
          // a z table needs SECOND-key bounds on every data-bearing
          // entry; a manifest from before the upgrade rescans once
          (secondCol.isEmpty ||
            entries.forall(e => e.second.isDefined || e.lo == null)) =>
        entries
      case _ =>
        val scanned = scanRanges(dir, keyCol, secondCol, schema)
        // zero-row part files yield no agg group; record them with null
        // bounds (always "touched", contribute nothing) so the manifest
        // still covers exactly the present files
        val entries = scanned ++
          (present -- scanned.map(_.file).toSet).toSeq.sorted
            .map(f => FileRange(f, null, null))
        writeRangeManifest(dir, entries)
        entries
    }
  }

  private def writeRangeManifest(dir: Path, entries: Seq[FileRange]): Unit = {
    // sidecar graduation (HFile's bloom blocks — see BloomBits'
    // scaladoc): past the threshold of total filter bytes the bitsets
    // spill to a CONTENT-ADDRESSED binary sidecar the manifest
    // references by exact name — the JSON stays small for range-scan
    // readers that never probe blooms, and the atomic manifest rename
    // always pairs with the sidecar it was written against (the
    // sidecar lands BEFORE the manifest move publishes its name)
    val bloomBytes = entries.iterator.flatMap(_.bloom)
      .map(_.length.toLong).sum
    val threshold = spark.conf
      .getOption("spark.graft.manifest.bloomSidecarBytes")
      .map(_.toLong).getOrElse(256L * 1024)
    val sidecar: Option[String] =
      if (bloomBytes > threshold) Some(writeBloomSidecar(dir, entries))
      else None
    val arr = mapper.createArrayNode()
    entries.foreach { e =>
      val n = mapper.createObjectNode()
      n.put("file", e.file)
      n.set[JsonNode]("lo", mapper.valueToTree[JsonNode](e.lo))
      n.set[JsonNode]("hi", mapper.valueToTree[JsonNode](e.hi))
      e.second.foreach { case (lo2, hi2) =>
        n.set[JsonNode]("lo2", mapper.valueToTree[JsonNode](lo2))
        n.set[JsonNode]("hi2", mapper.valueToTree[JsonNode](hi2)): Unit
      }
      e.bloom.foreach { b =>
        sidecar match {
          case Some(name) => n.put("bloomref", name): Unit
          case None =>
            n.put("bloom", java.util.Base64.getEncoder.encodeToString(b)): Unit
        }
      }
      arr.add(n): Unit
    }
    // atomic publish: lock-free readers (the driver-get path) may
    // observe the manifest mid-write; a rename makes every read see
    // either the old complete file or the new one, never a prefix
    val tmp = dir.resolve("_graft_ranges.json.tmp")
    Files.writeString(tmp, mapper.writeValueAsString(arr))
    Files.move(tmp, manifestFile(dir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    // the rewrite is a new content even when size+mtime tie on a
    // coarse-clock filesystem — drop any cached parse of this path
    ManifestCache.invalidate(manifestFile(dir))
    // reap superseded sidecars only AFTER the manifest stopped
    // referencing them; a racing lock-free reader of the OLD manifest
    // degrades fail-open (bloom → None, the standing stance)
    withList(dir) { it =>
      it.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("_graft_blooms_") && !sidecar.contains(n)
      }.toList
    }.foreach(p => scala.util.Try(Files.deleteIfExists(p)): Unit)
  }

  /** Serialize the per-file bitsets to `_graft_blooms_<crc32>.bin`
    * (magic + count + [nameLen name bitsLen bits]*), written via tmp +
    * atomic move; returns the content-addressed file name. */
  private def writeBloomSidecar(dir: Path, entries: Seq[FileRange]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x4746424c) // "GFBL"
    val withBloom = entries.filter(_.bloom.isDefined)
    out.writeInt(withBloom.size)
    withBloom.foreach { e =>
      val nb = e.file.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeShort(nb.length)
      out.write(nb)
      val bits = e.bloom.get
      out.writeInt(bits.length)
      out.write(bits)
    }
    out.flush()
    val payload = bos.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val name = f"_graft_blooms_${crc.getValue}%08x.bin"
    val tmp = dir.resolve(s"$name.tmp")
    Files.write(tmp, payload)
    Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    name
  }

  /** Parse a bloom sidecar → file name → bitset. Any structural
    * problem reads as ABSENT (fail-open, like the manifest itself). */
  private def readBloomSidecar(f: Path): Option[Map[String, Array[Byte]]] =
    try {
      if (!Files.exists(f)) return None
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(Files.readAllBytes(f)))
      if (in.readInt() != 0x4746424c) return None
      val n = in.readInt()
      require(n >= 0 && n <= 10000000)
      val out = Map.newBuilder[String, Array[Byte]]
      var i = 0
      while (i < n) {
        val nameLen = in.readUnsignedShort()
        val nb = new Array[Byte](nameLen)
        in.readFully(nb)
        val bitsLen = in.readInt()
        require(bitsLen >= 0)
        val bits = new Array[Byte](bitsLen)
        in.readFully(bits)
        out += new String(nb, java.nio.charset.StandardCharsets.UTF_8) -> bits
        i += 1
      }
      Some(out.result())
    } catch {
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }

  /** Compaction — the HBase minor/major-compaction analog (HBase
    * compacts a region's accumulated HFiles into fewer larger ones;
    * the reference rides on that server-side). File-granular CDC
    * merges and SQL append batches leave a residue of small part
    * files, and at scale the small-file problem dominates scan setup.
    * Every file below `targetFileBytes` is read once and rewritten as
    * ~target-sized rowkey-sorted files; files already at/above target
    * carry into the next COW snapshot as hard links (no data I/O).
    * Row set and per-file sort order are unchanged — only layout.
    * No-op when fewer than two small files exist. */
  def compact(name: String, targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    withRecoveredWriteLock(name) {
      val cur = dataVersionOf(name)
      val curDir = tableDir(name).resolve(s"data_v$cur")
      val files = withList(curDir) { it =>
        it.filter(_.getFileName.toString.startsWith("part-")).toList
      }
      val (big, small) = files.partition(f => Files.size(f) >= targetFileBytes)
      if (small.size > 1) {
        val nextDir = tableDir(name).resolve(s"data_v${cur + 1}")
        val stage = newSnapshotStaging(name)
        val totalBytes = small.map(Files.size(_)).sum
        val parts = math.max(1,
          math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
        writeData(name,
          spark.read.schema(schemaOf(name)).parquet(small.map(_.toString): _*),
          stage.toString, parts)
        big.foreach(src => linkOrCopy(src, stage.resolve(src.getFileName.toString)))
        // compaction changes layout, not content: every index that was
        // fresh at cur stays valid — carry its as-of forward. An index
        // data_v(cur+1) dir left by a CRASHED earlier writer (which
        // never published cur+1) is orphan garbage holding
        // never-committed content; publishing cur+1 here without
        // clearing it would make resolveIndexVersioned serve it —
        // delete orphans before the pointer bump
        // fence BEFORE deleting "orphans": a lapsed compactor's
        // cur+1 may be the new owner's PUBLISHED version, and these
        // would be its live index artifacts (the
        // maintainAnalyticIndexes preamble reasoning)
        heldWriteLock.value.foreach { h => h.ensureValid(); h.fencedPublish(): Unit }
        indexesOf(name).foreach { case (iname, ty, _) =>
          // every flavor of version-(cur+1) index dir is suspect: base
          // snapshots (kv rebuilds) AND segment/tombstone/delta dirs a
          // crashed incrementalMerge appended for a bump that never came
          IndexDirPrefixes.foreach { p =>
              val orphan = indexDir(name, iname, ty).resolve(s"$p${cur + 1}")
              if (Files.exists(orphan)) deleteRecursively(orphan)
            }
          if (indexStatus(name, iname, ty) == "FRESH")
            setIndexAsOf(name, iname, ty, cur + 1)
        }
        publishVersion(name, cur + 1, staged = Seq(stage -> nextDir))
      }
    }
  }

  /** Drop dead snapshots and any staging directories orphaned by
    * aborted writers. Readers are lock-free and pin a version at load
    * time (GraftSqlTable), so nothing non-live is reclaimed until it
    * has been dead for `graceMs` — a statement pinned just before a
    * concurrent publish keeps its snapshot files for the whole grace
    * window (the same reasoning covers in-flight staging dirs: an
    * active writer keeps touching its dir as tasks commit files).
    * `graceMs = 0` reclaims immediately (tests, offline maintenance). */
  def vacuum(name: String, graceMs: Long = 3600000L): Unit = {
    // Heal pending transaction journals FIRST: a commit that crashed
    // after its intent journal leaves staged data_v(next) dirs that are
    // not yet live — rolling them forward makes them live; skipping
    // this would let the sweep below reclaim dirs a journal still
    // needs, turning a recoverable transaction into a partial one
    // (withRecoveredWriteLock's recover step does exactly that).
    withRecoveredWriteLock(name) {
    val liveV = dataVersionOf(name) // one meta read for the whole sweep
    val live = s"data_v$liveV"
    val now = System.currentTimeMillis()
    def idle(p: Path): Boolean =
      now - Files.getLastModifiedTime(p).toMillis >= graceMs
    withList(tableDir(name)) { it =>
      it.filter { p =>
        val n = p.getFileName.toString
        ((n.startsWith("data_v") && n != live) || n.startsWith(".staging_") ||
          n.startsWith(".meta_tmp_")) &&
          idle(p)
      }.toList
    }.foreach(deleteRecursively)
    // prune publishTimes entries whose snapshot dir is gone — with CDC
    // merges every few seconds the map would otherwise grow one entry
    // per version forever, and the meta JSON is re-read per statement
    val meta = readMeta(name)
    meta.get("publishTimes") match {
      case times: ObjectNode =>
        val dead = times.fieldNames().asScala.filter { v =>
          v != liveV.toString &&
            !Files.exists(tableDir(name).resolve(s"data_v$v"))
        }.toList
        if (dead.nonEmpty) { dead.foreach(times.remove); writeMeta(name, meta) }
      case _ => ()
    }
    // index snapshots: keep each index's LIVE version (resolved
    // against the published table pointer — an orphan data_v(next)
    // from a crashed maintenance job is garbage, not the keeper), its
    // dictionary counterpart, and any incremental segments/tombstones
    // still contributing to the live view; everything else ages out
    // under the same grace window
    indexesOf(name).foreach { case (iname, ty, _) =>
      val dir = indexDir(name, iname, ty)
      if (Files.exists(dir)) {
        val baseData = resolveIndexDataDir(dir, name)
        val baseVer = indexBaseVersion(baseData)
        val keep = Set(baseData.getFileName.toString,
          resolveIndexVersioned(dir, "dict", liveV).getFileName.toString,
          // the fuzzy sidecar folds with the dict stack — keep the one
          // the live version resolves (deltas above it still apply)
          resolveIndexVersioned(dir, "fz", liveV).getFileName.toString,
          // vector artifacts pair at the DATA base's version
          // (vectorArtifacts), so retention keys off baseVer, not liveV
          resolveIndexVersioned(dir, "cent", baseVer).getFileName.toString,
          resolveIndexVersioned(dir, "vmeta", baseVer).getFileName.toString,
          // positional postings are written by the same backfill/fold
          // as the postings base — pair at the data base's version
          resolveIndexVersioned(dir, "pos", baseVer).getFileName.toString,
          // the navigable graph folds forward with the data base
          // (foldIndexStack's graph-era branch) — pair at baseVer
          resolveIndexVersioned(dir, "graph", baseVer).getFileName.toString,
          // the ranked-serving pair (norms + block stats) is written
          // by the same backfill/fold as the postings — pair at baseVer
          resolveIndexVersioned(dir, "norms", baseVer).getFileName.toString,
          resolveIndexVersioned(dir, "bmx", baseVer).getFileName.toString)
        withList(dir) { it =>
          it.filter { p =>
            val n = p.getFileName.toString
            val liveSegment = segmentVersion(n).exists(v =>
              v > baseVer && v <= liveV)
            (n.startsWith("data") || n.startsWith("dict") ||
              n.startsWith("cent") || n.startsWith("vmeta") ||
              n.startsWith("pos") || n.startsWith("graph") ||
              n.startsWith("norm") || n.startsWith("bmx") ||
              n.startsWith("fz") ||
              n.startsWith("seg_v") || n.startsWith("tomb_v") ||
              n.startsWith("dictdelta_v") ||
              // fold/refresh staging dirs stranded by a crash mid-build
              n.startsWith(".staging_")) &&
              !keep.contains(n) && !liveSegment && idle(p)
          }.toList
        }.foreach(deleteRecursively)
      }
    }
    }
  }

  /** Stage-then-rename writer for index artifact dirs at versions ≤
    * the published table pointer: lock-free readers resolve those
    * IMMEDIATELY, so a direct write would expose a half-written dir
    * (`_temporary` only, or partial files) mid-job. The build lands in
    * a `.staging_` dir and renames into place atomically; when the
    * destination already exists (same-version rebuild) it is moved
    * aside first — a reader hitting the instant between the two
    * renames resolves an older base (stale but consistent), never
    * partial bytes. Stranded staging dirs age out under vacuum. */
  private def writeIndexDirAtomic(dir: Path, finalName: String)
                                 (write: String => Unit): Unit = {
    def fresh(prefix: String) = dir.resolve(
      s".staging_$prefix${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val tmp = fresh("")
    write(tmp.toString)
    val dst = dir.resolve(finalName)
    if (!Files.exists(dst))
      Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else {
      val aside = fresh("old_")
      Files.move(dst, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(aside)
    }
  }

  /** Carry a file into a new snapshot dir without touching data: hard
    * link where the FS supports it, copy otherwise. ONE implementation
    * — the table-merge, compaction and index-merge carry paths must
    * never diverge (an object-store backend would swap this for
    * manifest references in one place). */
  private def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src): Unit
    catch { case _: UnsupportedOperationException | _: java.io.IOException =>
      Files.copy(src, dst): Unit }

  /** Carry a whole (flat) index-artifact dir forward by per-file
    * [[linkOrCopy]] — the graph-era fold's cent/vmeta carry, where
    * the bytes are version-identical and only the name advances. */
  private def copyArtifactDir(src: Path, dstRoot: String): Unit = {
    val dst = Paths.get(dstRoot)
    Files.createDirectories(dst)
    withList(src)(_.toList).foreach { f =>
      if (!Files.isDirectory(f))
        linkOrCopy(f, dst.resolve(f.getFileName.toString))
    }
  }

  /** The segment-maintenance dir prefixes, and the full set of
    * versioned index-artifact prefixes (base + dictionary + segments).
    * Single source of truth: compact's orphan cleanup, vacuum's sweep
    * and segmentVersion all reason over the same families — a new
    * artifact flavor added here is covered everywhere at once. */
  private final val SegmentDirPrefixes =
    Seq("seg_v", "tomb_v", "dictdelta_v", "posseg_v", "normseg_v")
  private final val IndexDirPrefixes =
    Seq("data_v", "dict_v", "pos_v", "cent_v", "vmeta_v", "graph_v",
      "norms_v", "bmx_v", "fz_v") ++ SegmentDirPrefixes

  /** Version carried by a segment/tombstone/dict-delta dir name, if any. */
  private def segmentVersion(dirName: String): Option[Int] =
    SegmentDirPrefixes.collectFirst {
      case p if dirName.startsWith(p) =>
        scala.util.Try(dirName.stripPrefix(p).toInt).toOption
    }.flatten

  /** Version a resolved base index dir was built at (`data` backfill
    * dirs predate versioning and count as version of the backfill —
    * every segment applies on top of them). */
  /** The version of a `<prefix>_v<n>` artifact dir name, −1 for the
    * unversioned creation artifact (plain `<prefix>`) or anything
    * unparsable. ONE parser for every artifact family (data bases,
    * the fz fuzzy sidecar, …): the fold logic keys patch application
    * on these numbers, and two hand-rolled parsers only have to
    * drift once for a fold to silently re-apply or skip a delta. */
  private def versionOf(prefix: String, dirName: String): Int =
    if (dirName.startsWith(s"${prefix}_v"))
      scala.util.Try(dirName.stripPrefix(s"${prefix}_v").toInt).getOrElse(-1)
    else -1

  private def indexBaseVersion(baseData: Path): Int =
    versionOf("data", baseData.getFileName.toString)

  /** Versioned dirs `<prefix><v>` with loExcl < v <= hiIncl, ascending
    * — the segments/tombstones/deltas contributing to a base built at
    * loExcl, bounded by the PUBLISHED table version (a segment written
    * mid-merge is invisible until the pointer bump, same crash-safety
    * rule as resolveIndexVersioned). */
  private def versionedDirs(dir: Path, prefix: String,
                            loExcl: Int, hiIncl: Int): Seq[(Int, Path)] =
    if (!Files.exists(dir)) Nil
    else withList(dir) { it =>
      it.flatMap { p =>
        val n = p.getFileName.toString
        if (!n.startsWith(prefix)) None
        else scala.util.Try(n.stripPrefix(prefix).toInt).toOption
          .filter(v => v > loExcl && v <= hiIncl).map(v => (v, p))
      }.toList
    }.sortBy(_._1)

  // ------------------------------------------------------------------
  // Segment + tombstone incremental maintenance for analytic indexes
  // (fulltext, bitmap) — the Lucene segment model, Spark-first:
  // every incrementalMerge appends a PATCH-SIZED postings/bitmap
  // segment (seg_vN), a rowkey tombstone set (tomb_vN) and, for
  // fulltext, a document-frequency delta (dictdelta_vN). The read
  // path unions base + live segments and masks any posting whose doc
  // was tombstoned at a LATER version (a doc re-added after its
  // tombstone lives in a later segment, which the tombstone doesn't
  // touch). compactIndex folds the stack back into a single base.
  // At 100 TB a one-file CDC merge thus costs index I/O proportional
  // to the patch, never a corpus-sized rebuild.
  // ------------------------------------------------------------------

  /** Append analytic-index segments for a bounded merge patch.
    * `patchRows` is the post-image of the patched keys (upsert
    * semantics: the patch row IS the new row); `preRows` the
    * pre-image of those keys from the touched files (already being
    * read by the merge — no extra corpus I/O). */
  private def maintainAnalyticIndexes(name: String, next: Int,
                                      patchRows: DataFrame,
                                      preRows: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val analytic = indexesOf(name).filter(i =>
      i._2.equalsIgnoreCase("fulltext") || i._2.equalsIgnoreCase("bitmap") ||
        i._2.equalsIgnoreCase("vector"))
    if (analytic.isEmpty) return
    val rk = primaryKeyOf(name).head
    // crashed-attempt healing: a prior merge toward this SAME `next`
    // may have appended its segments and bumped as-of, then died
    // before the table pointer bump. Those artifacts describe a patch
    // that never published — without this reset the freshness gate
    // below would skip maintenance for THIS attempt's (different)
    // patch and the publish would serve the dead attempt's segments
    // as FRESH. Drop the orphan dirs and restore as-of so the gate
    // sees the truth. (as-of == next implies it was next-1 before the
    // dead attempt: stale indexes are excluded by the gate and never
    // bumped.)
    // fence BEFORE the healing deletes below, not only before this
    // attempt's own renames: the preamble's "version `next` is
    // unpublished" premise is exactly what a LAPSED holder gets wrong
    // — a new owner may have published `next` (live segments, asOf
    // bumped) while we were paused, and deleting "orphans" here would
    // destroy its LIVE index artifacts and un-fresh its registry
    // entry. The authority compare rejects a superseded grant the
    // moment a newer one exists, so only the rightful holder reaches
    // the deletes. (No-op for token-less providers, whose locks
    // cannot lapse — the premise holds there unconditionally.)
    heldWriteLock.value.foreach { h => h.ensureValid(); h.fencedPublish(): Unit }
    analytic.foreach { case (iname, ty, _) =>
      // delete version-`next` artifacts UNCONDITIONALLY, not only when
      // the dead attempt reached its as-of bump: an attempt that died
      // between an auto-fold's data_v(next) rename and setIndexAsOf
      // leaves orphans with as-of still at next-1, and a retry that
      // kept them would resolve the dead fold's base as its own.
      // Safe under the fence above — THIS attempt has written nothing
      // yet, and `next` is provably unpublished for a current grant.
      IndexDirPrefixes.foreach { p =>
        val orphan = indexDir(name, iname, ty).resolve(s"$p$next")
        if (Files.exists(orphan)) deleteRecursively(orphan)
      }
      if (indexAsOfVersion(name, iname, ty) == next)
        setIndexAsOf(name, iname, ty, next - 1)
    }
    // a segment only extends an index that was CURRENT before this
    // merge: an index already stale (it missed a bulk write, which
    // has no bounded patch) must stay stale at its old as-of —
    // appending this patch and freshening would silently hide the
    // missed content until someone noticed wrong search results
    analytic.filter { case (iname, ty, _) =>
      indexAsOfVersion(name, iname, ty) == next - 1
    }.foreach { case (iname, ty, cols) =>
      val dir = indexDir(name, iname, ty)
      // segment appends get the SAME grant-scoped stage→fence→rename
      // protocol as the table snapshot: the heavy artifact writes land
      // under a unique staging root, and the version-numbered names
      // materialize only after the fence below passes — a holder
      // lapsing mid-append can never cross-write the new owner's
      // segment dirs. (Renamed HERE, not at publishVersion: the
      // auto-fold a few lines down must see this batch's segments at
      // their final names to fold them.)
      val segStage = dir.resolve(".staging_seg" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      Files.createDirectories(segStage)
      val c = cols.head
      ty.toUpperCase match {
        case "FULLTEXT" =>
          // one tokenize pass over the patch: positions are the source
          // of truth, the postings segment derives from them. The
          // positional segment rides beside the postings segment; the
          // shared tombstones mask both families' older rows. The
          // segment MUST use the index's own analyzer or it would mix
          // stemmed and unstemmed terms into one view.
          val an = indexAnalyzer(name, iname)
          val ts = schemaOf(name)
          val rkType = ts(rk).dataType
          // bounded patches (the CDC contract — unbounded writes take
          // the bulk path) build all four artifacts ON THE DRIVER with
          // the same static kernels the Spark expressions call
          // (DriverSegment — the reference's synchronous per-Put
          // maintenance shape): four tiny Spark write actions would
          // cost ~10 scheduler round-trips for microseconds of CPU.
          val maxDriver = spark.conf
            .getOption("spark.graft.index.driverSegmentMaxRows")
            .map(_.toInt).getOrElse(10000)
          val probe: Array[Row] =
            if (DriverSegment.supports(rkType, ts(c).dataType))
              patchRows.select(col(rk), col(c)).limit(maxDriver + 1).collect()
            else Array.empty
          if (probe.nonEmpty && probe.length <= maxDriver) {
            val pre = preRows.select(col(rk), col(c)).collect()
            DriverSegment.writeFulltext(segStage, next, probe, pre, an, rkType)
          } else {
          val segPos =
            graft.index.FullText.buildPositional(patchRows, rk, c, an).cache()
          val segPost = graft.index.FullText.postingsFromPositional(segPos)
          try {
            // patch-sized frames, ONE sorted file per segment (the
            // Lucene segment shape): an explicit single partition
            // skips repartitionByRange's range-sampling job per write
            KvLayout.writeSorted(segPos, Seq("term"),
              segStage.resolve(s"posseg_v$next").toString, partitions = 1)
            KvLayout.writeSorted(segPost, Seq("term"),
              segStage.resolve(s"seg_v$next").toString, partitions = 1)
            // norms delta: token count per patched doc (+ scalar meta)
            // — the ranked serving path's per-artifact dl source
            locally {
              val segDl = graft.index.FullText.buildDocLens(segPost)
              val p = segStage.resolve(s"normseg_v$next")
              KvLayout.writeSorted(segDl, Seq("doc_id"), p.toString,
                partitions = 1)
              writeNormMeta(p, segDl)
            }
            patchRows.select(col(rk).as("rk")).distinct().coalesce(1)
              .write.mode("overwrite").parquet(segStage.resolve(s"tomb_v$next").toString)
            // df delta: +1 per term newly in a patched doc, -1 per term
            // that was in its pre-image — the dictionary view folds
            // these without re-counting the corpus
            val add = graft.index.FullText.buildDictionary(segPost)
              .select(col("term"), col("df").cast("long").as("ddf"))
            val remove = graft.index.FullText.buildDictionary(
                graft.index.FullText.buildPostings(preRows, rk, c, an))
              .select(col("term"), (-col("df")).cast("long").as("ddf"))
            add.unionByName(remove).groupBy("term").agg(sum("ddf").as("ddf"))
              .filter(col("ddf") =!= 0L).coalesce(1)
              .write.mode("overwrite").parquet(segStage.resolve(s"dictdelta_v$next").toString)
          } finally { segPos.unpersist(); () }
          }
        case "BITMAP" =>
          graft.index.BitmapIndex.build(patchRows, rk, c)
            .write.mode("overwrite").parquet(segStage.resolve(s"seg_v$next").toString)
          // one tombstone bitmap per id-shard: clears the patched rows'
          // bits from EVERY value's older bitmaps (their old value is
          // whatever it was; the new value's bits live in this segment)
          val agg = udaf(new graft.index.BitmapAgg(),
            org.apache.spark.sql.Encoders.scalaLong)
          patchRows.select(col(rk).cast("long").as("__rk"))
            .groupBy(shiftrightunsigned(col("__rk"),
              graft.index.BitmapIndex.ShardBits).as("shard"))
            .agg(agg(col("__rk")).as("bm"))
            .write.mode("overwrite").parquet(segStage.resolve(s"tomb_v$next").toString)
        case "VECTOR" =>
          // patch vectors assign to the nearest EXISTING centroid and
          // encode against the EXISTING codebooks (cheap write-path
          // maintenance; compact_index re-trains) — cost ∝ patch ×
          // (|centroids| + m·k), never a corpus re-fit
          val (cent, vmeta) = vectorArtifacts(dir, next)
          // one file per patch segment, same bounded-patch reasoning
          // as the fulltext branch
          KvLayout.writeSorted(
            graft.similarity.VectorIndex.encodeEntries(
              patchRows, rk, c, cent, vmeta),
            Seq("cluster"), segStage.resolve(s"seg_v$next").toString,
            partitions = 1)
          patchRows.select(col(rk).as("rk")).distinct().coalesce(1)
            .write.mode("overwrite").parquet(segStage.resolve(s"tomb_v$next").toString)
        case _ => ()
      }
      // post-write fence + rename: prove the grant is still ours (and
      // still the CURRENT one at the authority) before the staged
      // segment dirs take their version-numbered names — the same
      // microsecond fence→rename residual class as publishVersion's.
      // A lapsed holder throws here with its bytes still quarantined
      // in the staging root (vacuum's `.staging_` sweep reclaims).
      // A dst that exists is a crashed attempt's orphan the healing
      // preamble above missed only if it appeared mid-merge — ours to
      // replace either way (version `next` is unpublished).
      heldWriteLock.value.foreach { h => h.ensureValid(); h.fencedPublish(): Unit }
      withList(segStage)(_.toList).foreach { child =>
        val dst = dir.resolve(child.getFileName.toString)
        if (Files.exists(dst)) deleteRecursively(dst)
        Files.move(child, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      }
      deleteRecursively(segStage)
      // tiered-merge analog (Lucene merges segments automatically):
      // past `autoFold` live segments the stack folds into a fresh
      // base right here, still under the table write lock — read
      // amplification stays bounded at any CDC cadence without an
      // operator having to CALL compact_index. Cost ∝ index frames,
      // amortized over autoFold merges.
      val autoFold = spark.conf.getOption("spark.graft.index.autoFoldSegments")
        .map(_.toInt).getOrElse(8)
      val baseNow = resolveIndexVersioned(dir, "data", next)
      if (versionedDirs(dir, "seg_v", indexBaseVersion(baseNow), next)
            .size >= autoFold)
        foldIndexStack(name, iname, ty, next): Unit
      setIndexAsOf(name, iname, ty, next)
    }
  }

  /** Fold an index's segment stack into a single base
    * (`CALL system.compact_index`) — reads ONLY index frames
    * (base + segments), never the corpus, unlike refreshIndex's full
    * rebuild. The fold targets the index's AS-OF version, not the
    * table's live version: a stack gone stale under a later bulk
    * write folds to a base carrying its as-of content and STAYS
    * stale — folding it to the live version would relabel old
    * content as fresh. After the fold, vacuum reclaims the dead
    * segments. */
  def compactIndex(table: String, indexName: String, indexType: String): Unit =
    withWriteLock(table) {
      val asOf = indexAsOfVersion(table, indexName, indexType)
      // under the write lock asOf <= live always; the min is belt and
      // braces against a hand-edited registry
      val upTo = math.min(asOf, dataVersionOf(table))
      foldIndexStack(table, indexName, indexType, upTo): Unit
      // asOf unchanged: the fold moves bytes, not content version
    }

  private def indexAsOfVersion(table: String, indexName: String,
                               indexType: String): Int =
    readMeta(table).withArray[ArrayNode]("indexes").elements().asScala
      .find(e => e.path("name").asText() == indexName &&
        e.path("type").asText().equalsIgnoreCase(indexType))
      .map(_.path("asOfVersion").asInt(-1)).getOrElse(
        throw new IllegalArgumentException(
          s"$table $indexName $indexType not registered"))

  /** The fold body, callable under an already-held write lock with an
    * explicit version bound (`upTo` may be the version being
    * published, which the table pointer hasn't reached yet). Folds
    * the segmented view into data_v(upTo) (+ dict/pos for fulltext,
    * cent/vmeta for vector) through the SAME grant-scoped
    * stage→fence→rename protocol as every other write path: the
    * heavy artifact writes land under one `.staging_fold` root, the
    * version-numbered names materialize only after the commit-point
    * fence passes, and the RENAME ORDER preserves the crash contract
    * the direct writes used to carry — dict and pos (and cent/vmeta)
    * land strictly BEFORE data, because the folded DATA base is the
    * effective publish point: vacuum's segment/delta retention keys
    * off the resolved data base version and readers pair the sibling
    * artifacts at it, so a crash (or fence loss) between any two
    * renames leaves the OLD data base live with a consistent old
    * view and every delta/posseg it needs still retained, while the
    * already-renamed siblings are orphans the next fold's healing
    * preamble deletes. IndexSpec pins the mid-fold-crash state.
    * Returns false when there is no stack to fold. */
  private def foldIndexStack(table: String, indexName: String,
                             indexType: String, upTo: Int): Boolean = {
    val dir = indexDir(table, indexName, indexType)
    val base = resolveIndexVersioned(dir, "data", upTo)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, upTo)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, upTo)
    if (segs.isEmpty && tombs.isEmpty) return false
    // fence BEFORE the healing deletes below (the maintainAnalytic-
    // Indexes preamble rule): their "these artifacts are orphans"
    // premise is only provable for the CURRENT grant
    heldWriteLock.value.foreach { h => h.ensureValid(); h.fencedPublish(): Unit }
    // grant-scoped staging root for the WHOLE fold; `.staging_` keeps
    // a crashed attempt inside vacuum's sweep
    val foldStage = dir.resolve(".staging_fold" +
      heldWriteLock.value.map(_.fencingToken).getOrElse(0L) + "_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    // final names in REQUIRED rename order (appended as staged)
    val renames = scala.collection.mutable.ListBuffer[String]()
    def stageArtifact(finalName: String)(write: String => Unit): Unit = {
      write(foldStage.resolve(finalName).toString)
      renames += finalName: Unit
    }
    val built =
    try indexType.toUpperCase match {
      case "FULLTEXT" =>
        // crashed-fold healing: a prior fold may have renamed
        // dict_v(upTo) and died before data_v(upTo) — reaching here
        // proves the data base is older (else segs would be empty), so
        // that dict is an orphan. It must go BEFORE dictSegView runs:
        // the view would resolve it as its own base and the write
        // below would read from its own output path (Spark refuses, so
        // every retry would fail and wedge CDC on this table).
        Seq(s"dict_v$upTo", s"pos_v$upTo", s"norms_v$upTo", s"bmx_v$upTo",
            s"fz_v$upTo")
          .foreach { n =>
            val orphan = dir.resolve(n)
            if (Files.exists(orphan)) deleteRecursively(orphan)
          }
        val foldedDict = dictSegView(dir, upTo)
        stageArtifact(s"dict_v$upTo") { p =>
          KvLayout.writeSorted(foldedDict, Seq("term"), p)
        }
        // the fuzzy sidecar folds WITH the dict (same rows, (tlen,
        // term) layout): its version number alone pairs it with the
        // deltas still to apply, so a crash between the two renames
        // leaves both self-consistent (driverFtFuzzy folds deltas
        // above the fz base's OWN version)
        stageArtifact(s"fz_v$upTo") { p =>
          writeFtFuzzy(foldedDict, p, partitions = 0)
        }
        // an index built before positional support has no pos base —
        // the fold must not throw from the CDC write path (it would
        // wedge every subsequent merge at the auto-fold threshold);
        // skip the family and let refresh_index backfill it. Orphaned
        // posseg dirs below the advanced base are vacuum-reclaimed.
        if (Files.exists(resolveIndexVersioned(dir, "pos", baseVer)))
          stageArtifact(s"pos_v$upTo") { p =>
            KvLayout.writeSorted(posSegView(dir, upTo), Seq("term"), p)
          }
        // the folded postings feed data + norms + block stats — cache
        // across the three writes. Norms/bmx land BEFORE data (the
        // dict-before-data rename contract): readers pair them at the
        // resolved data base's version, so a crash between renames
        // leaves the OLD quadruple live and these as healed orphans.
        // A pre-norms index gains the ranked artifacts at its first
        // fold (the metas derive from the folded frame, complete).
        val foldedPost = fulltextSegView(base, baseVer, segs, tombs).cache()
        try {
          val rkT = schemaOf(table)(primaryKeyOf(table).head).dataType
          val doclens = graft.index.FullText.buildDocLens(foldedPost).cache()
          try {
            val (nd, td) = aggDoclens(doclens)
            val parts = ftRankedParts(nd)
            stageArtifact(s"norms_v$upTo") { p =>
              KvLayout.writeSorted(doclens, Seq("doc_id"), p,
                partitions = parts)
              writeNormMetaJson(Paths.get(p), nd, td)
            }
            rkT match {
              case LongType | IntegerType =>
                stageArtifact(s"bmx_v$upTo") { p =>
                  KvLayout.writeSorted(
                    graft.index.FullText.buildBlockStats(foldedPost, doclens),
                    Seq("term"), p, partitions = parts)
                }
              case _ => ()
            }
          } finally { doclens.unpersist(); () }
          stageArtifact(s"data_v$upTo") { p =>
            KvLayout.writeSorted(foldedPost, Seq("term", "doc_id"), p)
          }
        } finally { foldedPost.unpersist(); () }
        true
      case "BITMAP" =>
        stageArtifact(s"data_v$upTo") { p =>
          bitmapSegView(base, baseVer, segs, tombs)
            .write.mode("overwrite").parquet(p)
        }
        true
      case "VECTOR" =>
        // crashed-fold healing (the fulltext orphan-dict reasoning):
        // cent_v/vmeta_v/graph_v at upTo with an OLDER data base are
        // artifacts of a fold that died before its data rename —
        // readers never resolved them (artifacts pair at the data
        // base's version, see vectorArtifacts), but the writes below
        // must not read their own output paths
        Seq(s"cent_v$upTo", s"vmeta_v$upTo", s"graph_v$upTo").foreach { n =>
          val orphan = dir.resolve(n)
          if (Files.exists(orphan)) deleteRecursively(orphan)
        }
        val graphBase = resolveIndexVersioned(dir, "graph", baseVer)
        if (Files.exists(graphBase)) {
          // GRAPH-ERA fold: the coarse structure is FIXED between
          // refreshes (the DiskANN trade — re-fitting the quantizer
          // would re-key every list and force a FULL graph rebuild;
          // refresh_index owns the re-train), so the fold is
          // list-bounded end to end: cent/vmeta carry forward as
          // links, the segmented entries fold at their existing
          // encodings, and the fresh-delta rows fold into only the
          // TOUCHED per-list graphs (Hnsw.foldDelta — untouched lists
          // carry over row-identical, HnswSpec pins it).
          val folded = vectorSegView(base, baseVer, segs, tombs).cache()
          try {
            import org.apache.spark.sql.functions.col
            val entries = folded.select(col("cluster"), col("rk"), col("v"))
            // fold at the degree the graph was BUILT with (persisted
            // beside it) — the default would mix degrees after the
            // first fold of a non-default-m graph
            val graphM = readGraphM(graphBase)
            val newGraph = graft.similarity.Hnsw.foldDelta(
              spark.read.parquet(graphBase.toString), entries, graphM)
            stageArtifact(s"vmeta_v$upTo") { p =>
              copyArtifactDir(resolveIndexVersioned(dir, "vmeta", baseVer), p)
            }
            stageArtifact(s"cent_v$upTo") { p =>
              copyArtifactDir(resolveIndexVersioned(dir, "cent", baseVer), p)
            }
            stageArtifact(s"graph_v$upTo") { p =>
              newGraph.write.mode("overwrite").parquet(p)
              writeGraphM(p, graphM)
            }
            stageArtifact(s"data_v$upTo") { p =>
              KvLayout.writeSorted(folded, Seq("cluster"), p)
            }
          } finally folded.unpersist()
        } else {
        // compact RE-TRAINS: centroids drift as CDC patches accumulate
        // (every patch assigned to backfill-time centroids), so the
        // fold refits coarse quantizer + codebooks from the folded
        // entries — reading ONLY index frames (the vectors live in the
        // index), never the corpus.
        val folded = vectorSegView(base, baseVer, segs, tombs)
          .select("rk", "v").cache()
        try {
          val b = graft.similarity.VectorIndex.build(folded, "rk", "v")
          try {
            stageArtifact(s"vmeta_v$upTo") { p =>
              graft.similarity.VectorIndex.metaFrame(spark, b.meta)
                .write.mode("overwrite").parquet(p)
            }
            stageArtifact(s"cent_v$upTo") { p =>
              b.centroids.write.mode("overwrite").parquet(p)
            }
            stageArtifact(s"data_v$upTo") { p =>
              KvLayout.writeSorted(b.entries, Seq("cluster"), p)
            }
          } finally b.release()
        } finally folded.unpersist()
        }
        true
      case _ => false // kv indexes never write segments
    } catch {
      case e: Throwable =>
        // a failed stage write leaves only the quarantined root
        try deleteRecursively(foldStage) catch { case _: Exception => () }
        throw e
    }
    if (!built) {
      if (Files.exists(foldStage)) deleteRecursively(foldStage)
      return false
    }
    // post-stage fence + ordered renames: prove the grant is still
    // ours (and still current at the authority) before any staged
    // artifact takes its final name — a lapsed holder throws here
    // with its whole fold quarantined in the staging root. The rename
    // sequence then lands dict/pos (cent/vmeta) strictly before data,
    // so any interruption leaves the old triple live (the crash
    // contract in the scaladoc above).
    heldWriteLock.value.foreach { h => h.ensureValid(); h.fencedPublish(): Unit }
    renames.foreach { n =>
      val src = foldStage.resolve(n)
      val dst = dir.resolve(n)
      if (!Files.exists(dst))
        Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      else {
        // replace atomically for lock-free readers (the
        // writeIndexDirAtomic move-aside dance)
        val aside = dir.resolve(".staging_old_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
        Files.move(dst, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(aside)
      }
    }
    deleteRecursively(foldStage)
    true
  }

  /** Centroids + codebook meta paired at the resolved DATA base's
    * version — never at the live table version: a fold writes
    * cent/vmeta before its data base, so resolving them independently
    * at `live` could pair re-trained centroids with pre-fold cluster
    * ids after a mid-fold crash. Pairing at the data base version
    * makes the triple consistent by construction (the same fold/
    * backfill/refresh wrote all three). */
  private def vectorArtifacts(dir: Path, upTo: Int): (DataFrame,
      graft.similarity.VectorIndex.VMeta) = {
    val bv = indexBaseVersion(resolveIndexVersioned(dir, "data", upTo))
    val cent = spark.read.parquet(
      resolveIndexVersioned(dir, "cent", bv).toString)
    val meta = graft.similarity.VectorIndex.metaOf(spark.read.parquet(
      resolveIndexVersioned(dir, "vmeta", bv).toString))
    (cent, meta)
  }

  /** Encoded entries across base+segments, minus rows tombstoned at a
    * later version (same mask as the fulltext view; tombstones are
    * CDC-patch-sized — broadcast). Last-writer-wins per rk: a re-
    * patched vector's older entry is masked by the newer tombstone. */
  private def vectorSegView(base: Path, baseVer: Int,
                            segs: Seq[(Int, Path)],
                            tombs: Seq[(Int, Path)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = ((baseVer, base) +: segs).map { case (v, p) =>
      spark.read.parquet(p.toString)
        .select(col("rk"), col("cluster"), col("v"), col("codes"),
          col("rcodes")).withColumn("__v", lit(v))
    }.reduce(_ unionByName _)
    if (tombs.isEmpty) parts.drop("__v")
    else {
      val t = tombs.map { case (v, p) =>
        spark.read.parquet(p.toString)
          .select(col("rk").as("__trk"), lit(v).as("__tv"))
      }.reduce(_ unionByName _)
      parts.join(broadcast(t),
          parts("rk") === t("__trk") && t("__tv") > parts("__v"), "left_anti")
        .drop("__v")
    }
  }

  /** Read a specific historical snapshot (time travel). */
  def tableAt(name: String, version: Int): KvTable =
    KvTable(spark.read.parquet(tableDir(name).resolve(s"data_v$version").toString),
      primaryKeyOf(name))

  def table(name: String): KvTable =
    // explicit schema from the table meta (the incrementalMerge
    // precedent): schema INFERENCE re-reads parquet footers on every
    // call, and the commit paths call table() once or twice per
    // micro-batch — stack sampling measured the repeated footer reads
    // at ~0.4 s per st_stream_upsert rep. The meta JSON is the schema
    // of record (createTable wrote it; every write path selects the
    // declared columns), so inference adds I/O, not information.
    KvTable(spark.read.schema(schemaOf(name)).parquet(dataDir(name)),
      primaryKeyOf(name))

  /** Millisecond point read served on the calling thread — NO Spark
    * job (the reference's HBase `Get` path: HBaseEnumerator.kt reads
    * one region block client-side; KVIndexTable.kt:75-84 builds the
    * Get from the rowkey). Resolves the SAME committed snapshot a
    * lock-free Spark read would (dataVersionOf, including the
    * transaction overlay), prunes files by the snapshot's range
    * manifest when present (else per-file parquet footer statistics,
    * cached in-process), and pushes the key predicate into
    * parquet-hadoop for row-group/dictionary/column-index pruning —
    * see [[DriverRead]]. `key` binds the full (possibly composite)
    * primary key. Complement of the Spark scan path, not a
    * replacement: bounded key sets only. */
  def driverPointGet(name: String, key: Any*): Seq[Row] =
    driverMultiGet(name, Seq(key.toSeq))

  /** Batched driver-side multi-Get (reference multi-Get:
    * KVIndexTable.kt:75-84): one OR-of-keys predicate per surviving
    * file, so a batch costs one pass regardless of key count. */
  def driverMultiGet(name: String, keys: Seq[Seq[Any]]): Seq[Row] =
    driverMultiGetAt(name, keys, dataVersionOf(name))

  /** Multi-Get pinned to an explicit snapshot version — the building
    * block that lets a caller holding an index snapshot at version v
    * read the base table at the SAME v (a CDC merge committing
    * between two independent dataVersionOf calls would otherwise pair
    * a pre-merge index with a post-merge base). */
  private def driverMultiGetAt(name: String, keys: Seq[Seq[Any]],
                               version: Int): Seq[Row] = {
    val dir = tableDir(name).resolve(s"data_v$version")
    val mf = readManifestJson(dir).getOrElse(Nil)
    val ranges = mf.map(r => (r.file, r.lo, r.hi))
    // per-file rowkey blooms (when the manifest carries them): a miss
    // vetoes the file before its footer is ever opened
    val blooms = mf.flatMap(r => r.bloom.map(r.file -> _)).toMap
    DriverRead.get(dir, schemaOf(name), primaryKeyOf(name), keys, ranges,
      blooms)
  }

  /** Bounded driver-side range scan — the HBase `Scan(startRow,
    * stopRow)` serving primitive (HBaseSchema.kt:236 range scans),
    * with NO Spark job: manifest/footer pruning to the overlapping
    * files, the [lo,hi] predicate pushed into parquet-hadoop. Bounds
    * inclusive, on the LEADING primary-key column (rowkey order).
    * `maxRows` is the serving contract — a wider range belongs on
    * the Spark path, so exceeding it throws rather than truncating.
    * Rows come back in file order; callers sort. */
  def driverRangeScan(name: String, lo: Any, hi: Any,
                      maxRows: Int = 10000,
                      keyCol: Option[String] = None): Seq[Row] = {
    val pk = primaryKeyOf(name)
    val layout = layoutOf(name)
    val c = keyCol.getOrElse(pk.head)
    // which columns the millisecond path can serve is a property of
    // the LAYOUT: a sorted snapshot clusters only the leading rowkey
    // column; a z-ordered one clusters BOTH key dimensions (that is
    // its purpose), so a range on either is servable. Anything else
    // would degrade to an unpruned every-file driver read — fail
    // loudly onto the Spark scan path instead.
    val zSecond = layout == "zorder" && pk.size == 2 && c == pk(1)
    require(c == pk.head || zSecond,
      s"driver range scan on '$name' (layout '$layout') serves the " +
        s"leading rowkey column '${pk.head}'" +
        (if (layout == "zorder" && pk.size == 2)
          s" or the z-ordered second key '${pk(1)}'" else "") +
        s" — not '$c'; use the Spark scan path (table(\"$name\").df)")
    val dir = tableDir(name).resolve(s"data_v${dataVersionOf(name)}")
    // both z dimensions serve from the ONE manifest read: leading
    // bounds for pk.head, the recorded second-key bounds for the
    // z-second column (written by the merge path at no extra pass).
    // An entry without second bounds (pre-upgrade manifest) passes
    // null bounds — never pruned, parquet footer stats stand in for
    // just that file, which the z layout keeps narrow in both
    // dimensions (ZOrderSpec pins the claim). No manifest at all →
    // footer path for every file, as before.
    val ranges =
      if (c == pk.head)
        readManifestJson(dir).getOrElse(Nil).map(r => (r.file, r.lo, r.hi))
      else
        readManifestJson(dir).getOrElse(Nil).map(r =>
          (r.file, r.second.map(_._1).orNull, r.second.map(_._2).orNull))
    DriverRead.range(dir, schemaOf(name), c, lo, hi, maxRows, ranges)
  }

  /** Driver-side Get-by-secondary-index — the reference's getByIndex
    * (KVIndexTable.kt:64-84: prefix-seek the index table, then
    * multi-Get the base rowkeys), served like [[driverPointGet]] with
    * NO Spark job. Two driver-side reads: an equality seek on the kv
    * index's sorted (ik..., rk) parquet (value-sorted layout ⇒
    * row-group statistics prune like the reference's index-region
    * seek; `values` may bind a PREFIX of a composite index), then the
    * base multi-Get for the matched rowkeys. The index snapshot is
    * resolved at the published table version (resolveIndexVersioned),
    * so the pair is consistent: kv indexes are maintained
    * synchronously on every write path. Bounded-selectivity lookups
    * only — a value matching a large slice of the base table belongs
    * on the Spark lookup path (KvIndex.lookup), which AQE-joins. */
  def driverIndexGet(table: String, indexName: String,
                     values: Seq[Any]): Seq[Row] = {
    val cols = indexesOf(table)
      .collectFirst { case (n, ty, cs)
        if n == indexName && ty.equalsIgnoreCase("kv") => cs }
      .getOrElse(throw new IllegalArgumentException(
        s"no kv index '$indexName' on $table"))
    require(values.nonEmpty && values.length <= cols.length,
      s"lookup binds 1..${cols.length} leading columns of ${cols.mkString(",")}")
    val pk = primaryKeyOf(table)
    require(pk.length == 1,
      "driver index get serves single-column-rowkey tables (the " +
        "reference's index rowkey points at one base rowkey); " +
        "composite-pk tables use the Spark lookup path")
    val ts = schemaOf(table)
    val ikNames = ikColsOf(cols.length)
    val idxSchema = StructType(
      ikNames.zip(cols).map { case (ik, c) =>
        StructField(ik, ts(c).dataType, nullable = true) } :+
        StructField("rk", ts(pk.head).dataType, nullable = true))
    // resolve the published version ONCE and pin both reads to it:
    // resolving again for the base multi-Get could observe a CDC
    // merge that committed in between, pairing a pre-merge index with
    // a post-merge base table (a lookup by an old indexed value would
    // return the row with its new value)
    val v = dataVersionOf(table)
    val idxData = resolveIndexVersioned(
      indexDir(table, indexName, "kv"), "data", v)
    // index snapshots carry the same range manifest the base table
    // does (maintenance reuses the manifest machinery) — consume it
    // like driverMultiGet does; an absent/corrupt one degrades to
    // footer statistics
    val idxRanges = readManifestJson(idxData).getOrElse(Nil)
      .map(r => (r.file, r.lo, r.hi))
    val hits = DriverRead.get(idxData, idxSchema,
      ikNames.take(values.length), Seq(values), idxRanges)
    val rkIdx = idxSchema.fieldNames.indexOf("rk")
    val rks = hits.map(_.get(rkIdx)).distinct.filter(_ != null)
    if (rks.isEmpty) Nil
    else driverMultiGetAt(table, rks.map(Seq(_)), v)
  }

  /** Driver-side full-text AND search — the Lucene QUERY-path analog
    * completing the serving family (kv_ms_get / driverIndexGet): a
    * term lookup runs ENTIRELY on the calling thread, no Spark job.
    * Query terms go through the index's OWN analyzer (stopword terms
    * impose no constraint — the Spark path's searchAllAnalyzed
    * contract), then each term seeks the term-sorted postings of the
    * SEGMENTED view: the resolved base at or below the published
    * version plus every seg_v appended since, with tomb_v rk sets
    * masking older artifacts' rows (the same base+segment−tombstone
    * semantics fulltextSegView plans for Spark). Postings reads go
    * through DriverRead's three pruning layers (manifest / footer
    * stats / pushed term predicate); tombstones and dictionary
    * deltas are PATCH-SIZED by the CDC contract, so reading them
    * whole on the driver is bounded. Returns the matching rowkeys
    * ascending in their NATIVE order ([[Catalog.rowkeyOrd]] — numeric
    * keys numerically, strings lexicographically).
    * `maxPostings` is the serving contract: a broader query belongs
    * on the Spark path (FullText.searchAll over indexData). */
  def driverFtSearch(table: String, indexName: String, terms: Seq[String],
                     maxPostings: Int = 100000): Seq[Any] =
    driverFtBoolean(table, indexName, terms, requireAll = true, maxPostings)

  /** Driver-side OR (disjunctive) search — the Lucene BooleanQuery
    * SHOULD-clause analog beside [[driverFtSearch]]'s MUST: docs
    * containing ANY query term, same segmented-stack seeks, same
    * zero-Spark-jobs serving contract. The seeks are identical to the
    * AND path (each term is one pruned postings seek either way); only
    * the in-memory intersection flips to a union. */
  def driverFtSearchAny(table: String, indexName: String, terms: Seq[String],
                        maxPostings: Int = 100000): Seq[Any] =
    driverFtBoolean(table, indexName, terms, requireAll = false, maxPostings)

  private def driverFtBoolean(table: String, indexName: String,
                              terms: Seq[String], requireAll: Boolean,
                              maxPostings: Int): Seq[Any] = {
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val analyzed = graft.index.FullText
      .analyzeTerms(terms, indexAnalyzer(table, indexName)).distinct
    require(analyzed.nonEmpty,
      "every query term is a stopword under this analyzer")
    val perDoc = driverFtPerDoc(table, dir, analyzed, maxPostings)
    perDoc.collect { case (id, ts)
      if (if (requireAll) ts.size == analyzed.size else ts.nonEmpty) => id }
      .toSeq.sorted(Catalog.rowkeyOrd)
  }

  /** The shared boolean-serving core: per-doc matched-term sets for a
    * list of ALREADY-ANALYZED terms, seeked from the segmented
    * postings stack (base + seg_v − tomb_v masks) on the calling
    * thread — [[driverFtSearch]]/[[driverFtSearchAny]]/[[driverFtFuzzy]]
    * differ only in how they combine these sets. */
  private def driverFtPerDoc(table: String, dir: Path, terms: Seq[String],
                             maxPostings: Int)
      : scala.collection.Map[Any, scala.collection.Set[String]] = {
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    val postSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("doc_id", rkType, nullable = true),
      StructField("tf", LongType, nullable = true)))
    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val tombSets: Seq[(Int, Set[Any])] = tombs.map { case (v, p) =>
      (v, DriverRead.readAll(p, tombSchema, maxPostings).map(_.get(0)).toSet)
    }
    def maskedAt(v: Int, docId: Any): Boolean =
      tombSets.exists { case (tv, s) => tv > v && s.contains(docId) }
    val keys = terms.map(t => Seq(t: Any))
    val perDoc = scala.collection.mutable.Map[Any, scala.collection.mutable.Set[String]]()
    var n = 0
    ((baseVer, base) +: segs).foreach { case (v, p) =>
      val ranges = readManifestJson(p).getOrElse(Nil).map(r => (r.file, r.lo, r.hi))
      DriverRead.get(p, postSchema, Seq("term"), keys, ranges).foreach { r =>
        n += 1
        require(n <= maxPostings,
          s"query matched more than $maxPostings postings — " +
            "use the Spark search path")
        val docId = r.get(1)
        if (!maskedAt(v, docId))
          perDoc.getOrElseUpdate(docId,
            scala.collection.mutable.Set[String]()) += r.getString(0)
      }
    }
    perDoc
  }

  /** Driver-side PREFIX serving — the Lucene PrefixQuery analog
    * beside [[driverFtSearch]]'s TermQuery: docs containing ANY term
    * with the given prefix, served as ONE range seek per artifact
    * over the term-sorted postings ([prefix, prefix⁺) in byte order —
    * the FST prefix-seek shape, here parquet row-group pruning on the
    * term column), tombstone-masked like every segmented read, zero
    * Spark jobs. Lucene's PrefixQuery is NOT analyzed — the prefix is
    * only normalized — and matching runs against the INDEXED terms
    * (stemmed, for an `english` index), the same contract. The range
    * row cap is the serving contract: a prefix matching more postings
    * belongs on the Spark path (FullText.searchPrefix). */
  def driverFtPrefix(table: String, indexName: String, prefix: String,
                     maxPostings: Int = 100000): Seq[Any] = {
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val toks = graft.index.FullText.normTokens(prefix)
    require(toks.length == 1,
      s"prefix search takes ONE non-empty alnum prefix, got '$prefix'")
    val q = toks.head
    // exclusive upper bound: the prefix with its last byte bumped —
    // exact for the tokenizer's [a-z0-9] term charset; the final
    // startsWith keeps the boundary term out of an inclusive range
    val hi = q.init + (q.last + 1).toChar
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    val postSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("doc_id", rkType, nullable = true),
      StructField("tf", LongType, nullable = true)))
    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val tombSets: Seq[(Int, Set[Any])] = tombs.map { case (v, p) =>
      (v, DriverRead.readAll(p, tombSchema, maxPostings).map(_.get(0)).toSet)
    }
    def maskedAt(v: Int, docId: Any): Boolean =
      tombSets.exists { case (tv, s) => tv > v && s.contains(docId) }
    val out = scala.collection.mutable.Set[Any]()
    ((baseVer, base) +: segs).foreach { case (v, p) =>
      val ranges = readManifestJson(p).getOrElse(Nil)
        .map(r => (r.file, r.lo, r.hi))
      DriverRead.range(p, postSchema, "term", q, hi, maxPostings, ranges)
        .foreach { r =>
          if (r.getString(0).startsWith(q)) {
            val id = r.get(1)
            if (!maskedAt(v, id)) out += id: Unit
          }
        }
    }
    out.toSeq.sorted(Catalog.rowkeyOrd)
  }

  /** Driver-side FUZZY serving — the Lucene FuzzyQuery analog, the
    * last member of the query family (term/AND/OR/prefix/phrase/
    * ranked all serve driver-side): docs containing any term within
    * `maxEdits` Levenshtein distance of the query term, zero Spark
    * jobs. Expansion runs against the FUZZY SIDECAR (`fz`, the
    * dictionary laid out sorted by (tlen, term) — [[writeFtFuzzy]]):
    * levenshtein(a,b) ≥ |len(a)−len(b)|, so ONE range seek of the
    * tlen ∈ [|q|−k, |q|+k] bands is lossless and reads a few length
    * bands instead of the vocabulary (the Lucene term-automaton
    * length constraint as a physical layout; the term-sorted dict
    * could only serve this as a full scan). Candidates verify with
    * the shared edit-distance kernel (FullText.editDistance — the
    * same distance Spark's `levenshtein` and the oracle compute);
    * dictdelta_v patches fold on top by version number, so
    * merge-born terms match and fully-deleted terms (live df ≤ 0)
    * never do. Matched terms then union doc-ids through the
    * segmented postings stack exactly like [[driverFtSearchAny]].
    * Like Lucene's FuzzyQuery (and the Spark path's searchFuzzy),
    * the query term is normalized but NOT analyzed. */
  def driverFtFuzzy(table: String, indexName: String, term: String,
                    maxEdits: Int = 1, maxPostings: Int = 100000): Seq[Any] =
    driverFtFuzzyStats(table, indexName, term, maxEdits, maxPostings)._1

  /** [[driverFtFuzzy]] plus the banded-seek observable DriverGetSpec
    * pins: the number of sidecar rows the band seek actually read
    * (≪ vocabulary size — the point of the layout). */
  private[graft] def driverFtFuzzyStats(table: String, indexName: String,
                                        term: String, maxEdits: Int,
                                        maxPostings: Int)
      : (Seq[Any], Int) = {
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val toks = graft.index.FullText.normTokens(term)
    require(toks.length == 1,
      s"fuzzy search takes ONE non-empty alnum term, got '$term'")
    require(maxEdits >= 0 && maxEdits <= 2,
      s"maxEdits must be 0..2 (the Lucene FuzzyQuery bound), got $maxEdits")
    val q = toks.head
    val live = dataVersionOf(table)
    val fzBase = resolveIndexVersioned(dir, "fz", live)
    require(Files.exists(fzBase),
      s"no fuzzy dictionary sidecar under $dir — the index predates " +
        "fuzzy serving; CALL system.refresh_index to rebuild")
    val fzBaseVer = versionOf("fz", fzBase.getFileName.toString)
    val fzSchema = StructType(Seq(
      StructField("tlen", IntegerType, nullable = true),
      StructField("term", StringType, nullable = true),
      StructField("df", LongType, nullable = true)))
    val band = DriverRead.range(fzBase, fzSchema, "tlen",
      math.max(1, q.length - maxEdits), q.length + maxEdits,
      maxPostings, Nil)
    val dfAcc = scala.collection.mutable.Map[String, Long]()
    band.foreach { r =>
      val t = r.getString(1)
      if (graft.index.FullText.editDistance(t, q) <= maxEdits)
        dfAcc(t) = dfAcc.getOrElse(t, 0L) + r.getLong(2)
    }
    // patch-sized delta fold: terms born since the fz base (positive
    // ddf — merge-inserted docs' new vocabulary) and terms dying
    // (negative ddf — a term's every doc rewritten away reads as
    // live df ≤ 0 and must not match)
    val deltaSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("ddf", LongType, nullable = true)))
    versionedDirs(dir, "dictdelta_v", fzBaseVer, live).foreach { case (_, p) =>
      DriverRead.readAll(p, deltaSchema, maxPostings).foreach { r =>
        val t = r.getString(0)
        if (math.abs(t.length - q.length) <= maxEdits &&
            graft.index.FullText.editDistance(t, q) <= maxEdits)
          dfAcc(t) = dfAcc.getOrElse(t, 0L) + r.getLong(1)
      }
    }
    val matched = dfAcc.collect { case (t, d) if d > 0 => t }.toSeq
    val ids =
      if (matched.isEmpty) Nil
      else driverFtPerDoc(table, dir, matched, maxPostings)
        .collect { case (id, ts) if ts.nonEmpty => id }
        .toSeq.sorted(Catalog.rowkeyOrd)
    (ids, band.size)
  }

  /** Driver-side PHRASE search — [[driverFtSearch]]'s positional
    * counterpart (the Lucene PhraseQuery serving path): query terms
    * through the index's analyzer with Lucene's position-increment
    * contract (stopwords drop but keep their offsets, the
    * searchPhraseAnalyzed rule), each surviving term a pruned seek of
    * the POSITIONAL postings (pos base paired at the data base's
    * version + posseg_v segments − tomb_v masks), adjacency verified
    * in memory per candidate doc. Zero Spark jobs. */
  def driverFtPhrase(table: String, indexName: String, phrase: String,
                     maxPostings: Int = 100000): Seq[Any] = {
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val an = indexAnalyzer(table, indexName)
    val raw = graft.index.FullText.normTokens(phrase)
    require(raw.nonEmpty, "empty phrase")
    val terms: Seq[(String, Int)] =
      if (an == "standard") raw.zipWithIndex
      else {
        val t = raw.zipWithIndex
          .filterNot { case (w, _) => graft.index.FullText.StopWordsEn.contains(w) }
          .map { case (w, off) => (graft.plans.HashOps.stemWord(w), off) }
        require(t.nonEmpty,
          "every phrase term is a stopword under this analyzer")
        t
      }
    val live = dataVersionOf(table)
    val dataBaseVer = indexBaseVersion(resolveIndexVersioned(dir, "data", live))
    val posBase = resolveIndexVersioned(dir, "pos", dataBaseVer)
    require(Files.exists(posBase),
      s"no positional postings under $dir — the index predates " +
        "positional support; CALL system.refresh_index to rebuild")
    val segs = versionedDirs(dir, "posseg_v", dataBaseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", dataBaseVer, live)
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    val posSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("doc_id", rkType, nullable = true),
      StructField("pos", IntegerType, nullable = true)))
    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val tombSets: Seq[(Int, Set[Any])] = tombs.map { case (v, p) =>
      (v, DriverRead.readAll(p, tombSchema, maxPostings).map(_.get(0)).toSet)
    }
    def maskedAt(v: Int, docId: Any): Boolean =
      tombSets.exists { case (tv, s) => tv > v && s.contains(docId) }
    val keys = terms.map(_._1).distinct.map(t => Seq(t: Any))
    // per-doc, per-term position sets across the whole artifact stack
    val perDoc = scala.collection.mutable.Map[Any,
      scala.collection.mutable.Map[String, scala.collection.mutable.Set[Int]]]()
    var n = 0
    ((dataBaseVer, posBase) +: segs).foreach { case (v, p) =>
      val ranges = readManifestJson(p).getOrElse(Nil).map(r => (r.file, r.lo, r.hi))
      DriverRead.get(p, posSchema, Seq("term"), keys, ranges).foreach { r =>
        n += 1
        require(n <= maxPostings,
          s"phrase matched more than $maxPostings positional postings — " +
            "use the Spark search path")
        val docId = r.get(1)
        if (!maskedAt(v, docId))
          perDoc.getOrElseUpdate(docId, scala.collection.mutable.Map())
            .getOrElseUpdate(r.getString(0), scala.collection.mutable.Set[Int]())
            .add(r.getInt(2)): Unit
      }
    }
    val (t0, o0) = terms.head
    perDoc.collect { case (id, byTerm)
      if byTerm.get(t0).exists(_.exists(p0 =>
        terms.forall { case (t, off) =>
          byTerm.get(t).exists(_.contains(p0 + (off - o0))) })) => id
    }.toSeq.sorted(Catalog.rowkeyOrd)
  }

  /** Driver-side SNIPPET (hit-highlighting) serving — the Lucene
    * highlighter analog beside the query family: for every live doc
    * containing `term`, the first occurrence position (1-based), the
    * occurrence count, and a ±-token window around the first hit,
    * entirely on the calling thread. First position and count come
    * from a pruned seek of the POSITIONAL stack (pos base + posseg_v
    * − tomb_v masks — never a corpus scan); only the MATCHED docs'
    * text is then fetched, through the driver multi-get path (bounded
    * by the hit set), and tokenized with the index tokenizer for the
    * window slice — the FullText.snippets contract, served without a
    * Spark job. Results sort ascending by doc id. */
  def driverFtSnippet(table: String, indexName: String, term: String,
                      before: Int = 3, after: Int = 4,
                      maxPostings: Int = 100000): Seq[(Any, Int, Long, String)] = {
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val toks = graft.index.FullText.normTokens(term)
    require(toks.length == 1, s"snippets take ONE term, got '$term'")
    val t = toks.head
    val live = dataVersionOf(table)
    val dataBaseVer = indexBaseVersion(resolveIndexVersioned(dir, "data", live))
    val posBase = resolveIndexVersioned(dir, "pos", dataBaseVer)
    require(Files.exists(posBase),
      s"no positional postings under $dir — the index predates " +
        "positional support; CALL system.refresh_index to rebuild")
    val segs = versionedDirs(dir, "posseg_v", dataBaseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", dataBaseVer, live)
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    val posSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("doc_id", rkType, nullable = true),
      StructField("pos", IntegerType, nullable = true)))
    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val tombSets: Seq[(Int, Set[Any])] = tombs.map { case (v, p) =>
      (v, DriverRead.readAll(p, tombSchema, maxPostings).map(_.get(0)).toSet)
    }
    def maskedAt(v: Int, docId: Any): Boolean =
      tombSets.exists { case (tv, s) => tv > v && s.contains(docId) }
    // per live doc: (min position, occurrence count) across the stack
    val perDoc = scala.collection.mutable.Map[Any, (Int, Long)]()
    var n = 0
    ((dataBaseVer, posBase) +: segs).foreach { case (v, p) =>
      val ranges = readManifestJson(p).getOrElse(Nil).map(r => (r.file, r.lo, r.hi))
      DriverRead.get(p, posSchema, Seq("term"), Seq(Seq(t: Any)), ranges)
        .foreach { r =>
          n += 1
          require(n <= maxPostings,
            s"term matched more than $maxPostings positional postings — " +
              "use the Spark search path")
          val id = r.get(1)
          if (!maskedAt(v, id)) {
            val pos = r.getInt(2)
            val (mn, c) = perDoc.getOrElse(id, (Int.MaxValue, 0L))
            perDoc(id) = (math.min(mn, pos), c + 1)
          }
        }
    }
    if (perDoc.isEmpty) return Nil
    // only matched docs' text is fetched — the driver get path prunes
    // by manifest/bloom/footer like every serving read
    val schema = schemaOf(table)
    val pkIdx = schema.fieldNames.indexOf(primaryKeyOf(table).head)
    val textCol = indexesOf(table)
      .find(i => i._1 == indexName && i._2.equalsIgnoreCase("fulltext"))
      .getOrElse(throw new IllegalArgumentException(
        s"$table $indexName fulltext not registered"))._3.head
    val textIdx = schema.fieldNames.indexOf(textCol)
    driverMultiGet(table, perDoc.keys.toSeq.map(Seq(_))).flatMap { row =>
      val id = row.get(pkIdx)
      perDoc.get(id).map { case (mn, c) =>
        val body = Option(row.getString(textIdx)).getOrElse("")
        val arr = graft.index.FullText.normTokens(body)
        val first = mn + 1 // 1-based, the positional frame is 0-based
        val s = math.max(first - before, 1)
        val e = math.min(first + after, arr.length)
        (id, first, c, arr.slice(s - 1, e).mkString(" "))
      }
    }.sortBy(_._1)(Catalog.rowkeyOrd)
  }

  /** Driver-side BITMAP equality serving — the last index flavor to
    * join the serving family (kv_ms_get serves the kv index,
    * idx_ms_lookup the secondary kv index, ft_ms_* the fulltext
    * index): all rowkeys where the indexed column equals `value`,
    * decoded from the persisted bitmap index's SEGMENTED stack on the
    * calling thread — an iv-seek of the value's (shard, bitmap) rows
    * per artifact (the per-value rows are shard-count-bounded however
    * hot the value), patch-sized tombstone bitmaps read whole, and
    * the per-shard versioned fold runs the SAME Bitmap.foldVersions
    * kernel the Spark segmented view evaluates — driver path and
    * Spark path cannot disagree on masking semantics. Zero Spark
    * jobs; `maxIds` is the serving contract (a hotter value belongs
    * on the Spark path, BitmapIndex.lookupIds). */
  def driverBitmapIds(table: String, indexName: String, value: Any,
                      maxIds: Int = 100000): Seq[Long] = {
    val dir = indexDir(table, indexName, "bitmap")
    require(Files.exists(dir), s"$table $indexName bitmap not exists")
    val ivType = schemaOf(table)(indexesOf(table)
      .find(i => i._1 == indexName && i._2.equalsIgnoreCase("bitmap"))
      .getOrElse(throw new IllegalArgumentException(
        s"$table $indexName bitmap not registered"))._3.head).dataType
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val rowSchema = StructType(Seq(
      StructField("iv", ivType, nullable = true),
      StructField("shard", LongType, nullable = true),
      StructField("bm", BinaryType, nullable = true)))
    val parts = scala.collection.mutable.Map[Long,
      scala.collection.mutable.ListBuffer[(Int, Array[Byte])]]()
    ((baseVer, base) +: segs).foreach { case (v, p) =>
      DriverRead.get(p, rowSchema, Seq("iv"), Seq(Seq(value)), Nil)
        .foreach { r =>
          parts.getOrElseUpdate(r.getLong(1),
            scala.collection.mutable.ListBuffer()) += ((v, r.getAs[Array[Byte]](2)))
        }
    }
    val tombSchema = StructType(Seq(
      StructField("shard", LongType, nullable = true),
      StructField("bm", BinaryType, nullable = true)))
    val tombsByShard = scala.collection.mutable.Map[Long,
      scala.collection.mutable.ListBuffer[(Int, Array[Byte])]]()
    tombs.foreach { case (v, p) =>
      DriverRead.readAll(p, tombSchema, maxIds).foreach { r =>
        tombsByShard.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.ListBuffer()) += ((v, r.getAs[Array[Byte]](1)))
      }
    }
    val out = parts.iterator.flatMap { case (shard, ps) =>
      graft.index.Bitmap.ids(graft.index.Bitmap.foldVersions(ps.toSeq,
        tombsByShard.get(shard).map(_.toSeq).getOrElse(Nil)))
    }.toSeq
    require(out.size <= maxIds,
      s"value matched more than $maxIds rowkeys — use the Spark path")
    out.sorted
  }

  /** Driver-side BITMAP RANGE serving — [[driverBitmapIds]]'s range
    * form (the Pinot/Druid-style range scan idx_bitmap_range serves
    * on Spark): all rowkeys whose indexed value falls in [lo, hi],
    * decoded from the segmented bitmap stack on the calling thread.
    * One iv-range seek per artifact selects the in-range values'
    * (shard, bitmap) rows (an index-row predicate — tiny next to the
    * base table); each (value, shard) stack folds under the
    * versioned tombstone masks exactly like the equality path, and
    * the per-value results OR together — the same composition
    * BitmapIndex.rangeIds runs over the Spark segmented view, so the
    * two paths cannot disagree. Zero Spark jobs; `maxIds` fails
    * over-wide ranges loudly onto the Spark path. */
  def driverBitmapRangeIds(table: String, indexName: String,
                           lo: Any, hi: Any,
                           maxIds: Int = 100000): Seq[Long] = {
    val dir = indexDir(table, indexName, "bitmap")
    require(Files.exists(dir), s"$table $indexName bitmap not exists")
    val ivType = schemaOf(table)(indexesOf(table)
      .find(i => i._1 == indexName && i._2.equalsIgnoreCase("bitmap"))
      .getOrElse(throw new IllegalArgumentException(
        s"$table $indexName bitmap not registered"))._3.head).dataType
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val rowSchema = StructType(Seq(
      StructField("iv", ivType, nullable = true),
      StructField("shard", LongType, nullable = true),
      StructField("bm", BinaryType, nullable = true)))
    // per (value, shard): the versioned part stack — tombstones mask
    // per version whatever the value, so the fold keys on the pair
    val parts = scala.collection.mutable.Map[(Any, Long),
      scala.collection.mutable.ListBuffer[(Int, Array[Byte])]]()
    ((baseVer, base) +: segs).foreach { case (v, p) =>
      DriverRead.range(p, rowSchema, "iv", lo, hi, maxIds, Nil)
        .foreach { r =>
          parts.getOrElseUpdate((r.get(0), r.getLong(1)),
            scala.collection.mutable.ListBuffer()) += ((v, r.getAs[Array[Byte]](2)))
        }
    }
    val tombSchema = StructType(Seq(
      StructField("shard", LongType, nullable = true),
      StructField("bm", BinaryType, nullable = true)))
    val tombsByShard = scala.collection.mutable.Map[Long,
      scala.collection.mutable.ListBuffer[(Int, Array[Byte])]]()
    tombs.foreach { case (v, p) =>
      DriverRead.readAll(p, tombSchema, maxIds).foreach { r =>
        tombsByShard.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.ListBuffer()) += ((v, r.getAs[Array[Byte]](1)))
      }
    }
    val out = parts.iterator.flatMap { case ((_, shard), ps) =>
      graft.index.Bitmap.ids(graft.index.Bitmap.foldVersions(ps.toSeq,
        tombsByShard.get(shard).map(_.toSeq).getOrElse(Nil)))
    }.toSet
    require(out.size <= maxIds,
      s"range matched more than $maxIds rowkeys — use the Spark path")
    out.toSeq.sorted
  }

  /** Driver-side VECTOR top-k serving — the LAST index flavor to join
    * the millisecond family (kv, secondary-kv, bitmap and fulltext all
    * serve on the calling thread; this closes the vector gap, so
    * serving parity holds across EVERY persisted index flavor — the
    * reference's contract that the index IS the serving surface,
    * index/lucene/LuceneIndexTable.kt: query-path reads never scan the
    * base table). The FAISS IVF serving recipe on the persisted
    * artifacts, zero Spark jobs:
    *
    *   1. centroids: the `cent` artifact read whole (~√N rows —
    *      kilobytes; paired at the data base's version exactly like
    *      [[vectorArtifacts]]);
    *   2. coarse probe: the SAME negL2 metric every Spark-side search
    *      uses (Ann.coarseProbes), ties on the lower cluster id → the
    *      `nprobe` nearest lists;
    *   3. entries: ONE cluster-keyed seek per probed list against the
    *      cluster-sorted base (row-group stats prune — the read is
    *      probed-lists-sized, ≪ corpus: the stats variant returns the
    *      rows actually read so DriverGetSpec can pin it); CDC
    *      segments read WHOLE (patch-sized by the merge contract) and
    *      filtered to the probed lists; versioned tombstones mask
    *      exactly like [[vectorSegView]] (a later tombstone kills an
    *      earlier entry, last-writer-wins per rk);
    *   4. exact cosine re-rank on the calling thread — the same
    *      kernel arithmetic as the codegen'd expression (double
    *      accumulation, zero-norm → 0, 3-dp HALF_UP), ties on the
    *      rowkey ascending — rank-identical to `Ann.ivfSearch` over
    *      the segmented view with the same query/nprobe.
    *
    * `query` is the query vector (float/double values); `exclude`
    * drops a rowkey from the shortlist (the nn =!= qid self-exclusion
    * of the Spark path). `maxEntries` is the serving contract: a
    * probe set wider than it belongs on the Spark path — fail loudly,
    * never truncate. Returns (rowkey, score) ordered
    * (score desc, rowkey asc — native key order). */
  def driverAnnTopK(table: String, indexName: String, query: Seq[Double],
                    k: Int, nprobe: Int = 4, exclude: Option[Any] = None,
                    maxEntries: Int = 100000): Seq[(Any, Double)] =
    driverAnnTopKStats(table, indexName, query, k, nprobe, exclude,
      maxEntries)._1

  /** Multi-query form of [[driverAnnTopK]] — the serving-path
    * multi-get (the kv_multi_get shape applied to vectors): one
    * artifact resolution, ONE centroid read, ONE cluster-keyed base
    * seek over the UNION of every query's probed lists and one
    * patch-sized CDC segment/tombstone read serve the whole query
    * batch; the per-query candidate set, masking, exclusion and exact
    * re-rank are computed per query from the shared reads, so each
    * query's result is IDENTICAL to its own driverAnnTopK call (the
    * per-query candidates are exactly the rows of its probed lists).
    * A serving loop issuing Q queries otherwise pays Q full artifact
    * read passes for artifacts that cannot change under it (COW
    * snapshots). Queries are (vector, exclude) pairs; returns one
    * (rowkey, score) list per query, order-aligned. */
  def driverAnnTopKBatch(table: String, indexName: String,
                         queries: Seq[(Seq[Double], Option[Any])],
                         k: Int, nprobe: Int = 4,
                         maxEntries: Int = 100000): Seq[Seq[(Any, Double)]] =
    driverAnnTopKBatchCore(table, indexName, queries, k, nprobe,
      maxEntries).map(_._1)

  /** [[driverAnnTopK]] plus the sublinearity observable DriverGetSpec
    * pins: the number of entry rows actually read (base seeks + CDC
    * segments, before tombstone masking) — ≪ corpus by the
    * cluster-sorted layout. */
  private[graft] def driverAnnTopKStats(table: String, indexName: String,
                                        query: Seq[Double], k: Int,
                                        nprobe: Int, exclude: Option[Any],
                                        maxEntries: Int)
      : (Seq[(Any, Double)], Int) =
    driverAnnTopKBatchCore(table, indexName, Seq((query, exclude)), k,
      nprobe, maxEntries).head

  /** Shared core: per query, (top-k results, entry rows read for its
    * probed lists). Single-query calls are a batch of one, so the two
    * public faces cannot diverge. */
  private def driverAnnTopKBatchCore(table: String, indexName: String,
                                     queries: Seq[(Seq[Double], Option[Any])],
                                     k: Int, nprobe: Int, maxEntries: Int)
      : Seq[(Seq[(Any, Double)], Int)] = {
    require(k > 0, "k must be positive")
    require(nprobe > 0, "nprobe must be positive")
    require(queries.nonEmpty, "empty query batch")
    val dir = indexDir(table, indexName, "vector")
    require(Files.exists(dir), s"$table $indexName vector not exists")
    val vecCol = indexesOf(table)
      .find(i => i._1 == indexName && i._2.equalsIgnoreCase("vector"))
      .getOrElse(throw new IllegalArgumentException(
        s"$table $indexName vector not registered"))._3.head
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val qvs = queries.map(_._1.toArray)
    // 1+2: ONE centroid read + per-query coarse probe. cent pairs at
    // the data base's version (vectorArtifacts' crash-consistency
    // rule).
    val centSchema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = true),
      StructField("centroid", ArrayType(DoubleType), nullable = true)))
    val cents = DriverRead.readAll(
      resolveIndexVersioned(dir, "cent", baseVer), centSchema, maxEntries)
    require(cents.nonEmpty, s"$table $indexName vector has no centroids")
    val centVecs = cents.map(r => (r.getInt(0), anySeqToDoubles(r.getSeq[Any](1))))
    val probedPer: Seq[Seq[Int]] = qvs.map { qv =>
      centVecs.iterator.map { case (c, cv) => (negL2Driver(qv, cv), c) }
        .toSeq.sortBy { case (d, c) => (-d, c) }.take(nprobe).map(_._2)
    }
    val union: Seq[Int] = probedPer.flatten.distinct.sorted
    // 3: ONE cluster-keyed base seek over the union of probed lists +
    // patch-sized CDC overlays, cluster kept per candidate so each
    // query filters down to exactly its own probed lists
    val entrySchema = StructType(Seq(
      StructField("rk", rkType, nullable = true),
      StructField("cluster", IntegerType, nullable = true),
      StructField("v", ArrayType(schemaOf(table)(vecCol).dataType match {
        case ArrayType(et, _) => et
        case other => other
      }), nullable = true)))
    val cand = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Int, Array[Double])]
    val probeKeys = union.map(c => Seq(c: Any))
    ((baseVer, base) +: segs).foreach { case (v, p) =>
      val rows =
        if (v == baseVer)
          DriverRead.get(p, entrySchema, Seq("cluster"), probeKeys, Nil)
        else
          // a segment is patch-sized: read whole, then keep only the
          // probed lists — identical candidate set to the Spark
          // view's cluster join
          DriverRead.readAll(p, entrySchema, maxEntries)
            .filter(r => union.contains(r.getInt(1)))
      rows.foreach { r =>
        cand += ((v, r.get(0), r.getInt(1), anySeqToDoubles(r.getSeq[Any](2))))
      }
    }
    // tombstone masks: (version, rk), a mask kills any entry from an
    // EARLIER artifact version (vectorSegView's last-writer-wins)
    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val masks: Seq[(Int, Set[Any])] = tombs.map { case (tv, p) =>
      (tv, DriverRead.readAll(p, tombSchema, maxEntries).map(_.get(0)).toSet)
    }
    implicit val rkOrd: Ordering[Any] = Catalog.rowkeyOrd
    // 4: per-query candidate cut + exact re-rank (identical to the
    // single-query path over its own probed lists)
    queries.zipWithIndex.map { case ((_, exclude), qi) =>
      val qv = qvs(qi)
      val probed = probedPer(qi).toSet
      val mine = cand.iterator.filter { case (_, _, c, _) => probed.contains(c) }.toSeq
      require(mine.size <= maxEntries,
        s"probed lists hold more than $maxEntries entries — use the Spark path")
      val scored = mine.iterator
        .filter { case (v, rk, _, _) =>
          !masks.exists { case (tv, s) => tv > v && s.contains(rk) } }
        .filter { case (_, rk, _, _) => !exclude.contains(rk) }
        .map { case (_, rk, _, vec) => (rk, round3(cosineDriver(qv, vec))) }
        .toSeq
      (scored.sortBy { case (rk, s) => (-s, rk) }.take(k), mine.size)
    }
  }

  /** The coarse-probe metric on the calling thread — same arithmetic
    * as the codegen'd kernel (graft.plans.HashOps.negL2: sequential
    * double accumulation, nulls→0 handled upstream). */
  private def negL2Driver(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"negL2 over ragged vectors: ${a.length} vs ${b.length} dims")
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    -s
  }

  /** Exact cosine, matching HashOps.cosine (zero-norm → 0). */
  private def cosineDriver(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"cosine over ragged vectors: ${a.length} vs ${b.length} dims")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Spark Round's HALF_UP at 3 dp — the score rounding every ANN
    * search applies before ranking. */
  private def round3(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Float/double array column values → double[] (float widening is
    * exact — the same coercion the codegen kernels apply); a null
    * element reads as 0.0 like HashOps. */
  private def anySeqToDoubles(xs: Seq[Any]): Array[Double] =
    xs.iterator.map {
      case null => 0.0
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"non-numeric vector element $other")
    }.toArray

  /** Driver-side RANKED BM25 top-k — the Lucene TopScoreDocCollector
    * analog completing the serving family (driverFtSearch serves
    * boolean AND, driverFtPhrase phrases; this serves the DEFAULT read
    * pattern of a search path: scored, ranked, k-bounded), entirely on
    * the calling thread with block-max pruning. Result rows are
    * (doc_id, round4 BM25 score) ordered (score desc, doc_id asc) —
    * hash-identical to the Spark path's bm25TopK/bm25WandTopK over the
    * segmented view with (N, avgdl) derived from the live norms
    * (DriverGetSpec pins zero jobs, equality and CDC freshness).
    *
    * Reads, all through DriverRead's pruning layers:
    *   1. dictionary stack (term seeks on the dict base + patch-sized
    *      dictdelta reads) → exact LIVE df per query term;
    *   2. norms scalar metas (base + normseg) minus tombstone-masked
    *      rows → live (N, avgdl) with NO corpus aggregate — the masked
    *      rows' (count, Σdl) come from norms seeks of just the
    *      tombstoned rowkeys, patch-sized by the CDC contract;
    *   3. the scalar-free block summary (bmx: per (term, block)
    *      (max_tf, min_dl); FullText.buildBlockStats documents why
    *      stored impacts would NOT survive CDC scalar drift but these
    *      monotone inputs do) → live per-block upper bounds;
    *   4. postings: CDC segments' query-term lists read whole
    *      (patch-sized, never in the summary); the BASE read only for
    *      SURVIVING blocks — the `seedBlocks` best blocks by summed
    *      upper bound score exactly, the k-th exact score so far is θ,
    *      and every block with ubsum < θ − 1e-4 is dropped WITHOUT
    *      reading a posting or seeking a norm (safety: score(d) ≤
    *      ubsum(B), and round4(score) ≤ score + 5e-5 < θ strictly, so
    *      no pruned doc can reach or tie the k-th exact score; ties at
    *      θ reorder on doc_id only among docs actually scored). The
    *      surviving blocks reach parquet as (term IN q AND doc_id
    *      range) predicates over the (term, doc_id)-sorted base —
    *      pruned blocks are never assembled;
    *   5. norms seeks for exactly the scored docs' dl.
    * `maxPostings` is the serving contract, as everywhere: a broader
    * query belongs on the Spark path (FullText.bm25WandTopK). */
  def driverFtTopK(table: String, indexName: String, terms: Seq[String],
                   k: Int, k1: Double = 1.2, b: Double = 0.75,
                   seedBlocks: Int = 4,
                   maxPostings: Int = 100000): Seq[(Any, Double)] =
    driverFtTopKStats(table, indexName, terms, k, k1, b, seedBlocks,
      maxPostings)._1

  /** [[driverFtTopK]] plus the pruning observables DriverGetSpec pins:
    * (rows, base blocks carrying query-term postings, base blocks
    * actually read). */
  private[graft] def driverFtTopKStats(table: String, indexName: String,
                                       terms: Seq[String], k: Int,
                                       k1: Double, b: Double,
                                       seedBlocks: Int, maxPostings: Int)
      : (Seq[(Any, Double)], Int, Int) = {
    require(k > 0, "k must be positive")
    val dir = indexDir(table, indexName, "fulltext")
    require(Files.exists(dir), s"$table $indexName fulltext not exists")
    val analyzed = graft.index.FullText
      .analyzeTerms(terms, indexAnalyzer(table, indexName)).distinct
    require(analyzed.nonEmpty,
      "every query term is a stopword under this analyzer")
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    val normBase = resolveIndexVersioned(dir, "norms", baseVer)
    require(Files.exists(normBase),
      s"no norms artifact under $dir — the index predates ranked " +
        "serving; CALL system.refresh_index to rebuild")
    val normStack: Seq[(Int, Path)] =
      (baseVer, normBase) +: versionedDirs(dir, "normseg_v", baseVer, live)
    val rkType = schemaOf(table)(primaryKeyOf(table).head).dataType
    def manifest(p: Path): Seq[(String, Any, Any)] =
      readManifestJson(p).getOrElse(Nil).map(r => (r.file, r.lo, r.hi))

    val tombSchema = StructType(Seq(StructField("rk", rkType, nullable = true)))
    val tombSets: Seq[(Int, Set[Any])] = tombs.map { case (v, p) =>
      (v, DriverRead.readAll(p, tombSchema, maxPostings).map(_.get(0)).toSet)
    }
    def maskedAt(v: Int, docId: Any): Boolean =
      tombSets.exists { case (tv, s) => tv > v && s.contains(docId) }

    // 1. live df per query term (the dictSegView fold, driver-side)
    val dictBase = resolveIndexVersioned(dir, "dict", live)
    val dictBaseVer = {
      val n = dictBase.getFileName.toString
      if (n.startsWith("dict_v"))
        scala.util.Try(n.stripPrefix("dict_v").toInt).getOrElse(-1)
      else -1
    }
    val dictSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("df", LongType, nullable = true)))
    val dfAcc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    DriverRead.get(dictBase, dictSchema, Seq("term"),
        analyzed.map(t => Seq(t: Any)), manifest(dictBase))
      .foreach(r => dfAcc(r.getString(0)) += r.getLong(1))
    val deltaSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("ddf", LongType, nullable = true)))
    versionedDirs(dir, "dictdelta_v", dictBaseVer, live).foreach { case (_, p) =>
      DriverRead.readAll(p, deltaSchema, maxPostings).foreach { r =>
        val t = r.getString(0)
        if (analyzed.contains(t)) dfAcc(t) += r.getLong(1)
      }
    }

    // 2. live (N, avgdl): Σ metas − tombstone-masked norms rows
    var nLive = 0L
    var dlLive = 0L
    normStack.foreach { case (_, p) =>
      val (n, t) = readNormMeta(p); nLive += n; dlLive += t
    }
    val normSchema = StructType(Seq(
      StructField("doc_id", rkType, nullable = true),
      StructField("dl", LongType, nullable = true)))
    val allTombRks: Seq[Any] = tombSets.flatMap(_._2).distinct
    if (allTombRks.nonEmpty) normStack.foreach { case (v, p) =>
      DriverRead.get(p, normSchema, Seq("doc_id"),
          allTombRks.map(x => Seq(x)), manifest(p))
        .foreach { r =>
          if (maskedAt(v, r.get(0))) { nLive -= 1; dlLive -= r.getLong(1) }
        }
    }
    require(nLive > 0, "BM25 needs a non-empty corpus")
    val avgdl = dlLive.toDouble / nLive
    def idf(t: String): Double = {
      val d = dfAcc(t).toDouble
      math.log(1.0 + (nLive.toDouble - d + 0.5) / (d + 0.5))
    }
    def impact(tf: Double, dl: Double): Double =
      tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    // per-doc dl, seeked lazily for exactly the scored docs
    val dlCache = scala.collection.mutable.Map[Any, Long]()
    def seekDl(docIds: Seq[Any]): Unit = {
      val need = docIds.filterNot(dlCache.contains).distinct
      if (need.nonEmpty) normStack.foreach { case (v, p) =>
        DriverRead.get(p, normSchema, Seq("doc_id"),
            need.map(x => Seq(x)), manifest(p))
          .foreach { r =>
            val id = r.get(0)
            if (!maskedAt(v, id)) dlCache(id) = r.getLong(1)
          }
      }
    }

    // 3.+4. postings: segments whole, base by surviving blocks
    val postSchema = StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("doc_id", rkType, nullable = true),
      StructField("tf", LongType, nullable = true)))
    var nRead = 0
    val acc = scala.collection.mutable.Map[Any,
      scala.collection.mutable.Map[String, Long]]()
    // budget charges each (doc, term) ONCE: the degrade-to-plain-seek
    // branch below re-reads postings the seed pass already ingested
    // (acc assignment is idempotent), and double-charging them could
    // spuriously trip the contract error on a query near maxPostings
    val charged = scala.collection.mutable.Set[(Any, String)]()
    def ingest(v: Int, rows: Seq[Row]): Unit = rows.foreach { r =>
      val id = r.get(1)
      val t = r.getString(0)
      if (charged.add((id, t))) {
        nRead += 1
        require(nRead <= maxPostings,
          s"query matched more than $maxPostings postings — " +
            "use the Spark search path")
      }
      if (!maskedAt(v, id))
        acc.getOrElseUpdate(id,
          scala.collection.mutable.Map[String, Long]())(t) = r.getLong(2)
    }
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def scoreAll(): Seq[(Any, Double)] = {
      seekDl(acc.keys.toSeq)
      acc.iterator.map { case (id, tfs) =>
        // an unmasked posting without a norms row can only mean a
        // segment written before ranked-serving support — fail loudly
        // (silently unranking the doc would be a wrong answer)
        val dl = dlCache.getOrElse(id, throw new IllegalStateException(
          s"doc $id has postings but no norms row — a segment predates " +
            "ranked serving; CALL system.refresh_index to rebuild"))
        id -> round4(tfs.iterator.map { case (t, tf) =>
          idf(t) * impact(tf.toDouble, dl.toDouble) }.sum)
      }.toSeq
    }
    segs.foreach { case (v, p) =>
      ingest(v, DriverRead.get(p, postSchema, Seq("term"),
        analyzed.map(t => Seq(t: Any)), manifest(p)))
    }
    // ONE shared constant with the summary builders — a build/read
    // divergence would reconstruct wrong doc ranges and mis-prune
    val blockBits = graft.index.FullText.BlockBits
    val bmxPath = resolveIndexVersioned(dir, "bmx", baseVer)
    val integral = rkType == LongType || rkType == IntegerType
    var blocksTotal = 0
    var blocksRead = 0
    if (!integral || !Files.exists(bmxPath)) {
      // no block space (string rowkeys) / pre-upgrade index: exact
      // scoring of every matching base posting — correct, unpruned
      ingest(baseVer, DriverRead.get(base, postSchema, Seq("term"),
        analyzed.map(t => Seq(t: Any)), manifest(base)))
    } else {
      val bmxSchema = StructType(Seq(
        StructField("term", StringType, nullable = true),
        StructField("block", LongType, nullable = true),
        StructField("max_tf", LongType, nullable = true),
        StructField("min_dl", LongType, nullable = true)))
      val ub = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      DriverRead.get(bmxPath, bmxSchema, Seq("term"),
          analyzed.map(t => Seq(t: Any)), manifest(bmxPath))
        .foreach { r =>
          ub(r.getLong(1)) +=
            idf(r.getString(0)) *
              impact(r.getLong(2).toDouble, r.getLong(3).toDouble)
        }
      blocksTotal = ub.size
      def mergeRanges(rs: Seq[(Long, Long)]): Seq[(Long, Long)] =
        rs.foldLeft(List.empty[(Long, Long)]) {
          case ((plo, phi) :: rest, (lo, hi)) if lo <= phi + 1 =>
            (plo, math.max(phi, hi)) :: rest
          case (acc0, r) => r :: acc0
        }.reverse
      def readBlocks(bks: Seq[Long]): Seq[Row] =
        if (bks.isEmpty) Nil
        else {
          // sort by the RECONSTRUCTED lo (signed), not the block id:
          // negative doc_ids (legal rowkeys) hash to huge unsigned
          // block ids whose lo (bk << blockBits) wraps back negative —
          // block-id order would hand mergeRanges an lo-unsorted list
          // and its fold would silently absorb (= never read) the
          // negative-lo ranges' postings
          val merged = mergeRanges(bks.map(bk =>
            (bk << blockBits, (bk << blockBits) + ((1L << blockBits) - 1)))
            .sortBy(_._1))
          // a predicate of hundreds of ranges costs more than it saves
          // — degrade to the plain multi-term seek past a bound
          val ranges = if (merged.size > 32) Nil else merged
          DriverRead.getTermsInDocRanges(base, postSchema, analyzed,
            ranges, manifest(base))
        }
      val seeds = ub.toSeq.sortBy { case (bk, u) => (-u, bk) }
        .take(math.max(seedBlocks, 1)).map(_._1)
      ingest(baseVer, readBlocks(seeds))
      blocksRead += seeds.size
      val seedScores = scoreAll().map(_._2).sorted(Ordering[Double].reverse)
      val theta =
        if (seedScores.size < k) Double.NegativeInfinity
        else seedScores(k - 1)
      val seedSet = seeds.toSet
      val survivors = ub.iterator.collect {
        case (bk, u) if !seedSet.contains(bk) && u >= theta - 1e-4 => bk
      }.toSeq
      ingest(baseVer, readBlocks(survivors))
      blocksRead += survivors.size
    }
    def idLt(a: Any, bId: Any): Boolean = (a, bId) match {
      case (x: Number, y: Number) => x.longValue() < y.longValue()
      case (x: String, y: String) => x.compareTo(y) < 0
      case _ => a.toString < bId.toString
    }
    val top = scoreAll()
      .sortWith { case ((ida, sa), (idb, sb)) =>
        if (sa != sb) sa > sb else idLt(ida, idb) }
      .take(k)
    (top, blocksTotal, blocksRead)
  }

  /** Live snapshot path — the V2 catalog (GraftCatalog) reads/writes
    * this directory directly. */
  def liveDataPath(name: String): String = dataDir(name)

  /** Path of a specific snapshot version (the V2 table pins the
    * version it was loaded at, so one SQL statement reads one
    * consistent snapshot even while writers publish new ones). */
  def dataPathAt(name: String, version: Int): String =
    tableDir(name).resolve(s"data_v$version").toString

  /** Newest still-present snapshot version whose recorded publish time
    * is at or before `cutoffMs`, capped at the published pointer — the
    * `TIMESTAMP AS OF` resolution. Publish times come from the meta's
    * `publishTimes` map (written atomically with each pointer bump);
    * directory mtime is only the fallback for pre-upgrade snapshots
    * with no recorded entry — mtimes shift when lazy bookkeeping (the
    * range manifest) lands in an old snapshot dir, recorded times
    * don't. */
  def snapshotAtOrBefore(name: String, cutoffMs: Long): Option[Int] = {
    val live = dataVersionOf(name)
    val times = readMeta(name).path("publishTimes")
    withList(tableDir(name)) { it =>
      it.flatMap { p =>
        val n = p.getFileName.toString
        if (!n.startsWith("data_v")) None
        else scala.util.Try(n.stripPrefix("data_v").toInt).toOption
          .filter { v =>
            val rec = times.path(v.toString)
            val publishedMs =
              if (rec.isNumber) rec.asLong()
              else Files.getLastModifiedTime(p).toMillis
            v <= live && publishedMs <= cutoffMs
          }
      }.toList
    }.sorted.lastOption
  }

  /** Best-effort cleanup of an aborted writer's staging directory
    * (vacuum's grace window is the backstop). */
  def discardStaged(stagedDir: String): Unit = {
    val p = Paths.get(stagedDir)
    if (Files.exists(p)) try deleteRecursively(p)
    catch { case _: java.io.IOException => () }
  }

  /** SQL `INSERT INTO` commit: merge a staged batch into the table with
    * primary-key last-writer-wins semantics — the HBase Put model
    * (reference HBaseModifiableTable.kt:126-156: a Put on an existing
    * rowkey overwrites its cells, it never duplicates the row). Small
    * batches take the file-granular [[incrementalMerge]] path (only
    * files whose key range intersects the batch are rewritten; the
    * rest carry over as hard links); a bulk insert whose key set is too
    * large to reason about on the driver falls back to one full
    * shuffled upsert merge — both under the table write lock, so the
    * merge always runs against the CURRENT live snapshot and concurrent
    * inserts serialize instead of losing each other. */
  def upsertStaged(name: String, stagedDir: String,
                   maxIncrementalKeys: Int = 100000): Unit =
    try {
      import org.apache.spark.sql.functions.{col, struct, max}
      val schema = schemaOf(name)
      val fields = schema.fieldNames.toSeq
      val cols = fields.map(col)
      val pk = primaryKeyOf(name)
      val raw = spark.read.schema(schema).parquet(stagedDir)
      // rowkeys are non-null, like HBase rowkeys — reject at write time
      // with a clear error instead of NPEing in the merge's key
      // comparator (one limit-1 job over the pk columns of the batch)
      if (!raw.select(pk.map(col): _*)
            .where(pk.map(col(_).isNull).reduce(_ || _)).isEmpty)
        throw new IllegalArgumentException(
          s"primary key (${pk.mkString(",")}) of $name may not be null")
      // within-statement duplicate PKs collapse to one row (HBase batch
      // Puts on one rowkey leave a single cell version visible). A DSv2
      // batch has no meaningful row order after parallel write, so the
      // winner is made DETERMINISTIC instead: the greatest tuple of the
      // non-key columns (struct ordering, nulls first) — identical
      // batches always publish identical post-images, which is what
      // makes streaming-batch replay idempotent.
      val others = fields.filterNot(pk.contains)
      // max(struct(...)) needs an ordering on every non-key column; a
      // map-typed column has none (Spark: map types are unorderable).
      // Fall back to an arbitrary-but-single winner there — replay
      // idempotence for such schemas is only guaranteed when batches
      // don't carry intra-batch duplicate PKs (documented trade; every
      // current schema is orderable and keeps the deterministic path).
      val orderable = others.forall(o =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(schema(o).dataType))
      val batch =
        if (others.isEmpty) raw.dropDuplicates(pk) // rows are identical
        else if (!orderable) raw.dropDuplicates(pk)
        else raw.groupBy(pk.map(col): _*)
          .agg(max(struct(others.map(col): _*)).as("__w"))
          .select(pk.map(col) ++ others.map(o => col(s"__w.$o").as(o)): _*)
          .select(cols: _*)
      // one bounded job decides the path AND feeds the merge's file
      // pruning — the merge never re-collects
      val keyCol = pk.head
      val keys = batch.select(keyCol).distinct()
        .limit(maxIncrementalKeys + 1).collect().map(r => canonKey(r.get(0)))
      if (keys.length <= maxIncrementalKeys)
        incrementalMerge(name, batch, precollectedKeys = Some(keys))
      else {
        withRecoveredWriteLock(name) {
        val next = dataVersionOf(name) + 1
        val nextDir = tableDir(name).resolve(s"data_v$next")
        val stage = newSnapshotStaging(name)
        writeData(name, table(name).upsert(batch).df, stage.toString)
        val maint = maintainIndexes(name, next, stage, pre = None, post = None)
        publishGuardingIndexAsOf(name, next, Seq(stage -> nextDir), maint)
        }
      }
    } finally discardStaged(stagedDir)

  /** Stage-then-commit protocol for external (DSv2) writers: every
    * writer stages into its OWN uniquely-named directory (never a
    * shared data_vN — two racing writers must not be able to pollute
    * one directory), then [[publishStaged]] renames it to the next
    * snapshot and flips the pointer under the write lock. */
  def stagingPath(name: String): String =
    tableDir(name).resolve(
      s".staging_${java.util.UUID.randomUUID().toString.replace("-", "")}").toString

  /** Publish a staged snapshot as the next version: persist the
    * staged post-image through the table's declared LAYOUT into
    * data_v(next) and bump the pointer under the write lock. The
    * staged dir is raw DSv2 writer output — republishing it through
    * writeData is what keeps the layout invariant (rowkey sort or
    * z-clustering, hence file min/max pruning) across SQL row-level
    * rewrites, the same way HBase flushes AND compactions both emit
    * sorted HFiles. One extra pass over the post-image; row-level ops
    * are bulk rewrites already. The staged content is published as the
    * COMPLETE post-image (replace semantics — appends go through
    * [[upsertStaged]]'s PK merge instead). */
  def publishStaged(name: String, stagedDir: String,
                    expectedVersion: Option[Int] = None): Unit = {
    withRecoveredWriteLock(name) {
    val cur = dataVersionOf(name)
    try checkExpected(name, cur, expectedVersion)
    catch { case e: java.util.ConcurrentModificationException =>
      // the staged post-image derives from a stale snapshot and can
      // never be published — reclaim it before failing the statement
      deleteRecursively(Paths.get(stagedDir))
      throw e
    }
    val next = cur + 1
    val target = tableDir(name).resolve(s"data_v$next")
    // republish through THIS writer's own grant-scoped staging dir —
    // a data_v(next) left by a crashed earlier writer is unpublished
    // garbage the publish-time rename clears behind the fence
    val staged = spark.read.schema(schemaOf(name)).parquet(stagedDir)
    val stage = newSnapshotStaging(name)
    writeData(name, staged, stage.toString)
    deleteRecursively(Paths.get(stagedDir))
    val maint = maintainIndexes(name, next, stage, pre = None, post = None)
    publishGuardingIndexAsOf(name, next, Seq(stage -> target), maint)
  }
  }

  // ------------------------------------------------------------------
  // Multi-statement transactions — the Spark-bulk analog of the
  // reference's Tephra-backed transactional tables
  // (KVTransactionalIndexTable.kt: one transaction spans several
  // statements and the base+index writes of each). Semantics here are
  // optimistic snapshot isolation, per table:
  //   - every table READ inside the transaction pins that table's
  //     snapshot at first touch (repeatable reads, no locks held);
  //   - writes buffer as derived post-images (read-your-writes within
  //     the transaction, nothing visible outside it);
  //   - COMMIT takes the write locks of all written tables in sorted
  //     name order (no deadlocks), CAS-checks every written table is
  //     still at its pinned version (write-write conflict → the whole
  //     transaction fails, nothing published), stages every post-image
  //     snapshot + its kv-index maintenance, then writes one intent
  //     journal and flips all version pointers.
  // The journal is what makes the multi-table pointer flip crash-safe:
  // everything heavy happens BEFORE the journal (a crash there leaves
  // only unpublished garbage directories — vacuum reclaims them), and
  // after the journal only metadata bumps remain, which
  // [[recoverTransactions]] rolls FORWARD (each bump CAS-guarded, so
  // replay is idempotent). Readers between partial bumps can observe
  // table A committed while table B isn't yet — the same window
  // Tephra closes with a central transaction manager; the journal
  // bounds it to a crash + recovery, never silent loss.
  // ------------------------------------------------------------------

  /** Run `f` as one multi-statement transaction and commit its writes
    * atomically (all-or-nothing across every written table). Throws
    * `ConcurrentModificationException` if a concurrent writer published
    * to any written table since the transaction first touched it — the
    * caller re-runs the whole transaction. An exception from `f` rolls
    * back (nothing was published). */
  def transaction[A](f: Txn => A): A = {
    recoverTransactions()
    val txn = new Txn(this)
    val result =
      try f(txn)
      catch { case e: Throwable => txn.invalidate(); throw e }
    txn.commit()
    result
  }

  /** [[transaction]] with automatic re-run on write-write conflict —
    * the standard optimistic-concurrency client loop (Tephra clients
    * retry aborted transactions the same way). The body runs against a
    * FRESH set of pinned snapshots each attempt, so it must be a pure
    * function of what it reads through the Txn. */
  def transactionWithRetry[A](maxRetries: Int = 3)(f: Txn => A): A = {
    var attempt = 0
    while (true) {
      try return transaction(f)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit body: locks (sorted) → CAS all → stage all → journal →
    * bump all. Package-private for [[Txn]]. */
  private[kv] def commitTxn(writes: Seq[(String, DataFrame, Int)]): Unit = {
    if (writes.isEmpty) return
    val ordered = writes.sortBy(_._1)
    val locks = scala.collection.mutable.ListBuffer[LockProvider.Handle]()
    val lockFor = scala.collection.mutable.Map[String, LockProvider.Handle]()
    val stagedDirs = scala.collection.mutable.ListBuffer[Path]()
    val renamedDsts = scala.collection.mutable.ListBuffer[Path]()
    val indexRollbacks = scala.collection.mutable.ListBuffer[() => Unit]()
    var journal: Option[Path] = None
    try {
      ordered.foreach { case (t, _, _) =>
        val h = acquireWriteLock(t); locks += h; lockFor(t) = h
      }
      // In-lock heal BEFORE the CAS (like every other write path): a
      // crashed committer's pending journal (next = base+1) must be
      // rolled forward now, or this commit's own journal (next = base+2)
      // would coexist with it — and the one-step read overlay in
      // dataVersionOf can only bridge a single pending bump, so readers
      // would resolve this table at the new txn's pre-image while its
      // other tables already show the post-image. Healing here
      // guarantees at most one pending journal per table ever exists.
      ordered.foreach { case (t, _, _) => healPendingForLocked(t, lockFor.get(t)) }
      // conflict-check EVERY table before staging ANY write: a failed
      // CAS must leave all tables untouched. Post-heal, dataVersionOf
      // has no overlay left to apply for these tables, so the CAS runs
      // against the converged on-disk version.
      ordered.foreach { case (t, _, pinned) =>
        checkExpected(t, dataVersionOf(t), Some(pinned))
      }
      val publishes = ordered.map { case (t, post, pinned) =>
        val next = pinned + 1
        val dst = tableDir(t).resolve(s"data_v$next")
        val stage = newSnapshotStaging(t, lockFor.get(t))
        writeData(t, post, stage.toString)
        stagedDirs += stage
        // index maintenance stages index data_v(next) dirs AND persists
        // asOfVersion=next — both must unwind on a pre-journal abort,
        // or a later compact() publishing the same version number would
        // serve index content from this never-committed transaction.
        // Registered BEFORE maintenance so a mid-maintenance failure
        // (some indexes done, some not) also rolls back.
        val prevAsOf = indexesOf(t).filter(_._2.equalsIgnoreCase("kv"))
          .map { case (iname, ty, _) =>
            (iname, ty, indexAsOfVersion(t, iname, ty)) }
        indexRollbacks += { () =>
          prevAsOf.foreach { case (iname, ty, v) =>
            val d = indexDir(t, iname, ty).resolve(s"data_v$next")
            if (Files.exists(d)) deleteRecursively(d)
            setIndexAsOf(t, iname, ty, v)
          }
        }
        // the tuple's prevAsOf is unused here: the txn path registered
        // its own indexRollbacks above (they also delete renamed dirs)
        val idxRenames = maintainIndexes(t, next, stage,
          pre = None, post = None).renames
        stagedDirs ++= idxRenames.map(_._1)
        (t, next, (stage -> dst) +: idxRenames)
      }
      // the journal is THE txn commit point (recovery rolls forward
      // from it, so a journal written by a lapsed holder would be
      // replayed over the new owner's work even though publishVersion
      // fences): fence every held lease HERE, and at the AUTHORITY —
      // commitSwap atomically proves each grant is still the
      // resource's current one inside the authority's serialization
      // AND claims each table's next version number at the
      // authority-held commit pointer, rejecting this committer the
      // moment a newer grant exists and preventing any newer grant
      // from ever allocating ONTO these numbers. ensureValid alone is
      // check-then-act; the conditional swap shrinks the residual to
      // a lapse strictly between this line and the journal rename
      // (closable only by conditional writes on the journal store
      // itself). Superseded (pointer already past `next` with the
      // durable meta behind — a newer commit in flight) aborts
      // pre-journal, unwinding cleanly through the catch below.
      locks.foreach(_.ensureValid())
      publishes.foreach { case (t, next, _) =>
        lockFor(t).commitSwap(next.toLong) match {
          case LockProvider.Superseded(cur) =>
            throw new IllegalStateException(
              s"fencing: authority commit pointer for $t is already at $cur, " +
              s"past this transaction's $next — a newer grant committed; " +
              "aborting before the journal")
          case _ => ()
        }
      }
      // pre-rename epoch guard — publishVersion's fenceEpoch compare,
      // hoisted to BEFORE any final name is touched: a committer that
      // paused past its lease between the swaps above and here (the
      // authority re-affirms the number to the NEW current grant, which
      // then commits and stamps its higher epoch into the meta) must
      // abort with every byte still in grant-scoped staging — renaming
      // first would replace the new owner's published snapshot before
      // the re-affirm below could reject this holder. Token-less
      // grants (epoch 0) skip, as everywhere.
      publishes.foreach { case (t, _, _) =>
        val tok = lockFor(t).fencingToken
        if (tok > 0L) {
          val seen = readMeta(t).path("fenceEpoch").asLong(0L)
          if (tok < seen)
            throw new IllegalStateException(
              s"fencing: grant epoch $tok for $t is behind published epoch " +
              s"$seen — a newer writer committed while this transaction " +
              "staged; aborting before touching any final name")
        }
      }
      // post-fence materialization: only NOW do the staged snapshots
      // take their version-numbered names, so every heavy write above
      // happened inside grant-scoped dirs a lapsed holder can't aim at
      // the new owner's files. Recovery's "staged dir exists" check
      // keys off these dirs, so they must land BEFORE the journal —
      // the unfenced residual shrinks to a lapse strictly between the
      // fencedPublish above and the journal rename below (same class,
      // documented there). dsts tracked for the pre-journal unwind.
      publishes.foreach { case (_, _, renames) =>
        renames.foreach { case (src, dstDir) =>
          if (Files.exists(dstDir)) deleteRecursively(dstDir)
          Files.move(src, dstDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          renamedDsts += dstDir
        }
      }
      // JOURNAL-SWAP fence: the journal is the cross-table atomic
      // visibility point (recovery rolls it forward), so the same
      // conditioned-commit rule publishVersion applies one level down
      // must hold here one level up — a holder that lapsed anywhere
      // between the per-table commitSwaps above and this line must
      // LOSE before the journal takes its final name, or its journal
      // would be replayed over a newer grant's committed work.
      // Re-affirming each table's claimed number at the authority is
      // the idempotent same-number swap (the grant check inside the
      // authority's monitor is the fence; Superseded means a newer
      // commit passed our claim — abort pre-journal, unwinding through
      // the catch below). The residual shrinks to a lapse strictly
      // between this loop and the journal rename — the same
      // microsecond class as publishVersion's swap→meta window,
      // closable only by conditional writes on the journal store
      // itself. ConcurrencySpec pins the paused-committer race.
      publishes.foreach { case (t, next, _) =>
        lockFor(t).commitSwap(next.toLong) match {
          case LockProvider.Superseded(cur) =>
            throw new IllegalStateException(
              s"fencing: authority commit pointer for $t moved to $cur past " +
              s"this transaction's $next while it staged — a newer grant " +
              "committed; aborting before the journal")
          case _ => ()
        }
      }
      journal = Some(writeTxnJournal(publishes.map { case (t, n, _) => (t, n) }))
      publishes.foreach { case (t, next, _) => publishVersion(t, next, lockFor.get(t)) }
      // best-effort: once every pointer is bumped the transaction IS
      // committed — a failed unlink must not surface as a commit
      // failure. The orphan journal is harmless (recovery re-reads it,
      // every bump CAS-skips, then deletes it).
      journal.foreach { j =>
        try Files.deleteIfExists(j): Unit
        catch { case _: java.io.IOException => () }
      }
    } catch {
      case e: Throwable =>
        // pre-journal failure: the transaction never happened — reclaim
        // the staged snapshots and restore index state. Post-journal
        // failure: leave everything for recoverTransactions to roll
        // forward.
        if (journal.isEmpty) {
          indexRollbacks.foreach { r =>
            try r() catch { case _: Exception => () }
          }
          (stagedDirs ++ renamedDsts).foreach { d =>
            try deleteRecursively(d)
            catch { case _: java.io.IOException => () }
          }
        }
        throw e
    } finally locks.foreach(_.release())
  }

  private def writeTxnJournal(publishes: Seq[(String, Int)]): Path = {
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val node = mapper.createObjectNode()
    val arr = mapper.createArrayNode()
    publishes.foreach { case (t, v) =>
      val e = mapper.createObjectNode()
      e.put("table", t); e.put("next", v)
      arr.add(e): Unit
    }
    node.set[JsonNode]("publishes", arr): Unit
    // temp + atomic rename: a journal is either fully present or absent
    Files.createDirectories(txnDir)
    val tmp = txnDir.resolve(s".txn_$id.tmp")
    val fin = txnDir.resolve(s"_graft_txn_$id.json")
    Files.writeString(tmp, mapper.writeValueAsString(node))
    Files.move(tmp, fin, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    fin
  }

  /** In-lock journal heal: roll forward any journaled pointer bump for
    * ONE table whose write lock the caller ALREADY HOLDS. This closes
    * the gap the entry-point `recoverTransactions()` can't: a writer
    * heals, then BLOCKS on the table lock; while it waits, a
    * transaction journals its commit and dies mid-bump; the writer
    * then breaks the stale lock — without this re-check it would read
    * the pre-bump version and overwrite the committed transaction's
    * staged snapshot. Journals are left in place (other tables' bumps
    * may still be pending); the next full recovery CAS-skips the bump
    * done here and deletes them. */
  private def healPendingForLocked(
      name: String, handle: Option[LockProvider.Handle] = None): Unit =
    // both locations: a legacy pending journal at the warehouse root
    // also owns data_v(next) and must not be overwritten
    (pendingJournals(txnDir) ++ pendingJournals(Paths.get(warehouse))).foreach {
      case (_, Some(entries)) => entries.foreach { case (t, next) =>
        // RAW meta version: dataVersionOf overlays this very journal,
        // which would make the bump look already applied
        if (t == name && metaVersionOf(name) == next - 1 &&
            Files.exists(tableDir(name).resolve(s"data_v$next")))
          publishVersion(name, next, handle)
      }
      case _ => () // corrupt: full recovery quarantines
    }

  /** Roll forward any transaction that crashed between its intent
    * journal and its last pointer bump. Idempotent and concurrent-safe:
    * each bump re-checks, under the table's write lock, that the table
    * is exactly one version behind the journal entry AND the staged
    * snapshot directory exists — anything else (already bumped, or a
    * writer advanced past after breaking the dead owner's lock) is
    * skipped. Runs automatically at the start of every
    * [[transaction]]. */
  def recoverTransactions(): Unit = {
    val wh = Paths.get(warehouse)
    if (!Files.exists(wh)) return
    // both locations: the journal subdir plus the warehouse root for
    // journals written by pre-subdir builds. Error policy (incl. the
    // transient-IOException retry-then-throw stance) lives in
    // pendingJournals — a journal this recovery cannot read must fail
    // the caller, not be treated as drained.
    (pendingJournals(txnDir) ++ pendingJournals(wh)).foreach {
      case (j, None) =>
        // corrupt content: quarantine so every future transaction and
        // vacuum doesn't re-read and re-parse it forever (the .corrupt
        // suffix drops it from the listing)
        try Files.move(j, j.resolveSibling(j.getFileName.toString + ".corrupt"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        catch { case _: java.io.IOException => () }
      case (j, Some(entries)) =>
        entries.foreach { case (t, next) =>
          if (tableExists(t)) withWriteLock(t) {
            // RAW meta version (see healPendingForLocked): the
            // overlay would hide that this bump is still pending
            if (metaVersionOf(t) == next - 1 &&
                Files.exists(tableDir(t).resolve(s"data_v$next")))
              publishVersion(t, next)
          }
        }
        Files.deleteIfExists(j): Unit
    }
    // age out journal residue nothing will ever read again: .tmp files
    // orphaned by a crash between writeString and the atomic move, and
    // quarantined .corrupt journals (kept a week as operator evidence)
    val now = System.currentTimeMillis()
    Seq(txnDir, wh).filter(Files.exists(_)).flatMap { d =>
      withList(d) { it =>
        it.filter { p =>
          val n = p.getFileName.toString
          val age = now - (try Files.getLastModifiedTime(p).toMillis
            catch { case _: java.io.IOException => now })
          (n.startsWith(".txn_") && n.endsWith(".tmp") && age > 3600000L) ||
            (n.startsWith("_graft_txn_") && n.endsWith(".corrupt") &&
              age > 7L * 24 * 3600000L)
        }.toList
      }
    }.foreach(p => Files.deleteIfExists(p): Unit)
  }

  def schemaOf(name: String): StructType = {
    val cols = readMeta(name).path("columns").asInstanceOf[ArrayNode]
    StructType(cols.elements().asScala.map { c =>
      val md =
        if (c.hasNonNull("metadata")) Metadata.fromJson(c.path("metadata").asText())
        else Metadata.empty
      StructField(c.path("name").asText(),
        DataType.fromDDL(c.path("datatype").asText()),
        c.path("nullable").asBoolean(true), md)
    }.toSeq)
  }

  def charsetOf(name: String): String =
    readMeta(name).path("charset").asText("UTF-8")

  /** The primary key in the SCHEMA's field case. createTable stores it
    * canonicalized; the case-insensitive mapping here also repairs
    * metas written before canonicalization, so exact-match consumers
    * (StructType.apply, fields.filterNot) stay safe either way. */
  def primaryKeyOf(name: String): Seq[String] = {
    val fields = schemaOf(name).fieldNames
    readMeta(name).path("primary").asText().split(",").toSeq
      .map(k => fields.find(_.equalsIgnoreCase(k)).getOrElse(k))
  }

  def commentOf(name: String): String = readMeta(name).path("comment").asText("")

  /** Reference dropTable: disable + delete + purge sys rows
    * (HBaseSchema.kt:225-259). Here: recursive delete of the dir. */
  def dropTable(name: String): Unit = {
    require(tableExists(name), s"table $name does not exist")
    withWriteLock(name) {
      // purge the table AND its index tables (reference dropTable clears
      // the sys rows and index tables too, HBaseSchema.kt:225-259)
      val doomed = tableDir(name) +: withList(Paths.get(warehouse)) { it =>
        it.filter(_.getFileName.toString.startsWith(s"$name.")).toList
      }
      doomed.foreach(deleteRecursively)
    }
  }

  def listTables(): Seq[String] =
    if (!Files.exists(Paths.get(warehouse))) Seq.empty
    else withList(Paths.get(warehouse)) { it =>
      it.filter(p => Files.exists(p.resolve("_graft_meta.json")))
        .map(_.getFileName.toString).toList
    }.sorted

  /** Index DDL (reference: HBaseSchema.kt:262-319 createIndex — build
    * index table `{table}.{type}.{index}`, backfill from a scan, and
    * register it in the table's metadata; dropIndex reverses). The
    * registry is a LIST — a table carries any number of named indexes,
    * like the reference's index tables (HBaseSchema.kt:262-319).
    * Index flavors: "kv" (graft.index.KvIndex layout, single- or
    * multi-column), "bitmap", "fulltext" and "vector" (single-column;
    * the vector flavor persists the IVF centroid table, PQ codebooks
    * and cluster-sorted encoded entries — the ANN analog of the
    * reference's persisted Lucene directory). */
  def createIndex(table: String, indexName: String, indexType: String,
                  cols: Seq[String], analyzer: String = "standard",
                  graph: Boolean = false, graphM: Int = 8): Unit = {
    require(tableExists(table), s"table $table does not exist")
    require(cols.nonEmpty, "index needs at least one column")
    // the analyzer option belongs to the fulltext flavor (the Lucene
    // Standard/EnglishAnalyzer analog); "standard" is the no-op chain
    require(graft.index.FullText.Analyzers.contains(analyzer),
      s"unknown analyzer $analyzer")
    require(analyzer == "standard" || indexType.equalsIgnoreCase("fulltext"),
      s"analyzer option applies to fulltext indexes, not $indexType")
    // graph=>true builds the navigable-graph artifact IN the backfill
    // (`CALL system.create_index(..., options => 'graph=true')`), so a
    // vector index serves graph-ANN with an EMPTY delta buffer from
    // version 1 — without it, the index serves only after a separate
    // buildVectorGraph DDL, a window where sim_hnsw_ann has no graph
    require(!graph || indexType.equalsIgnoreCase("vector"),
      s"graph option applies to vector indexes, not $indexType")
    require(graphM > 0, s"graph degree m must be positive, got $graphM")
    val dir = indexDir(table, indexName, indexType)
    withWriteLock(table) {
    // existence checks INSIDE the lock: two concurrent createIndex
    // calls for the same index must not both pass the guard and both
    // backfill / double-register (TOCTOU)
    require(!Files.exists(dir),
      s"$table $indexName $indexType exists when create index") // IndexExistsException
    require(!indexesOf(table).exists { case (n, ty, _) =>
      n == indexName && ty.equalsIgnoreCase(indexType) },
      s"$table $indexName $indexType already registered")
    // validate index columns BEFORE the dir exists: a typo'd column
    // failing mid-backfill would strand a half-built dir that makes
    // every corrected retry trip the exists-guard above
    locally {
      val ts = schemaOf(table)
      cols.foreach { c =>
        require(ts.fields.exists(_.name.equalsIgnoreCase(c)),
          s"index column '$c' not in table $table")
      }
    }
    val t = this.table(table)
    val pk = primaryKeyOf(table).head
    // reference locks the table during DDL (table.sys lockStatus,
    // HBaseSchema.kt README: DDL修改时会锁定); the write lock makes the
    // meta read-modify-write atomic vs concurrent bulk writers, and
    // the attribute flip lets readers see DDL-in-progress
    setMetaAttr(table, "lockStatus", "LOCKED")
    try {
      Files.createDirectories(dir)
      indexType.toLowerCase match {
        case "kv" if cols.size == 1 =>
          KvLayout.writeSorted(graft.index.KvIndex.build(t.df, pk, cols.head),
            Seq("ik"), dir.resolve("data").toString)
        case "kv" =>
          val idx = graft.index.KvIndex.buildComposite(t.df, pk, cols)
          KvLayout.writeSorted(idx,
            cols.indices.map(i => s"ik$i"), dir.resolve("data").toString)
        case "bitmap" =>
          require(cols.size == 1, "bitmap indexes are single-column")
          graft.index.BitmapIndex.build(t.df, pk, cols.head)
            .write.mode("overwrite").parquet(dir.resolve("data").toString)
        case "fulltext" =>
          require(cols.size == 1, "fulltext indexes are single-column")
          // the reference's Lucene flavor: persisted inverted index
          // (postings term-sorted ⇒ term filters prune row groups),
          // plus positional postings — the frame phrase queries need
          // (Lucene stores positions per posting the same way). ONE
          // tokenize pass carrying the per-doc token count: positions
          // are the source of truth, and postings/dictionary/norms/
          // block stats all derive from them with no join back.
          val posDl = graft.index.FullText
            .buildPositionalWithDl(t.df, pk, cols.head, analyzer).cache()
          try {
            val postingsDl = graft.index.FullText
              .postingsWithDl(posDl).cache()
            try {
              // ONE action (the norms meta agg) sizes EVERY artifact
              // write up front: Σdl IS the positional row count and
              // bounds the postings rows, so no write pays
              // repartitionByRange's range-sampling execution of its
              // (cached but non-trivial) input plan
              val doclens = graft.index.FullText
                .doclensFromPostings(postingsDl).cache()
              try {
                val (nd, td) = aggDoclens(doclens)
                val partsDoc = ftRankedParts(nd)
                val partsTok = ftRankedParts(td)
                val dict = graft.index.FullText.buildDictionary(
                  postingsDl.select("term", "doc_id", "tf"))
                // the six artifacts are independent frames over the
                // SAME cached pass, and nothing is visible until the
                // meta registration below (a failed backfill deletes
                // the dir) — so the writes run CONCURRENTLY: each is
                // scheduler overhead + a small job, and sequencing six
                // of them was most of the backfill's wall time (the
                // gate floor; on a cluster, concurrent jobs also keep
                // executors busy instead of draining between writes).
                // (term, doc_id) postings sort — within one term the
                // postings stay doc-id ordered (the Lucene
                // postings-list order), so the ranked driver path's
                // surviving-block doc ranges prune pages through the
                // parquet column index.
                val writes: Seq[() => Unit] = Seq(
                  () => KvLayout.writeSorted(
                    posDl.select("doc_id", "term", "pos"), Seq("term"),
                    dir.resolve("pos").toString, partitions = partsTok),
                  () => KvLayout.writeSorted(
                    postingsDl.select("term", "doc_id", "tf"),
                    Seq("term", "doc_id"), dir.resolve("data").toString,
                    partitions = partsTok),
                  () => KvLayout.writeSorted(dict, Seq("term"),
                    dir.resolve("dict").toString, partitions = partsDoc),
                  () => {
                    KvLayout.writeSorted(doclens, Seq("doc_id"),
                      dir.resolve("norms").toString, partitions = partsDoc)
                    writeNormMetaJson(dir.resolve("norms"), nd, td)
                  },
                  () => writeFtFuzzy(dict, dir.resolve("fz").toString,
                    partsDoc)) ++
                  (schemaOf(table)(pk).dataType match {
                    case LongType | IntegerType => Seq(
                      () => KvLayout.writeSorted(
                        graft.index.FullText.buildBlockStatsWithDl(postingsDl),
                        Seq("term"), dir.resolve("bmx").toString,
                        partitions = partsDoc))
                    case _ => Nil
                  })
                runAllBlocking(writes)
              } finally { doclens.unpersist(); () }
            } finally { postingsDl.unpersist(); () }
          } finally { posDl.unpersist(); () }
        case "vector" =>
          require(cols.size == 1, "vector indexes are single-column")
          val built = graft.similarity.VectorIndex.build(t.df, pk, cols.head)
          // cluster-sorted entries: an IVF probe's per-list scan prunes
          // row groups on the cluster column instead of reading the
          // whole encoded corpus
          try {
            built.centroids.write.mode("overwrite")
              .parquet(dir.resolve("cent").toString)
            graft.similarity.VectorIndex.metaFrame(spark, built.meta)
              .write.mode("overwrite").parquet(dir.resolve("vmeta").toString)
            KvLayout.writeSorted(built.entries, Seq("cluster"),
              dir.resolve("data").toString)
            // graph=>true: the navigable-graph artifact lands in the
            // SAME backfill (plain `graph`, resolved like the other
            // unversioned creation artifacts) — the index serves
            // graph-ANN from version 1 with an empty delta buffer.
            // No staging needed: the index is unregistered until the
            // meta write below, and a failed backfill deletes the dir.
            if (graph) {
              import org.apache.spark.sql.functions.col
              val g = dir.resolve("graph").toString
              graft.similarity.Hnsw.buildGraph(
                built.entries.select(col("cluster"), col("rk"), col("v")),
                graphM)
                .write.mode("overwrite").parquet(g)
              writeGraphM(g, graphM)
            }
          } finally built.release()
        case other => throw new IllegalArgumentException(s"index type $other")
      }
      val meta = readMeta(table)
      val reg = meta.withArray[ArrayNode]("indexes")
      val entry = mapper.createObjectNode()
      entry.put("name", indexName)
      entry.put("type", indexType.toUpperCase)
      entry.put("cols", cols.mkString(","))
      if (analyzer != "standard") entry.put("analyzer", analyzer): Unit
      entry.put("asOfVersion", dataVersionOf(table))
      reg.add(entry): Unit
      writeMeta(table, meta)
    } catch {
      case e: Throwable =>
        // failed backfill: drop the half-built dir so a retry doesn't
        // trip the exists-guard (registration is last, so the registry
        // cannot reference this index yet)
        try deleteRecursively(dir) catch { case _: Exception => () }
        throw e
    } finally setMetaAttr(table, "lockStatus", "UNLOCK")
    }
  }

  /** Run independent Spark write actions concurrently and wait for
    * ALL of them (success or failure) before returning — a failure
    * rethrows only after every sibling finished, so a caller's
    * cleanup (e.g. createIndex deleting the half-built dir) never
    * races a still-running write. Used where artifact writes have no
    * ordering contract (unregistered backfill dirs). */
  private def runAllBlocking(writes: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val done = writes.map(w => Future(w()))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    val failures = done.collect { case scala.util.Failure(e) => e }
    failures.headOption.foreach { first =>
      // sibling failures ride along as suppressed — a multi-write
      // backfill failure must not lose the other artifacts' causes
      failures.tail.filter(_ ne first).foreach(first.addSuppressed)
      throw first
    }
  }

  /** The FUZZY-serving dictionary sidecar: the same rows as the term
    * dictionary, laid out sorted by (tlen, term) so a driver-side
    * edit-distance-k expansion ([[driverFtFuzzy]]) reads ONLY the
    * [len−k, len+k] length bands as range seeks — the Lucene
    * FuzzyQuery automaton's length constraint turned into a physical
    * layout (the term-sorted dict can only serve that band as a full
    * scan). Vocab-sized (tiny next to the postings); versioned with
    * and derived from the dict stack, so dictdelta_v patches fold on
    * top of it by version number exactly like the dictionary view. */
  private def writeFtFuzzy(dict: DataFrame, path: String,
                           partitions: Int): Unit = {
    import org.apache.spark.sql.functions.{col, length}
    val withLen =
      if (dict.columns.contains("tlen")) dict
      else dict.withColumn("tlen", length(col("term")))
    KvLayout.writeSorted(
      withLen.select(col("tlen").cast("int").as("tlen"), col("term"),
        col("df").cast("long").as("df")),
      Seq("tlen", "term"), path, partitions = partitions)
  }

  /** Output files for the ranked artifacts, sized from the doc count
    * already known to the meta agg (norms: one row per doc; the block
    * summary is the same order — ≤ one row per (query-able term,
    * 64-doc block) and empirically postings-shaped ÷ blocks). */
  private def ftRankedParts(nDocs: Long): Int =
    math.max(1L, (nDocs + mergeTargetRowsPerFile - 1) /
      mergeTargetRowsPerFile).toInt

  private def aggDoclens(doclens: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    val r = doclens.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("total")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Scalar meta beside a norms artifact: the frame's (row count,
    * Σ dl), so the live corpus scalars (N, avgdl) derive at query time
    * from metas + patch-sized tombstone adjustments — never a
    * corpus-sized aggregate on the serving thread. Underscore name
    * keeps the file invisible to parquet reads. */
  private def writeNormMetaJson(dir: Path, n: Long, total: Long): Unit = {
    val node = mapper.createObjectNode()
    node.put("n", n)
    node.put("total", total): Unit
    Files.writeString(dir.resolve("_graft_norm_meta.json"),
      mapper.writeValueAsString(node)): Unit
  }

  private def writeNormMeta(dir: Path, doclens: DataFrame): Unit = {
    val (n, total) = aggDoclens(doclens)
    writeNormMetaJson(dir, n, total)
  }

  private def readNormMeta(dir: Path): (Long, Long) = {
    val f = dir.resolve("_graft_norm_meta.json")
    require(Files.exists(f),
      s"norms artifact $dir has no scalar meta — CALL system.refresh_index")
    val n = mapper.readTree(Files.readString(f))
    (n.path("n").asLong(), n.path("total").asLong())
  }

  def lockStatusOf(table: String): String =
    readMeta(table).path("lockStatus").asText()

  /** Live dictionary view: the base dictionary (paired with the base
    * postings — both written by the same backfill/refresh/compact)
    * plus any df deltas appended by segment maintenance since. The
    * fold aggregates |vocab| + |deltas| rows — never the corpus. */
  def indexDictionary(table: String, indexName: String, indexType: String): DataFrame =
    dictSegView(indexDir(table, indexName, indexType), dataVersionOf(table))

  private def dictSegView(dir: Path, upTo: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val baseDict = resolveIndexVersioned(dir, "dict", upTo)
    val baseVer = {
      val n = baseDict.getFileName.toString
      if (n.startsWith("dict_v"))
        scala.util.Try(n.stripPrefix("dict_v").toInt).getOrElse(-1)
      else -1
    }
    val deltas = versionedDirs(dir, "dictdelta_v", baseVer, upTo)
    val base = spark.read.parquet(baseDict.toString)
    if (deltas.isEmpty) base
    else base.select(col("term"), col("df").cast("long").as("df"))
      .unionByName(deltas.map { case (_, p) =>
        spark.read.parquet(p.toString).select(col("term"), col("ddf").as("df"))
      }.reduce(_ unionByName _))
      .groupBy("term").agg(sum("df").as("df")).filter(col("df") > 0L)
  }

  def dropIndex(table: String, indexName: String, indexType: String): Unit = withWriteLock(table) {
    val dir = indexDir(table, indexName, indexType)
    require(Files.exists(dir),
      s"$table $indexName $indexType not exists when drop index")
    deleteRecursively(dir)
    val meta = readMeta(table)
    val reg = meta.withArray[ArrayNode]("indexes")
    val keep = reg.elements().asScala.filterNot(e =>
      e.path("name").asText() == indexName &&
        e.path("type").asText().equalsIgnoreCase(indexType)).toList
    reg.removeAll()
    keep.foreach(reg.add)
    writeMeta(table, meta)
  }

  /** Live index data: the highest maintained base at or below the
    * published table version, overlaid with any segments/tombstones
    * appended since (fulltext/bitmap) — the segmented read view. Base
    * with no segments reads exactly as before. */
  def indexData(table: String, indexName: String, indexType: String): DataFrame = {
    val dir = indexDir(table, indexName, indexType)
    val live = dataVersionOf(table)
    val base = resolveIndexVersioned(dir, "data", live)
    val baseVer = indexBaseVersion(base)
    val segs = versionedDirs(dir, "seg_v", baseVer, live)
    val tombs = versionedDirs(dir, "tomb_v", baseVer, live)
    if (segs.isEmpty && tombs.isEmpty) spark.read.parquet(base.toString)
    else indexType.toUpperCase match {
      case "FULLTEXT" => fulltextSegView(base, baseVer, segs, tombs)
      case "BITMAP"   => bitmapSegView(base, baseVer, segs, tombs)
      case "VECTOR"   => vectorSegView(base, baseVer, segs, tombs)
      case _          => spark.read.parquet(base.toString) // kv maintains in place
    }
  }

  /** The live vector-index triple: (entries view, centroids, meta) —
    * what every ANN search consumes. Entries come through the
    * segmented read view (base + CDC segments − tombstones); centroids
    * and codebooks pair at the data base's version (vectorArtifacts).
    * Assemble search-shaped indexes with
    * [[graft.similarity.VectorIndex.ivfOf]]/pqOf/ivfPqOf. */
  def vectorIndexView(table: String, indexName: String): (DataFrame,
      DataFrame, graft.similarity.VectorIndex.VMeta) = {
    val dir = indexDir(table, indexName, "vector")
    val (cent, meta) = vectorArtifacts(dir, dataVersionOf(table))
    (indexData(table, indexName, "vector"), cent, meta)
  }

  /** Build (or same-version rebuild) the NAVIGABLE-GRAPH artifact of a
    * `vector` index — the graph-ANN serving layer (Hnsw.buildGraph:
    * per-coarse-list m-NN graphs) persisted as `graph_v` beside
    * cent/vmeta/data, paired like them at the data base's version.
    * Build is DDL (O(|list|²) kernels per list, the SemDeDup cost
    * class, amortized over every search); after it, CDC rows appended
    * as segments surface through [[vectorGraphView]]'s structural
    * fresh-delta buffer until `CALL system.compact_index` folds them
    * into only the TOUCHED per-list graphs (foldIndexStack). */
  def buildVectorGraph(table: String, indexName: String, m: Int = 8): Unit =
    withWriteLock(table) {
      val dir = indexDir(table, indexName, "vector")
      require(Files.exists(dir), s"$table $indexName vector not exists")
      import org.apache.spark.sql.functions.col
      val bv = indexBaseVersion(resolveIndexDataDir(dir, table))
      val view = indexData(table, indexName, "vector")
      writeIndexDirAtomic(dir, s"graph_v$bv") { p =>
        graft.similarity.Hnsw.buildGraph(
          view.select(col("cluster"), col("rk"), col("v")), m)
          .write.mode("overwrite").parquet(p)
        writeGraphM(p, m)
      }
    }

  /** The graph artifact's persisted build degree `m` (Hnsw.buildGraph's
    * parameter), written beside the graph rows: compact-folds rebuild
    * TOUCHED lists and refresh_index re-builds the whole graph, and
    * both must do so at the degree the graph was BUILT with — folding
    * a non-default-m graph at the default would silently mix degrees
    * (touched lists at 8, untouched at the original m). Underscore
    * name keeps the file invisible to the parquet read. Pre-upgrade
    * graphs without the file read as the historical default 8. */
  private def writeGraphM(graphDir: String, m: Int): Unit =
    Files.writeString(Paths.get(graphDir).resolve("_graft_graph_m"),
      m.toString): Unit

  private def readGraphM(graphDir: Path): Int = {
    val f = graphDir.resolve("_graft_graph_m")
    if (!Files.exists(f)) 8
    else scala.util.Try(Files.readString(f).trim.toInt).getOrElse(8)
  }

  /** The graph-ANN serving pair: (graph, delta). The graph is the
    * persisted `graph_v` base; the DELTA BUFFER is derived
    * STRUCTURALLY as view ∖ graph (left_anti on CONTENT keys
    * (rk, cluster, v) — the DiskANN fresh-buffer recipe): exactly the
    * CDC rows merged since the last graph build/fold, patch-sized
    * between compactions. Content keys, not rk alone: an upsert that
    * re-encoded an EXISTING rk (same key, fresh v/cluster) must
    * surface in the buffer — rk-only derivation classified it as
    * already-served and graph searches kept scoring the pre-update
    * vector forever (Hnsw.searchStats masks the superseded graph row
    * out of the shortlist; foldDelta's content keys fold it away). */
  def vectorGraphView(table: String, indexName: String): (DataFrame, DataFrame) = {
    val dir = indexDir(table, indexName, "vector")
    // paired at the DATA BASE's version like cent/vmeta
    // (vectorArtifacts): a graph_v orphaned above the data base by a
    // crashed fold/refresh must not resolve — its lists key by a
    // coarse structure the live artifacts don't carry
    val bv = indexBaseVersion(resolveIndexDataDir(dir, table))
    val g = resolveIndexVersioned(dir, "graph", bv)
    require(Files.exists(g),
      s"$table $indexName vector has no graph artifact — " +
        "call buildVectorGraph first")
    import org.apache.spark.sql.functions.col
    val graph = spark.read.parquet(g.toString)
    val delta = indexData(table, indexName, "vector")
      .select(col("cluster"), col("rk"), col("v"))
      .join(graph.select(col("rk"), col("cluster"), col("v")),
        Seq("rk", "cluster", "v"), "left_anti")
    (graph, delta)
  }

  /** Live positional postings (term, doc_id, pos) — the frame phrase
    * search consumes. Base pairs at the resolved data base's version
    * (written by the same backfill/refresh/fold as the postings);
    * positional segments and the shared tombstones overlay it exactly
    * like the postings view. */
  def indexPositional(table: String, indexName: String,
                      indexType: String): DataFrame =
    posSegView(indexDir(table, indexName, indexType), dataVersionOf(table))

  private def posSegView(dir: Path, upTo: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataBaseVer = indexBaseVersion(resolveIndexVersioned(dir, "data", upTo))
    val posBase = resolveIndexVersioned(dir, "pos", dataBaseVer)
    require(Files.exists(posBase),
      s"no positional postings under $dir — the index predates " +
        "positional support; CALL system.refresh_index to rebuild")
    val segs = versionedDirs(dir, "posseg_v", dataBaseVer, upTo)
    val tombs = versionedDirs(dir, "tomb_v", dataBaseVer, upTo)
    val parts = ((dataBaseVer, posBase) +: segs).map { case (v, p) =>
      spark.read.parquet(p.toString)
        .select(col("doc_id"), col("term"), col("pos")).withColumn("__v", lit(v))
    }.reduce(_ unionByName _)
    if (tombs.isEmpty) parts.drop("__v")
    else {
      val t = tombs.map { case (v, p) =>
        spark.read.parquet(p.toString).select(col("rk"), lit(v).as("__tv"))
      }.reduce(_ unionByName _)
      parts.join(broadcast(t),
          parts("doc_id") === t("rk") && t("__tv") > parts("__v"), "left_anti")
        .drop("__v")
    }
  }

  /** Postings across base+segments, minus postings of docs tombstoned
    * at a later version. Tombstones are CDC-patch-sized — broadcast. */
  private def fulltextSegView(base: Path, baseVer: Int,
                              segs: Seq[(Int, Path)],
                              tombs: Seq[(Int, Path)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = ((baseVer, base) +: segs).map { case (v, p) =>
      spark.read.parquet(p.toString)
        .select(col("term"), col("doc_id"), col("tf")).withColumn("__v", lit(v))
    }.reduce(_ unionByName _)
    if (tombs.isEmpty) parts.drop("__v")
    else {
      val t = tombs.map { case (v, p) =>
        spark.read.parquet(p.toString).select(col("rk"), lit(v).as("__tv"))
      }.reduce(_ unionByName _)
      parts.join(broadcast(t),
          parts("doc_id") === t("rk") && t("__tv") > parts("__v"), "left_anti")
        .drop("__v")
    }
  }

  /** Bitmap rows folded per (value, shard): each part's bitmap loses
    * ids tombstoned at a later version, survivors OR together
    * (Bitmap.foldVersions — property-tested last-writer-wins replay,
    * run through the codegen'd BitmapFoldExpr kernel: the fold stays
    * inside the projection's codegen span, no UDF boxing). Work
    * spreads across (value, shard) rows like every other bitmap op;
    * tombstone lists are patch-sized and broadcast. */
  private def bitmapSegView(base: Path, baseVer: Int,
                            segs: Seq[(Int, Path)],
                            tombs: Seq[(Int, Path)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val emptyVersioned =
      array().cast("array<struct<__tv:int,bm:binary>>")
    val parts = ((baseVer, base) +: segs).map { case (v, p) =>
      spark.read.parquet(p.toString)
        .select(col("iv"), col("shard"), col("bm")).withColumn("__v", lit(v))
    }.reduce(_ unionByName _)
    val partAgg = parts.groupBy("iv", "shard")
      .agg(collect_list(struct(col("__v"), col("bm"))).as("pbs"))
    val withTombs =
      if (tombs.isEmpty) partAgg.withColumn("tbs", emptyVersioned)
      else partAgg.join(
        broadcast(tombs.map { case (v, p) =>
          spark.read.parquet(p.toString)
            .select(col("shard"), struct(lit(v).as("__tv"), col("bm")).as("tb"))
        }.reduce(_ unionByName _).groupBy("shard")
          .agg(collect_list(col("tb")).as("tbs"))),
        Seq("shard"), "left")
        // left join: shards with no tombstones carry a null list —
        // normalize to empty so the fold kernel sees two real arrays
        .withColumn("tbs", coalesce(col("tbs"), emptyVersioned))
    withTombs.withColumn("bm",
        graft.plans.BitmapExpressions.fold(col("pbs"), col("tbs")))
      .withColumn("card", graft.index.BitmapIndex.Ops.bitmapCard(col("bm")))
      .filter(col("card") > 0L)
      .select(col("iv"), col("shard"), col("bm"), col("card"))
  }

  /** Index registry from the table's metadata: (name, type, cols). */
  def indexesOf(table: String): Seq[(String, String, Seq[String])] =
    readMeta(table).withArray[ArrayNode]("indexes").elements().asScala.map { e =>
      (e.path("name").asText(), e.path("type").asText(),
        e.path("cols").asText().split(",").toSeq)
    }.toSeq

  /** The analyzer a fulltext index was created with ("standard" when
    * unset — incl. every pre-option index). EVERY build path (create,
    * CDC segment, refresh) must consult this, or a segment built with
    * the wrong chain would silently mix stemmed and unstemmed terms
    * in one postings view. */
  def indexAnalyzer(table: String, indexName: String): String =
    readMeta(table).withArray[ArrayNode]("indexes").elements().asScala
      .find(e => e.path("name").asText() == indexName)
      .map(_.path("analyzer").asText("standard"))
      .getOrElse("standard")

  // ------------------------------------------------------------------
  // Per-write index maintenance.
  //
  // Reference semantics: KV index tables are maintained synchronously
  // on every base-table Put/Delete (KVIndexTable.kt:95-125 — read old
  // value, delete stale index row, put new one); the Lucene full-text
  // index is maintained by its own writer and committed out of band.
  // Here: "kv" indexes update on every write path — file-granularly
  // when the touched entry set is bounded — while the analytic flavors
  // (bitmap, fulltext) carry an as-of version, report STALE after
  // writes, and rebuild via refreshIndex / CALL system.refresh_index.
  // Index data is versioned like table data (data_vN alongside the
  // original backfill dir) so a maintenance write never clobbers the
  // snapshot a concurrent reader resolved.
  // ------------------------------------------------------------------

  /** Index entry frame for a kv index over `cols`: (ik..., rk). */
  private def kvEntriesOf(table: String, rows: DataFrame, cols: Seq[String]): DataFrame = {
    val rk = primaryKeyOf(table).head
    if (cols.size == 1) graft.index.KvIndex.build(rows, rk, cols.head)
    else graft.index.KvIndex.buildComposite(rows, rk, cols)
  }

  private def ikColsOf(n: Int): Seq[String] =
    if (n == 1) Seq("ik") else (0 until n).map(i => s"ik$i")

  /** Highest versioned index dir at or below the PUBLISHED table
    * version, falling back to the original backfill dir. Bounding by
    * the published version is what makes maintenance crash-safe for
    * lock-free readers: a data_v(next) written mid-merge (or orphaned
    * by a failed publish) is invisible until the table pointer
    * actually reaches `next`, so readers never pair a post-image
    * index with a pre-image table. */
  private def resolveIndexVersioned(dir: Path, prefix: String,
                                    maxVersion: Int): Path = {
    // second element: evidence a rebuild could be racing this
    // resolution — a versioned candidate was listed (and may vanish
    // mid-swap) or a .staging_ dir is in flight. Without it a miss is
    // a genuine absence (artifact never built) and must return
    // immediately, not burn three sleeps on every legitimate miss.
    def once(): (Path, Boolean) = {
      if (!Files.exists(dir)) return (dir.resolve(prefix), false)
      val (versions, staging) = withList(dir) { it =>
        val names = it.map(_.getFileName.toString).toList
        (names.filter(_.startsWith(s"${prefix}_v"))
           .flatMap(n => scala.util.Try(n.stripPrefix(s"${prefix}_v").toInt).toOption)
           .filter(_ <= maxVersion),
         names.exists(_.startsWith(".staging_")))
      }
      val p = if (versions.isEmpty) dir.resolve(prefix)
        else dir.resolve(s"${prefix}_v${versions.max}")
      (p, versions.nonEmpty || staging)
    }
    // A same-version index rebuild swaps the destination with two
    // renames (move-aside, move-in): a lock-free reader listing in
    // that instant sees neither dir and would fall back to an older
    // base that may not exist at all. The window is two metadata ops
    // wide — re-resolve briefly before surfacing the miss.
    var (resolved, rebuildRacing) = once()
    var attempts = 0
    while (!Files.exists(resolved) && rebuildRacing && attempts < 3) {
      Thread.sleep(5L << attempts)
      val r = once()
      resolved = r._1
      rebuildRacing = r._2
      attempts += 1
    }
    resolved
  }

  private def resolveIndexDataDir(dir: Path, table: String): Path =
    resolveIndexVersioned(dir, "data", dataVersionOf(table))

  /** FRESH iff the index content matches the live table version. */
  def indexStatus(table: String, indexName: String, indexType: String): String = {
    val asOf = try indexAsOfVersion(table, indexName, indexType)
      catch { case _: IllegalArgumentException => -1 }
    if (asOf == dataVersionOf(table)) "FRESH" else s"STALE@v$asOf"
  }

  private def setIndexAsOf(table: String, indexName: String, indexType: String,
                           version: Int): Unit = {
    val meta = readMeta(table)
    meta.withArray[ArrayNode]("indexes").elements().asScala
      .find(e => e.path("name").asText() == indexName &&
        e.path("type").asText().equalsIgnoreCase(indexType))
      .foreach(_.asInstanceOf[ObjectNode].put("asOfVersion", version))
    writeMeta(table, meta)
  }

  /** Bring every registered kv index to `next`. With a bounded
    * pre/post image of the touched rows the index patch is itself
    * file-granular (stale entries anti-joined out of intersecting
    * index files by exact (ik..., rk) tuple, untouched index files
    * hard-linked across); otherwise — full-snapshot writes, unbounded
    * or null-keyed entry sets — the index rebuilds from the complete
    * next snapshot, a write proportional to a write that was already
    * table-sized. Analytic flavors are left stale on purpose. */
  private def maintainIndexes(name: String, next: Int, nextDataDir: Path,
                              pre: Option[DataFrame], post: Option[DataFrame],
                              maxEntryKeys: Int = 100000): IndexMaintenance = {
    val kvIndexes = indexesOf(name).filter(_._2.equalsIgnoreCase("kv"))
    if (kvIndexes.isEmpty) return IndexMaintenance(Nil, Nil)
    // pre-bump as-of snapshot, so a publish that is FENCED OUT can
    // restore the registry: the bump below persists asOfVersion=next
    // before publishVersion's fence/rename, and a holder that never
    // materializes data_v(next) must not leave the registry claiming
    // freshness at a version a later compact() could re-mint
    val prevAsOf = kvIndexes.map { case (iname, ty, _) =>
      (iname, ty, indexAsOfVersion(name, iname, ty)) }
    lazy val fullPost = spark.read.schema(schemaOf(name)).parquet(nextDataDir.toString)
    val renames = kvIndexes.map { case (iname, ty, cols) =>
      val dir = indexDir(name, iname, ty)
      val ikCols = ikColsOf(cols.size)
      // same grant-scoped stage→publish-rename protocol as the table
      // snapshot: the version-numbered name materializes only behind
      // publishVersion's fences, so a lapsed holder's index rebuild
      // can't cross-write the new owner's index dir at the same
      // version. Under the INDEX dir (same volume ⇒ atomic rename)
      // and `.staging_`-prefixed (vacuum's index sweep reclaims
      // crashed attempts).
      val nextIdxDir = dir.resolve(s".staging_grant" +
        heldWriteLock.value.map(_.fencingToken).getOrElse(0L) + "_" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      val finalIdxDir = dir.resolve(s"data_v$next")
      val incremental = (pre, post) match {
        case (Some(p), Some(q)) =>
          val remove = kvEntriesOf(name, p, cols)
          val add = kvEntriesOf(name, q, cols)
          val lead = ikCols.head
          val keys = remove.select(lead).unionByName(add.select(lead))
            .distinct().limit(maxEntryKeys + 1).collect().map(r => canonKey(r.get(0)))
          if (keys.length > maxEntryKeys || keys.contains(null)) false
          else {
            val curIdx = resolveIndexDataDir(dir, name)
            // the index range map goes through the SAME persisted
            // manifest machinery as the table's: computed once, then
            // carried forward incrementally below — without it every
            // CDC trigger paid a full index lead-column scan just to
            // find the touched files, index-wide I/O the manifest
            // exists to avoid. Persistability follows the indexed
            // column's type (ik1 = first indexed column).
            val leadPersistable = manifestPersistable(
              schemaOf(name).apply(cols.head).dataType)
            val idxSchema = spark.read.parquet(curIdx.toString).schema
            val ranges = ensureRangeManifest(curIdx, lead, leadPersistable,
              schema = Some(idxSchema))
            val (touched, untouched) = splitByKeyIntersect(ranges, keys)
            val touchedIdx =
              if (touched.isEmpty)
                spark.createDataFrame(spark.sparkContext.emptyRDD[Row], idxSchema)
              else spark.read.schema(idxSchema)
                .parquet(touched.map(e => curIdx.resolve(e.file).toString): _*)
            // exact-tuple removal, null-safe on ik (an indexed column
            // may be null); adds are the post-image entries
            val entryCols = ikCols :+ "rk"
            val cond = entryCols.map(c =>
              touchedIdx(c) <=> remove(c)).reduce(_ && _)
            val patched = touchedIdx.join(remove, cond, "left_anti")
              .unionByName(add)
            KvLayout.writeSorted(patched, ikCols, nextIdxDir.toString)
            // scan only the freshly-written files (untouched not yet
            // linked in), then record new + carried entries — the
            // table merge's carry-forward pattern
            val newIdxEntries = scanRanges(nextIdxDir, lead,
              schema = Some(idxSchema))
            untouched.foreach(e =>
              linkOrCopy(curIdx.resolve(e.file), nextIdxDir.resolve(e.file)))
            if (leadPersistable)
              writeRangeManifest(nextIdxDir, newIdxEntries ++ untouched)
            true
          }
        case _ => false
      }
      if (!incremental)
        KvLayout.writeSorted(kvEntriesOf(name, fullPost, cols), ikCols,
          nextIdxDir.toString)
      setIndexAsOf(name, iname, ty, next)
      nextIdxDir -> finalIdxDir
    }
    IndexMaintenance(renames, prevAsOf)
  }

  /** Output of [[maintainIndexes]]: the grant-scoped staged-dir →
    * final-name renames for [[publishVersion]], plus the pre-bump
    * as-of registry values for [[publishGuardingIndexAsOf]]'s
    * fence-failure rollback. */
  private case class IndexMaintenance(renames: Seq[(Path, Path)],
                                      prevAsOf: Seq[(String, String, Int)])

  /** Publish `next` with the kv-index as-of bumps UNWOUND on a throw
    * (the single-table analog of commitTxn's indexRollbacks): a
    * holder fenced out at publish would otherwise leave
    * asOfVersion=next with no data_v(next) index artifact ever
    * materialized — a later compact() publishing the same version
    * number would then make the registry claim freshness at `next`
    * while resolution silently falls back to the older dir. The
    * restore is guarded: only while the durable table version is
    * still BEHIND `next` and the registry still carries this
    * attempt's bump — if a new owner published `next` in the
    * meantime, the claim is its own (correct) maintenance, not ours
    * to unwind. */
  private def publishGuardingIndexAsOf(name: String, next: Int,
      staged: Seq[(Path, Path)], maint: IndexMaintenance): Unit =
    try publishVersion(name, next, staged = staged ++ maint.renames)
    catch {
      case e: Throwable =>
        try maint.prevAsOf.foreach { case (iname, ty, v) =>
          if (metaVersionOf(name) < next &&
              indexAsOfVersion(name, iname, ty) == next)
            setIndexAsOf(name, iname, ty, v)
        } catch { case _: Exception => () } // best-effort under a lost grant
        throw e
    }

  /** Rebuild one index at the live version (any flavor) — the SQL
    * surface is `CALL <cat>.system.refresh_index(...)`. The analytic
    * flavors' explicit-refresh model is the bulk analog of the
    * reference's out-of-band Lucene writer commit. */
  def refreshIndex(table: String, indexName: String, indexType: String): Unit =
    withWriteLock(table) {
      val (_, ty, cols) = indexesOf(table)
        .find(i => i._1 == indexName && i._2.equalsIgnoreCase(indexType))
        .getOrElse(throw new IllegalArgumentException(
          s"$table $indexName $indexType not registered"))
      val dir = indexDir(table, indexName, indexType)
      val cur = dataVersionOf(table)
      val t = this.table(table).df
      val pk = primaryKeyOf(table).head
      // refresh rebuilds AT the live version — a dir readers resolve
      // the moment it appears, so every write stages + renames
      ty.toUpperCase match {
        case "KV" =>
          writeIndexDirAtomic(dir, s"data_v$cur") { p =>
            KvLayout.writeSorted(kvEntriesOf(table, t, cols),
              ikColsOf(cols.size), p)
          }
        case "BITMAP" =>
          writeIndexDirAtomic(dir, s"data_v$cur") { p =>
            graft.index.BitmapIndex.build(t, pk, cols.head)
              .write.mode("overwrite").parquet(p)
          }
        case "FULLTEXT" =>
          // one tokenize pass carrying per-doc dl (positions →
          // postings → dictionary → norms/bmx/fz, no join back);
          // pos BEFORE data: readers pair the positional base at the
          // resolved data base's version, so a crash here must leave
          // the old (data, pos) pair live together. Rebuild with the
          // index's own analyzer.
          val posDl =
            graft.index.FullText.buildPositionalWithDl(t, pk, cols.head,
              indexAnalyzer(table, indexName)).cache()
          try {
            val postingsDl = graft.index.FullText
              .postingsWithDl(posDl).cache()
            try {
              // ONE action sizes every write (the createIndex recipe)
              val doclens = graft.index.FullText
                .doclensFromPostings(postingsDl).cache()
              try {
                val (nd, td) = aggDoclens(doclens)
                val partsDoc = ftRankedParts(nd)
                val partsTok = ftRankedParts(td)
                writeIndexDirAtomic(dir, s"pos_v$cur") { p =>
                  KvLayout.writeSorted(posDl.select("doc_id", "term", "pos"),
                    Seq("term"), p, partitions = partsTok)
                }
                // norms + block stats + fuzzy sidecar BEFORE data, like
                // pos/dict — they pair at the resolved data base's version
                val dict = graft.index.FullText.buildDictionary(
                  postingsDl.select("term", "doc_id", "tf"))
                writeIndexDirAtomic(dir, s"norms_v$cur") { p =>
                  KvLayout.writeSorted(doclens, Seq("doc_id"), p,
                    partitions = partsDoc)
                  writeNormMetaJson(Paths.get(p), nd, td)
                }
                writeIndexDirAtomic(dir, s"fz_v$cur") { p =>
                  writeFtFuzzy(dict, p, partsDoc)
                }
                schemaOf(table)(pk).dataType match {
                  case LongType | IntegerType =>
                    writeIndexDirAtomic(dir, s"bmx_v$cur") { p =>
                      KvLayout.writeSorted(
                        graft.index.FullText.buildBlockStatsWithDl(
                          postingsDl),
                        Seq("term"), p, partitions = partsDoc)
                    }
                  case _ => ()
                }
                writeIndexDirAtomic(dir, s"data_v$cur") { p =>
                  KvLayout.writeSorted(postingsDl.select("term", "doc_id", "tf"),
                    Seq("term", "doc_id"), p, partitions = partsTok)
                }
                // dict is versioned like the postings — rewriting a
                // shared dict/ in place would clobber the snapshot a
                // concurrent reader resolved
                writeIndexDirAtomic(dir, s"dict_v$cur") { p =>
                  KvLayout.writeSorted(dict, Seq("term"), p,
                    partitions = partsDoc)
                }
              } finally { doclens.unpersist(); () }
            } finally { postingsDl.unpersist(); () }
          } finally { posDl.unpersist(); () }
        case "VECTOR" =>
          // full corpus re-train at the live version; cent/vmeta land
          // before data for the same crash reasoning as the fold
          val built = graft.similarity.VectorIndex.build(t, pk, cols.head)
          try {
            writeIndexDirAtomic(dir, s"vmeta_v$cur") { p =>
              graft.similarity.VectorIndex.metaFrame(spark, built.meta)
                .write.mode("overwrite").parquet(p)
            }
            writeIndexDirAtomic(dir, s"cent_v$cur") { p =>
              built.centroids.write.mode("overwrite").parquet(p)
            }
            // an index serving graph-ANN rebuilds its graph with the
            // NEW coarse structure (a stale graph would key its lists
            // by the pre-refresh cluster ids, silently mismatching
            // every probe against the refreshed centroids). BEFORE
            // data, like cent/vmeta: readers pair the graph at the
            // resolved DATA base's version (vectorGraphView), so a
            // crash here leaves the old quadruple fully live and the
            // graph_v(cur) orphan unresolvable until data lands.
            locally {
              val oldGraph = resolveIndexVersioned(dir, "graph", cur)
              if (Files.exists(oldGraph)) {
                // rebuild at the persisted degree, and carry it forward
                val graphM = readGraphM(oldGraph)
                writeIndexDirAtomic(dir, s"graph_v$cur") { p =>
                  import org.apache.spark.sql.functions.col
                  graft.similarity.Hnsw.buildGraph(
                    built.entries.select(col("cluster"), col("rk"), col("v")),
                    graphM)
                    .write.mode("overwrite").parquet(p)
                  writeGraphM(p, graphM)
                }
              }
            }
            writeIndexDirAtomic(dir, s"data_v$cur") { p =>
              KvLayout.writeSorted(built.entries, Seq("cluster"), p)
            }
          } finally built.release()
        case other => throw new IllegalArgumentException(s"index type $other")
      }
      setIndexAsOf(table, indexName, indexType, cur)
    }

  def listIndexes(table: String): Seq[String] =
    if (!Files.exists(Paths.get(warehouse))) Seq.empty
    else withList(Paths.get(warehouse)) { it =>
      it.map(_.getFileName.toString)
        .filter(_.startsWith(s"$table.")).toList
    }.sorted

  /** Reference naming: {table}.{type}.{index} (HBaseSchema.kt:306,
    * README.md metadata scheme). */
  private def indexDir(table: String, indexName: String, indexType: String): Path =
    Paths.get(warehouse, s"$table.${indexType.toLowerCase}.$indexName")

  /** Flip the version pointer AND record the publish wall-clock in the
    * same meta write. `TIMESTAMP AS OF` resolves from this map, not
    * directory mtimes — lazy per-snapshot bookkeeping (e.g.
    * [[ensureRangeManifest]] dropping `_graft_ranges.json` into a
    * PREVIOUS snapshot dir when the next merge starts) bumps mtimes
    * long after publish, which would otherwise shift a snapshot's
    * apparent publish time forward. */
  private[graft] def publishVersion(table: String, version: Int,
                                    handle: Option[LockProvider.Handle] = None,
                                    staged: Seq[(Path, Path)] = Nil): Unit = {
    val h = handle.orElse(heldWriteLock.value)
    // commit-point fence: prove the lock is still ours BEFORE the
    // pointer swap (no-op for providers whose locks can't lapse)
    h.foreach(_.ensureValid())
    // CONDITIONAL COMMIT SWAP at the authority (the CommitStore seam,
    // throws when this grant is superseded): in one serialized
    // authority action the grant is fenced AND the authority-held
    // commit pointer advances to `version` — the fence and the
    // pointer move can no longer be split by a holder pause, so a
    // holder that lapses after this line has already serialized its
    // claim on the version number: any newer grant's swap lands
    // STRICTLY after it in the authority's monitor and allocates past
    // it, never onto it. Superseded (pointer already above `version`)
    // is not thrown — with the durable meta also at/above `version`
    // it is the legitimate replay (graceful skip below); with the
    // meta behind, a newer grant's commit is in flight and this
    // holder aborts before touching any final name. Providers without
    // an authority (file locks, in-process) return NoAuthority and
    // rely on the meta compare alone — for them the lock itself
    // cannot lapse, so the compare is already race-free under it.
    val swapRes = h.map(_.commitSwap(version.toLong))
    val authoritySuperseded = swapRes.exists {
      case LockProvider.Superseded(_) => true
      case _ => false
    }
    // true iff the authority says WE claimed this version number first
    // (pointer advanced from below it) — used to tell a legitimate
    // replay from a number stolen while this holder paused post-claim
    val claimedFirst = swapRes.exists {
      case LockProvider.Committed(prev) => prev < version.toLong
      case _ => false
    }
    val meta = readMeta(table)
    // fencing token at the swap ITSELF (ensureValid is check-then-act
    // — a lease can lapse between the check and this write): the meta
    // records the highest grant epoch that ever published; a holder
    // whose grant is OLDER than that has provably lost the lock to a
    // newer writer, and aborts here even when the validity check was
    // bypassed or raced. Token-less grants (epoch 0: file locks,
    // in-process semaphores — locks that cannot lapse while the
    // process lives) skip the compare, so a warehouse can move
    // between providers. Ordered BEFORE the monotonic skip below: a
    // lapsed lease-holder replaying a version the new owner already
    // published must fail loudly, not report silent success.
    // Residuals: (a) this read→compare→write is itself unfenced on
    // storage without conditional writes — CLOSED for providers with
    // a central authority by the commitSwap above (the authority
    // serializes the compare WITH the pointer move, so fence and swap
    // can't be split by a pause); still open for token-less /
    // file-lock providers, where the lock itself cannot lapse so the
    // compare runs under real exclusion anyway; (b) the staged data
    // write preceding this swap — CLOSED: every write path stages in
    // a grant-scoped unique dir ([[newSnapshotStaging]]) and the
    // version-numbered names materialize only below, AFTER the fences
    // pass, so a lapse mid-stage keeps the lapsed holder's bytes
    // inside its own dir; (c) the old fence→rename lapse window —
    // CLOSED for authority providers by the conditional swap: the
    // version number is claimed atomically with the fence, so a
    // post-swap lapse can't be overtaken onto the SAME number, and
    // the pre-writeMeta re-swap below re-proves the grant after the
    // renames. What remains is a lapse strictly between that re-proof
    // and the one writeMeta file op — a pure write with no
    // read→compare gap, the conditional-write-only floor. Analytic
    // SEGMENT appends run the same protocol inside
    // maintainAnalyticIndexes (stage root → fence → rename, before
    // the auto-fold consumes them), and the in-maintenance auto-fold
    // rides foldIndexStack's own stage→fence→rename with its
    // dict-before-data rename ordering preserved.
    val tok = h.map(_.fencingToken).getOrElse(0L)
    var epochAdvanced = false
    if (tok > 0L) {
      val seen = meta.path("fenceEpoch").asLong(0L)
      if (tok < seen)
        throw new IllegalStateException(
          s"fencing: grant epoch $tok for $table is behind published epoch " +
          s"$seen — this holder's lease lapsed and a newer writer has " +
          "committed; aborting instead of swapping the pointer over its work")
      if (tok > seen) { meta.put("fenceEpoch", tok): Unit; epochAdvanced = true }
    }
    // monotonic: every caller publishes forward (bulk writes, merges,
    // txn bumps, recovery roll-forward). The only path that could ask
    // to regress is a commit whose lock was wrongly broken mid-bump
    // (the documented residual double-break window, breakIfStale):
    // the breaker healed this txn's journal — publishing the SAME
    // version — and may have published its own write on top; replaying
    // the stale bump must not roll the newer snapshot back.
    if (meta.path("dataVersion").asInt() >= version) {
      // the authority tells a REPLAY from a STOLEN number: a holder
      // whose swap advanced the pointer from BELOW `version` was the
      // first (and, at the authority, only) claimant of this number —
      // finding the durable meta already at/above it means a newer
      // grant took the number over while this holder paused after its
      // claim. Its staged content was superseded, not replayed;
      // reporting silent success would drop a caller's write on the
      // floor. (A legitimate replay — journal roll-forward, a
      // breaker's heal — re-swaps a pointer already AT the version,
      // or runs on a provider with no authority, and keeps the
      // graceful skip.)
      if (claimedFirst)
        throw new IllegalStateException(
          s"fencing: this grant claimed version $version of $table first " +
          "at the authority, but a newer grant has published it while " +
          "this holder paused — the staged write was superseded, not " +
          "replayed; aborting instead of reporting success")
      // a replayed publish by the highest-epoch holder still has to
      // PERSIST its advanced epoch before this skip returns —
      // otherwise the fence compares against a stale on-disk value
      // and a lapsed holder with an intermediate epoch passes it
      if (epochAdvanced) writeMeta(table, meta)
      // replayed publish: the content is already live under its final
      // name (the breaker's heal renamed and bumped) — any staging
      // dirs THIS caller still holds are stale duplicates, never the
      // published bytes. Reclaim instead of leaving them for vacuum.
      staged.foreach { case (src, _) =>
        if (Files.exists(src)) deleteRecursively(src)
      }
      return
    }
    // authority pointer above `version` while the durable meta is
    // still behind it: a NEWER grant committed past this version and
    // its publish is in flight — materializing final names here could
    // interleave with that writer's renames. Abort with this holder's
    // bytes still quarantined in their grant-scoped staging dirs.
    if (authoritySuperseded)
      throw new IllegalStateException(
        s"fencing: authority commit pointer for $table has advanced past " +
        s"$version while the durable meta is behind — a newer grant's " +
        "commit is in flight; aborting instead of materializing over it")
    // post-fence materialization: the staged dirs take their
    // version-numbered names only now, behind every fence above — a
    // holder that lapsed mid-stage never got here, so it never wrote
    // a byte outside its own grant-scoped dir. A dst that already
    // exists is unpublished garbage from a CRASHED earlier writer
    // (the pointer below is still < version, so no reader ever
    // resolved it) — clear it so the rename lands.
    staged.foreach { case (src, dst) =>
      if (Files.exists(dst)) deleteRecursively(dst)
      Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    // re-prove the swap immediately before the durable pointer mirror:
    // idempotent at the authority (same grant, same `version`), and it
    // atomically re-verifies the grant is STILL the current one after
    // the renames above — a holder that lapsed mid-rename throws here
    // with the meta untouched (its renamed dirs are unpublished
    // orphans at final names; the next writer's rename clears them).
    // What remains is a lapse strictly between this re-proof and the
    // single writeMeta file op below — a pure-write residual with no
    // read→compare gap left to pause inside, closable only by a store
    // whose pointer write is itself conditional.
    h.foreach(_.commitSwap(version.toLong) match {
      case LockProvider.Superseded(cur) =>
        throw new IllegalStateException(
          s"fencing: authority commit pointer for $table advanced to $cur " +
          s"during materialization of $version — a newer grant committed; " +
          "aborting before the pointer mirror")
      case _ => ()
    })
    meta.put("dataVersion", version): Unit
    val times = meta.get("publishTimes") match {
      case o: ObjectNode => o
      case _ =>
        val o = mapper.createObjectNode()
        meta.set[JsonNode]("publishTimes", o): Unit
        o
    }
    times.put(version.toString, System.currentTimeMillis()): Unit
    writeMeta(table, meta)
  }

  private def setMetaAttr(table: String, attr: String, value: Any): Unit = {
    val meta = readMeta(table)
    value match {
      case i: Int    => meta.put(attr, i): Unit
      case b: Boolean => meta.put(attr, b): Unit
      case s         => meta.put(attr, s.toString): Unit
    }
    writeMeta(table, meta)
  }

  /** table.sys dump: one row with the reference's TableAttribute
    * fields (primary key, isTransactional, lock status, charset,
    * create time — HBaseTable.kt:197-216) plus graft's own layout/
    * version attributes. Metadata-only — no data scan. */
  def tableInfo(name: String): DataFrame = {
    val m = readMeta(name)
    val row = Row(name,
      m.path("primary").asText(),
      m.path("isTransactional").asBoolean(false),
      m.path("lockStatus").asText("UNLOCK"),
      m.path("charset").asText("UTF-8"),
      m.path("layout").asText("sorted"),
      m.path("comment").asText(""),
      // pre-upgrade tables lack createdAt: fall back to the recorded
      // v0 publish time (same instant for tables created since the
      // publishTimes map exists), else 0
      if (m.hasNonNull("createdAt")) m.path("createdAt").asLong()
      else m.path("publishTimes").path("0").asLong(0L),
      m.path("dataVersion").asInt(),
      m.withArray[ArrayNode]("indexes").size())
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1),
      StructType(Seq(
        StructField("table_name", StringType, false),
        StructField("primary_key", StringType, false),
        StructField("is_transactional", BooleanType, false),
        StructField("lock_status", StringType, false),
        StructField("charset", StringType, false),
        StructField("layout", StringType, false),
        StructField("comment", StringType, false),
        StructField("created_ms", LongType, false),
        StructField("data_version", IntegerType, false),
        StructField("n_indexes", IntegerType, false))))
  }

  /** column.sys dump: one row per column with the reference's
    * ColumnAttribute fields (datatype, position, nullable, primary,
    * default — HBaseSchema.kt:141-160) plus the table charset
    * (table.sys, HBaseTable.kt:197-216). */
  def describeTable(name: String): DataFrame = {
    val cs = charsetOf(name)
    val cols = readMeta(name).withArray[ArrayNode]("columns")
    val rows = cols.elements().asScala.map { c =>
      val default =
        if (!c.hasNonNull("metadata")) null
        else {
          val md = Metadata.fromJson(c.path("metadata").asText())
          if (md.contains("CURRENT_DEFAULT")) md.getString("CURRENT_DEFAULT")
          else null
        }
      Row(name, c.path("name").asText(), c.path("datatype").asText(),
        c.path("position").asInt(), c.path("nullable").asBoolean(),
        c.path("isPrimary").asBoolean(), default, cs)
    }.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("table_name", StringType, false),
        StructField("column_name", StringType, false),
        StructField("datatype", StringType, false),
        StructField("position", IntegerType, false),
        StructField("nullable", BooleanType, false),
        StructField("is_primary", BooleanType, false),
        StructField("column_default", StringType, true),
        StructField("charset", StringType, false))))
  }
}

object Catalog {
  /** Deterministic NATIVE ordering for driver-serving rowkeys:
    * numeric keys compare numerically (integral in long space,
    * fractional in double space), strings/booleans/date-times by
    * their own Comparable — matching the Spark path's ORDER BY on the
    * same column, where the old `_.toString` sort put rowkey 10 before
    * 9. Cross-family comparisons (a long vs a string — impossible for
    * one table's single-typed rowkey column) fall back to the
    * toString tie-break rather than throwing. */
  private[graft] val rowkeyOrd: Ordering[Any] = new Ordering[Any] {
    override def compare(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: java.lang.Float, y: java.lang.Number) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case (x: java.lang.Double, y: java.lang.Number) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case (x: java.lang.Number, y: java.lang.Float) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case (x: java.lang.Number, y: java.lang.Double) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case (x: java.lang.Number, y: java.lang.Number) =>
        java.lang.Long.compare(x.longValue(), y.longValue())
      case (x: String, y: String) => x.compareTo(y)
      case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
      case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
      case (x, y) => x.toString.compareTo(y.toString)
    }
  }
}

/** One manifest entry: per-file bounds of the LEADING key, plus —
  * for z-ordered tables — the SECOND key's bounds (`second`), so a
  * driver range scan on either z dimension prunes from the one
  * manifest read instead of opening O(files) footers cold. None =
  * written before the second-key upgrade or not a z table; such an
  * entry is never pruned on the second key (footers stand in).
  * `bloom` is the per-file rowkey Bloom bitset (the HBase StoreFile
  * BloomFilter ROW analog — see [[BloomBits]]): a driver point Get
  * whose keys all miss it skips the file BEFORE any footer read.
  * None (pre-upgrade entries, unsupported key types) never vetoes. */
private[graft] case class FileRange(file: String, lo: Any, hi: Any,
                                    second: Option[(Any, Any)] = None,
                                    bloom: Option[Array[Byte]] = None)

/** Process-wide parsed-manifest cache for the driver serving paths:
  * a manifest is parsed once per CONTENT (path, size, mtime) — the
  * same identity recipe as DriverRead's footer cache — instead of
  * once per get (driverMultiGetAt re-reads the manifest JSON on every
  * call, and with per-key-sized blooms the parse is no longer
  * trivial). Manifests publish via atomic rename, so a rewrite
  * normally changes the key; the writer ALSO invalidates the path
  * explicitly (same-length rewrite inside one mtime tick on a
  * coarse-clock filesystem would otherwise serve the stale parse).
  * Eviction is LRU at the cap — at production file counts the
  * hottest tables' manifests stay parsed instead of the whole cache
  * periodically cold-starting. A None parse (corrupt/mid-write
  * observation) is returned but never cached: the next read
  * re-parses — absence must not be pinned until the key changes. */
private[kv] object ManifestCache {
  private val cap = 4096
  private val cache =
    new java.util.LinkedHashMap[(String, Long, Long), Option[Seq[FileRange]]](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Option[Seq[FileRange]]])
          : Boolean = size() > cap
    }

  def cached(f: Path)(parse: => Option[Seq[FileRange]]): Option[Seq[FileRange]] = {
    val key = (f.toAbsolutePath.toString, Files.size(f),
      Files.getLastModifiedTime(f).toMillis)
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      // parse OUTSIDE the lock: a slow sidecar read must not block
      // every other table's cache hit
      val v = parse
      if (v.isDefined) cache.synchronized(cache.put(key, v)): Unit
      v
    }
  }

  /** Drop every cached parse of this path — the manifest writer's
    * explicit publish hook. */
  def invalidate(f: Path): Unit = {
    val p = f.toAbsolutePath.toString
    cache.synchronized {
      cache.keySet.removeIf(_._1 == p): Unit
    }
  }
}
