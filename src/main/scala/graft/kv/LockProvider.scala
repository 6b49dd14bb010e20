package graft.kv

import java.nio.file.{Files, Path}

/** Writer mutual-exclusion backend for a warehouse — the pluggable
  * seam the reference gives its Lucene writers via
  * `RedisLockFactory.kt:16-30` / `RedisLock.kt:9` (cross-process DDL
  * locks through a coordination service, chosen by configuration).
  *
  * The default [[FsLockProvider]] serializes writers with an atomic
  * create of a lock file: correct for any number of processes sharing
  * a POSIX filesystem (local disk, NFS with O_EXCL, HDFS). Its
  * STALE-BREAK, though, verifies owner liveness through the host-local
  * process table, so it only breaks locks owned by processes of the
  * SAME host; a lock abandoned by a crashed process on another host is
  * never broken automatically (waiters time out instead) — multi-host
  * deployments that need automatic crash recovery should plug a
  * lease-based provider (coordination service) through this seam.
  *
  * Object-store caveat: on a store WITHOUT an atomic
  * create-if-absent primitive (plain S3 before conditional writes),
  * NO file-based protocol can provide mutual exclusion — two writers
  * can both "create" the lock and both win. Sharing a warehouse there:
  * swap in [[LeaseLockProvider]] (LeaseLock.scala) — the lease-based
  * coordination-service provider (the reference's Redis lock analog;
  * same recipe as a DynamoDB conditional put or ZooKeeper/etcd
  * leases), with crash recovery by lease expiry instead of
  * pid-liveness, proven across real process boundaries in
  * ConcurrencySpec's two-JVM tests. This trait is exactly that seam:
  * every table write lock, transaction commit and DDL lock resolves
  * through whichever provider [[Catalog]] is handed.
  */
trait LockProvider {
  /** Block until the named resource's lock is held, or fail after
    * `timeoutMs`. Implementations must be safe to call from multiple
    * processes (or document that they are single-process, like
    * [[InMemoryLockProvider]]) and should break locks whose owner
    * provably died, so one crash doesn't wedge the warehouse. */
  def acquire(resource: String, timeoutMs: Long): LockProvider.Handle
}

object LockProvider {
  /** A held lock. `release()` must be idempotent and must tolerate
    * the lock's backing state having been removed out from under it
    * (dropTable deletes the whole table dir, lock file included,
    * while holding the lock). */
  trait Handle {
    def release(): Unit

    /** Fail-loudly fencing check, called at COMMIT points (just
      * before a version-pointer swap / transaction journal): throw if
      * this acquisition can no longer be proven to hold the lock —
      * the reference's RedisLock exposes ensureValid() for exactly
      * this. Lease-based providers lose a lock silently when the
      * holder pauses past its lease and another writer takes over;
      * without this check the lapsed holder would double-write
      * concurrently with the new owner. Providers whose locks cannot
      * lapse while the process lives (file create, in-process
      * semaphore) keep the no-op default. */
    def ensureValid(): Unit = ()

    /** Fencing token (Chubby/ZooKeeper sequencer recipe): a number
      * that grows with every grant the provider hands out, 0 when the
      * provider issues none. ensureValid is check-then-act — a lease
      * can lapse between the check and the meta write — so the commit
      * point ALSO stamps this token into the table meta and refuses
      * the swap when the meta already carries a HIGHER one: a lapsed
      * holder then fails at the write itself, no matter how it got
      * past the check. Providers whose locks cannot lapse keep 0
      * (the stamp-and-compare is skipped for token-less grants, so a
      * warehouse can move between providers). */
    def fencingToken: Long = 0L

    /** Compare-and-publish AT THE AUTHORITY: atomically prove this
      * grant is still the resource's CURRENT one and record its epoch
      * as published, inside the authority's own serialization — the
      * primitive that makes the commit-point fence atomic even on
      * storage without conditional writes, where the meta-stamp
      * compare is itself an unfenced read→compare→write. Throws
      * (same contract as ensureValid) when the authority reports the
      * grant superseded — a newer grant EXISTS, whether or not its
      * holder has published yet. Returns true when the authority
      * performed the atomic compare; false (the default) when the
      * provider has no central authority to ask (file locks,
      * in-process semaphores — locks that cannot lapse, where the
      * meta-stamp compare alone is already race-free because the lock
      * itself still excludes). */
    def fencedPublish(): Boolean = false

    /** Conditional COMMIT-POINTER swap at the authority — the
      * CommitStore seam ([[fencedPublish]] graduated from a fence
      * into a commit coordinator): in ONE serialized authority action,
      * prove this grant is the resource's current one (else throw,
      * the fencedPublish contract) AND advance the authority-held
      * commit pointer to `next`. The pointer makes the publish itself
      * conditional: a holder that lapses after this call can no
      * longer be overtaken-then-overwrite, because any newer grant's
      * swap is serialized against this one by the same monitor, and a
      * superseded grant's swap is rejected the moment the newer grant
      * exists — the fence and the pointer move can never be split by
      * a pause. Re-swapping the same `next` by the rightful current
      * grant is idempotent (the journal roll-forward / burned-number
      * takeover case). Returns [[LockProvider.Committed]] when the
      * authority swapped (or re-affirmed) the pointer,
      * [[LockProvider.Superseded]] when the pointer already sits
      * ABOVE `next` (a newer commit exists — the caller decides
      * replay-skip vs abort against the durable meta), and the
      * default [[LockProvider.NoAuthority]] for providers without a
      * central authority, whose locks cannot lapse and whose commit
      * compare therefore runs race-free under the lock itself. The
      * pointer lives for the authority's lifetime; the durable layer
      * stays the storage-side meta, and the two compose exactly like
      * the published-epoch register. */
    def commitSwap(next: Long): LockProvider.SwapResult =
      LockProvider.NoAuthority
  }

  /** Outcome of [[Handle.commitSwap]]. */
  sealed trait SwapResult
  /** The authority atomically fenced the grant and advanced (or
    * re-affirmed) the resource's commit pointer to the requested
    * version; `prev` is the pointer it replaced. */
  final case class Committed(prev: Long) extends SwapResult
  /** The authority's pointer already sits above the requested version
    * — a NEWER grant committed past it. Not thrown: with the durable
    * meta also past the version this is a legitimate replay
    * (graceful skip); below it, the caller must abort. */
  final case class Superseded(current: Long) extends SwapResult
  /** Provider has no central authority (file locks, in-process
    * semaphores) — locks that cannot lapse, where the meta compare
    * under the lock is already race-free. */
  case object NoAuthority extends SwapResult
}

/** Default: one lock file per resource under `dir(resource)`, held by
  * atomic `Files.createFile`. Stale locks (owner pid no longer alive,
  * or never tagged within a grace window) are broken via an atomic
  * rename to a tombstone, with a tag re-check so a live owner that
  * re-acquired in the race window gets its lock put back — the
  * single-filesystem analog of the reference's Redis lease expiry. */
final class FsLockProvider(dir: String => Path,
                           lockFileName: String = "_graft_write.lock")
    extends LockProvider {

  override def acquire(resource: String, timeoutMs: Long): LockProvider.Handle = {
    val lock = dir(resource).resolve(lockFileName)
    val deadline = System.currentTimeMillis() + timeoutMs
    // owner tag (pid + acquire time + nonce + host): lets a later
    // waiter detect a lock whose owner JVM died before the finally
    // could release it, and lets release() prove the file is still
    // THIS acquisition's. breakIfStale parses the leading pid and the
    // host; the nonce makes the tag unique even for same-pid
    // same-millisecond re-acquisitions. The host matters on shared
    // filesystems: pid liveness is only answerable for processes of
    // THIS host — without it, a waiter on host B would read host A's
    // pid, miss it in B's local process table, and "stale-break" a
    // LIVE writer's lock, admitting two concurrent writers.
    val tag = s"${ProcessHandle.current().pid()} ${System.currentTimeMillis()} " +
      java.util.UUID.randomUUID().toString.take(8) + " " + FsLockProvider.host
    var acquired = false
    while (!acquired) {
      try {
        Files.createFile(lock)
        Files.writeString(lock, tag)
        acquired = true
      }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        breakIfStale(lock)
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"write lock on $resource held past ${timeoutMs}ms — stale lock at $lock?")
        Thread.sleep(50)
      }
    }
    // Tag-verified release: if a waiter stale-broke this lock (pid
    // reuse, or a mid-acquire grace-window break) and another writer
    // re-acquired, the file on disk now carries the NEW owner's tag —
    // a blind delete-by-path would evict that live owner and let a
    // third writer into the critical section. Only delete on tag
    // match. NoSuchFile is fine (dropTable removes the whole table
    // dir, lock included, while holding the lock); any other read
    // failure falls back to the unconditional delete rather than
    // wedging the resource behind our own still-alive pid.
    () => {
      val cur = try Some(Files.readString(lock).trim)
        catch {
          case _: java.nio.file.NoSuchFileException => Some("")
          case _: Exception => None
        }
      cur match {
        case Some(c) => if (c == tag) Files.deleteIfExists(lock): Unit
        case None => Files.deleteIfExists(lock): Unit
      }
    }
  }

  /** Stale-lock recovery: a lock whose recorded owner process is no
    * longer alive (crashed between createFile and the finally) is
    * broken so later writers don't spin to the timeout. A lock with no
    * readable owner tag yet is only considered abandoned after a grace
    * window (the owner writes the tag right after createFile). Breaking
    * is an atomic rename to a unique tombstone — of several concurrent
    * waiters only one rename succeeds, and a lock released-and-
    * reacquired in between simply fails the rename and is left alone. */
  private def breakIfStale(lock: Path): Unit = {
    try {
      val txt = try Files.readString(lock).trim catch { case _: Exception => "" }
      val tokens = txt.split("\\s+")
      val ownerPid = tokens.headOption
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      // ProcessHandle.of answers for THIS host's process table only.
      // A 4-token tag carries the owner's host (older 3-token tags
      // predate it and were always written by this host's JVMs in a
      // single-host warehouse): if the owner lives on another host,
      // its pid is unanswerable here — never break, let the waiter
      // time out rather than evict a possibly-live remote writer.
      val sameHost = tokens.length < 4 || tokens(3) == FsLockProvider.host
      val stale = ownerPid match {
        case Some(pid) if sameHost =>
          val h = ProcessHandle.of(pid)
          !(h.isPresent && h.get.isAlive)
        case Some(_) => false
        case None => // tag never written: owner died mid-acquire
          System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis > 60000L
      }
      if (stale) {
        val tomb = lock.resolveSibling(
          s".lock_broken_${java.util.UUID.randomUUID().toString.take(8)}")
        Files.move(lock, tomb, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        // The rename is by PATH, not identity: between the staleness
        // read above and the move, another waiter may have broken the
        // lock and a LIVE writer re-acquired it — in which case the
        // file just moved away is the live owner's. Verify the moved
        // file still carries the tag judged stale (pid+millis, unique
        // per acquisition); on mismatch put it straight back (rename
        // replaces atomically). Residual: a writer that createFile'd
        // in the microseconds between the two renames is clobbered by
        // the restore — that needs a second break-and-reacquire inside
        // this window, vs. the unchecked version where ONE
        // break-and-reacquire anywhere in the wait loop discarded a
        // live lock.
        val movedTag = try Files.readString(tomb).trim catch { case _: Exception => "" }
        if (movedTag == txt) { Files.deleteIfExists(tomb): Unit }
        else Files.move(tomb, lock,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      }
    } catch { case _: Exception => () } // lost a race with release/another breaker — retry loop continues
  }
}

object FsLockProvider {
  /** This host's identity for lock-owner tags, resolved once. The
    * fallback must be unique PER JVM, not a shared constant: two hosts
    * that both fail hostname lookup would otherwise see each other's
    * tags as same-host and pid-stale-break a live remote writer — the
    * exact two-concurrent-writers hazard the host token exists to
    * close. The same reasoning covers lookups that SUCCEED but return
    * a name every misconfigured box shares ("localhost", loopback
    * literals): such a name can't distinguish hosts either, so it gets
    * the per-JVM token too. The cost of the token is that same-host
    * stale-breaking of a dead JVM's lock no longer engages on such a
    * box (tags never compare equal → waiters time out instead) — the
    * safe direction: a missed stale-break costs a timeout, a false
    * same-host match can break a LIVE remote writer's lock. */
  private[kv] val host: String = {
    val resolved =
      try Some(java.net.InetAddress.getLocalHost.getHostName)
      catch { case _: Exception => None }
    // degenerate = any name every misconfigured box shares: every
    // localhost variant (localhost, localhost.localdomain, RHEL's
    // localhost6/localhost6.localdomain6, Debian's ip6-localhost —
    // all contain "localhost"), Debian's ip6-loopback, IPv4 loopback
    // literals (the whole 127/8 block), and the IPv6 loopback in BOTH
    // of Java's renderings ("::1" and the expanded "0:0:0:0:0:0:0:1"
    // that getHostName actually produces)
    def degenerate(h: String): Boolean = {
      val l = h.toLowerCase(java.util.Locale.ROOT)
      l.isEmpty || l.contains("localhost") || l.contains("loopback") ||
        l.startsWith("127.") || l == "::1" || l == "0:0:0:0:0:0:0:1"
    }
    resolved.filterNot(degenerate)
      .getOrElse(s"unknown-${ProcessHandle.current().pid()}-" +
        java.util.UUID.randomUUID().toString.take(8))
  }
}

/** Single-process provider: JVM-local semaphores keyed by resource.
  * For embedded/test use (and the proof that [[Catalog]] really
  * resolves every lock through the trait) — it provides NO
  * cross-process exclusion and no stale-owner breaking (an in-process
  * owner cannot die without the JVM dying). */
final class InMemoryLockProvider extends LockProvider {
  private val sems =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Semaphore]()

  /** Acquisitions counted so a spec can prove the seam is exercised. */
  val acquireCount = new java.util.concurrent.atomic.AtomicLong(0)

  override def acquire(resource: String, timeoutMs: Long): LockProvider.Handle = {
    val sem = sems.computeIfAbsent(resource,
      _ => new java.util.concurrent.Semaphore(1, true))
    if (!sem.tryAcquire(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"write lock on $resource held past ${timeoutMs}ms")
    acquireCount.incrementAndGet(): Unit
    // idempotent release: a double-release must not grant a phantom
    // permit to the next waiter
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => { if (released.compareAndSet(false, true)) sem.release() }
  }
}
