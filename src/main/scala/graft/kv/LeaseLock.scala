package graft.kv

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.JavaConverters._

/** Lease-based coordination-service locking — the [[LockProvider]]
  * implementation the reference gets from Redis
  * (RedisLockFactory.kt:16-30 / RedisLock.kt: a distributed lock with
  * TTL expiry, renewed by the holder, chosen by configuration). The
  * design is the standard public lease-lock recipe (a Redis
  * SET-NX-with-TTL / ZooKeeper-ephemeral analog): a grant carries a
  * lease; the holder heartbeats renewals; a holder that DIES stops
  * renewing and its lease expires, so the next waiter proceeds — the
  * crash-recovery story pid-liveness cannot provide across hosts, and
  * the mutual-exclusion story no file protocol can provide on an
  * object store without atomic create.
  *
  * [[LeaseLockServer]] is the minimal in-repo coordination service
  * (single authority, line-oriented TCP, three verbs) that proves the
  * seam end-to-end in ConcurrencySpec's two-JVM tests; a production
  * deployment swaps it for its real service behind the same
  * [[LeaseLockProvider]] wire calls.
  *
  * Protocol (one request per connection, one line each way):
  *   ACQUIRE <resource> <owner> <leaseMs>  -> OK <epoch> | BUSY <remainMs>
  *   RENEW   <resource> <owner> <leaseMs>  -> OK | GONE
  *   RELEASE <resource> <owner>            -> OK | GONE
  *   PUBLISH <resource> <owner> <epoch>    -> OK | FENCED <epoch> | GONE
  *   SWAP    <resource> <owner> <epoch> <next> -> OK <prev> | STALE <cur> | FENCED <epoch> | GONE
  * ACQUIRE is granted when the resource is free, its lease has
  * expired, or the same owner re-acquires (renewal semantics). Every
  * grant carries a server-wide monotonically increasing EPOCH — the
  * fencing token (the Chubby sequencer / ZooKeeper zxid recipe): a
  * later grant always sees a higher number, so storage that records
  * the highest epoch seen can reject a lapsed holder's write no
  * matter when it arrives. RENEW extends the lease but keeps the
  * grant's epoch (same acquisition, same token).
  *
  * PUBLISH is the compare-and-publish primitive: inside the
  * authority's one monitor it verifies the presented (owner, epoch)
  * IS the resource's current unexpired grant AND at least the highest
  * epoch ever published, then records the epoch as published — so a
  * commit point on storage WITHOUT conditional writes gets an atomic
  * fence check anyway (the authority serializes what the store
  * can't). A lapsed holder is rejected the moment a newer grant
  * EXISTS, before the new owner publishes anything. The published
  * register is in-memory (per authority lifetime); the durable fence
  * record stays the storage-side fenceEpoch stamp, which commit
  * points compare AFTER this call — the two layers compose across an
  * authority restart.
  *
  * SWAP is PUBLISH graduated into a commit coordinator (the
  * CommitStore seam): the same grant/epoch validation, plus a
  * CONDITIONAL advance of a per-resource commit POINTER, all inside
  * the one monitor — so the fence check and the pointer move can
  * never be split by a holder pause. `next` above the held pointer
  * advances it (OK, previous value returned); `next` EQUAL to it is
  * the idempotent re-swap a journal roll-forward or burned-number
  * takeover performs (OK — the grant check above already proves the
  * caller is the rightful current holder); `next` BELOW it means a
  * newer commit exists (STALE, pointer returned — the caller
  * adjudicates replay vs abort against the durable meta). Like the
  * published register, the pointer is in-memory per authority
  * lifetime; the durable pointer stays the storage-side meta, written
  * AFTER the swap, and a restarted authority simply re-learns the
  * floor from the swaps that follow.
  */
final class LeaseLockServer(port: Int = 0,
                            persistDir: Option[java.nio.file.Path] = None) {
  private case class Lease(owner: String, expiresAt: Long, epoch: Long)
  private val leases = new ConcurrentHashMap[String, Lease]()
  // highest epoch PUBLISHED per resource (the compare-and-publish
  // register); monotone within this authority's lifetime
  private val published = new ConcurrentHashMap[String, java.lang.Long]()
  // authority-held commit POINTER per resource (the SWAP verb's CAS
  // target); monotone within this authority's lifetime
  private val pointers = new ConcurrentHashMap[String, java.lang.Long]()
  // Epochs must outlive the SERVER process: table meta persists the
  // highest epoch that ever published (Catalog fenceEpoch), so a
  // restart that re-minted from 0 would fence out every legitimate
  // writer forever. Each grant takes max(counter+1, now-ms): strictly
  // increasing within a process, and across a restart the wall clock
  // re-anchors above any prior grant (the production analog: Redis
  // TIME+sequence, a ZooKeeper zxid — monotone tokens survive the
  // authority's restart). Stateless-mode residuals, both of the same
  // clock-vs-counter shape: (a) a clock stepped BACKWARDS past a
  // restart boundary, as for any wall-clock-anchored token; (b) a
  // SAME-MS BURST of ownership changes climbs the counter above the
  // wall clock (+1 per change), so a restart inside that overhang
  // re-anchors at `now` BELOW epochs already persisted in table
  // meta, fencing legitimate writers until the clock catches up.
  // `persistDir` closes (b) — and (a) for restarts, though not for a
  // clock stepped back UNDER a live process's counter — with a
  // durable epoch CEILING: the counter pre-allocates blocks of
  // EpochBlock epochs, persisting the ceiling (atomic tmp+move)
  // BEFORE any epoch under it is granted, so a restart re-anchors at
  // the ceiling — above every epoch that could ever have been handed
  // out — at one fsync per block instead of per grant (the ZooKeeper
  // zxid-epoch / Kafka producer-id-block recipe).
  private var epochCounter = 0L
  private var epochCeiling = 0L
  private val EpochBlock = 1024L
  private def ceilingFile = persistDir.map(_.resolve("epoch_ceiling"))
  private val running = new AtomicBoolean(false)
  private var server: ServerSocket = _

  // re-anchor ABOVE everything a prior incarnation could have granted
  ceilingFile.foreach { f =>
    if (java.nio.file.Files.exists(f)) {
      epochCeiling = new String(java.nio.file.Files.readAllBytes(f)).trim.toLong
      epochCounter = epochCeiling
    }
  }

  /** Extend the persisted ceiling past `epoch` before granting it.
    * The write is SYNCed (data reaches the device, not just the page
    * cache) and the directory entry is force()d after the atomic
    * move where the platform allows — a ceiling that could regress
    * across a POWER loss would re-mint epochs under ones already
    * persisted in table meta, the exact failure persistence exists
    * to close. Still one device sync per BLOCK of grants, not per
    * grant. */
  private def ensureCeiling(epoch: Long): Unit =
    ceilingFile.foreach { f =>
      if (epoch >= epochCeiling) {
        epochCeiling = epoch + EpochBlock
        val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp, epochCeiling.toString.getBytes,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.SYNC)
        java.nio.file.Files.move(tmp, f,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        // fsync the directory so the rename itself is durable; not
        // every filesystem lets a directory be opened for read —
        // best-effort there (the data sync above already holds)
        try {
          val dc = java.nio.channels.FileChannel.open(f.getParent,
            java.nio.file.StandardOpenOption.READ)
          try dc.force(true) finally dc.close()
        } catch { case _: Exception => () }
      }
    }

  def boundPort: Int = server.getLocalPort

  def start(): LeaseLockServer = {
    server = new ServerSocket(port)
    running.set(true)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val h = new Thread(() => handle(sock))
          h.setDaemon(true)
          h.start()
        } catch { case _: Exception => () } // socket closed on stop
      }
    }, "graft-lease-lock-server")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  private def handle(sock: Socket): Unit = {
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      val out = new PrintWriter(sock.getOutputStream, true)
      val line = in.readLine()
      if (line != null) out.println(respond(line.trim))
    } catch { case _: Exception => () }
    finally sock.close()
  }

  /** All grant/renew/release decisions serialize on one monitor —
    * resources number in the dozens and requests are a handful of
    * map operations; a single authority is the point of the design. */
  private def respond(line: String): String = synchronized {
    val now = System.currentTimeMillis()
    line.split("\\s+").toSeq match {
      case Seq("ACQUIRE", res, owner, leaseMs) =>
        val cur = leases.get(res)
        if (cur == null || cur.expiresAt <= now || cur.owner == owner) {
          // same-owner re-ACQUIRE keeps its grant's epoch (it is the
          // same acquisition retrying); any change of ownership mints
          // a fresh, strictly higher one
          val epoch =
            if (cur != null && cur.owner == owner) cur.epoch
            else {
              epochCounter = math.max(epochCounter + 1, now)
              ensureCeiling(epochCounter)
              epochCounter
            }
          leases.put(res, Lease(owner, now + leaseMs.toLong, epoch))
          s"OK $epoch"
        } else s"BUSY ${cur.expiresAt - now}"
      case Seq("PUBLISH", res, owner, epochStr) =>
        val epoch = epochStr.toLong
        val cur = leases.get(res)
        val pub = Option(published.get(res)).map(_.longValue).getOrElse(0L)
        if (cur == null || cur.expiresAt <= now)
          "GONE" // no current grant to validate against — cannot prove
        else if (cur.owner != owner || cur.epoch != epoch || epoch < pub)
          // a newer grant exists (or a newer publish landed): the
          // presented grant is superseded — atomically rejected here,
          // BEFORE the new owner publishes anything to storage
          s"FENCED ${math.max(cur.epoch, pub)}"
        else {
          published.put(res, java.lang.Long.valueOf(epoch)): Unit
          "OK"
        }
      case Seq("SWAP", res, owner, epochStr, nextStr) =>
        val epoch = epochStr.toLong
        val next = nextStr.toLong
        val cur = leases.get(res)
        val pub = Option(published.get(res)).map(_.longValue).getOrElse(0L)
        if (cur == null || cur.expiresAt <= now)
          "GONE" // no current grant to validate against — cannot prove
        else if (cur.owner != owner || cur.epoch != epoch || epoch < pub)
          s"FENCED ${math.max(cur.epoch, pub)}"
        else {
          val p = Option(pointers.get(res)).map(_.longValue).getOrElse(0L)
          if (next < p) s"STALE $p" // a newer commit already swapped past
          else {
            // next >= p: advance (or idempotently re-affirm) the
            // pointer AND record the epoch as published, atomically
            // with the grant check above
            pointers.put(res, java.lang.Long.valueOf(next)): Unit
            published.put(res, java.lang.Long.valueOf(epoch)): Unit
            s"OK $p"
          }
        }
      case Seq("RENEW", res, owner, leaseMs) =>
        val cur = leases.get(res)
        if (cur != null && cur.owner == owner && cur.expiresAt > now) {
          leases.put(res, Lease(owner, now + leaseMs.toLong, cur.epoch))
          "OK"
        } else "GONE"
      case Seq("RELEASE", res, owner) =>
        val cur = leases.get(res)
        if (cur != null && cur.owner == owner) { leases.remove(res); "OK" }
        else "GONE"
      case _ => "ERR"
    }
  }

  /** Test hook: force a lease's expiry into the past — simulates a
    * holder paused beyond its lease (the next ACQUIRE wins, the old
    * holder's next RENEW gets GONE), without real multi-second waits
    * in specs. Matches the exact resource OR any warehouse-qualified
    * form of it (`<resource>@<warehouseId>`, the Catalog lockResource
    * scheme) so specs name tables without computing the digest. */
  private[graft] def expireNow(resource: String): Unit = synchronized {
    leases.keySet().asScala
      .filter(r => r == resource || r.startsWith(resource + "@"))
      .foreach { r =>
        val cur = leases.get(r)
        if (cur != null)
          leases.put(r, Lease(cur.owner, 0L, cur.epoch)): Unit
      }
  }

  /** Test hook: drive the protocol without the TCP round-trip — lets
    * the durable-epoch spec mint a same-ms grant burst fast enough to
    * climb the counter above the wall clock. */
  private[graft] def handleLineForTest(line: String): String = respond(line)
}

/** [[LockProvider]] over a [[LeaseLockServer]] (or any service
  * speaking its three verbs). Each acquisition heartbeats a renewal
  * every leaseMs/3 from a daemon thread (leaseMs/6 after a failed
  * beat, so one transient miss doesn't burn most of a small lease);
  * release stops the heartbeat and frees the lease.
  *
  * Loss surfacing: a heartbeat that finds its lease GONE (the holder
  * was paused past its lease and someone else took over) marks the
  * handle lost; [[LockProvider.Handle.ensureValid]] then THROWS —
  * commit points call it so a lapsed holder fails loudly instead of
  * double-writing concurrently with the new owner (the reference's
  * RedisLock ensureValid contract). ensureValid also self-checks
  * against the locally-tracked lease expiry: a holder that resumes
  * from a pause LONGER than its lease cannot trust the last
  * heartbeat, so it re-proves ownership with a synchronous RENEW
  * before declaring itself valid. */
final class LeaseLockProvider(host: String, port: Int,
                              leaseMs: Long = 10000L) extends LockProvider {

  /** RPC timeouts scale with the lease: a renewal stuck for a fixed
    * 5 s against a 1.5 s lease would consume the whole lease before
    * the next beat. Floor keeps tiny test leases workable. */
  private val callTimeoutMs: Int =
    math.min(5000L, math.max(leaseMs / 5, 100L)).toInt

  private def call(req: String): String = {
    val sock = new Socket()
    try {
      sock.connect(new java.net.InetSocketAddress(host, port), callTimeoutMs)
      sock.setSoTimeout(callTimeoutMs)
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      out.println(req)
      val resp = in.readLine()
      if (resp == null) "ERR" else resp
    } finally sock.close()
  }

  override def acquire(resource: String, timeoutMs: Long): LockProvider.Handle = {
    val owner = s"${ProcessHandle.current().pid()}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val deadline = System.currentTimeMillis() + timeoutMs
    // tracked lease expiry (grant/renewal time + leaseMs): the
    // holder-side lower bound on when the service may hand the lock
    // to someone else. Conservative — set BEFORE the RPC, so clock
    // skew and RPC latency only make the holder doubt itself sooner.
    val expiresAt = new java.util.concurrent.atomic.AtomicLong(0L)
    var granted = false
    var epoch = 0L
    while (!granted) {
      val sentAt = System.currentTimeMillis()
      // a transient connection failure (service restarting, SYN
      // dropped) retries like BUSY until the deadline — same
      // semantics as a BUSY response, instead of failing the acquire
      // on the first network hiccup
      val resp = try call(s"ACQUIRE $resource $owner $leaseMs")
        catch { case e: Exception => s"ERR ${e.getClass.getSimpleName}" }
      resp.split("\\s+").toSeq match {
        case "OK" +: rest =>
          // the grant's fencing epoch (absent only against a
          // pre-epoch server — then 0, i.e. token-less)
          epoch = rest.headOption
            .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
          expiresAt.set(sentAt + leaseMs); granted = true
        case _ =>
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"write lock on $resource held past ${timeoutMs}ms ($resp)")
          Thread.sleep(math.min(100L, math.max(leaseMs / 10, 10L)))
      }
    }
    val grantedEpoch = epoch
    val released = new AtomicBoolean(false)
    val lost = new AtomicBoolean(false)
    def renewOnce(): String = {
      val sentAt = System.currentTimeMillis()
      val r = try call(s"RENEW $resource $owner $leaseMs")
        catch { case _: Exception => "ERR" } // transient — caller retries
      if (r == "OK") expiresAt.set(sentAt + leaseMs)
      else if (r == "GONE") lost.set(true)
      r
    }
    val hb = new Thread(() => {
      var lastOk = true
      while (!released.get() && !lost.get()) {
        // after a failed beat renew at double cadence: the lease is
        // now burning down with no confirmed renewal behind it
        Thread.sleep(math.max(leaseMs / (if (lastOk) 3 else 6), 10L))
        if (!released.get()) lastOk = renewOnce() == "OK"
      }
    }, s"graft-lease-heartbeat-$resource")
    hb.setDaemon(true)
    hb.start()
    new LockProvider.Handle {
      override def fencingToken: Long = grantedEpoch
      override def release(): Unit = {
        if (released.compareAndSet(false, true)) {
          try { call(s"RELEASE $resource $owner"); () }
          catch { case _: Exception => () } // lease will expire on its own
        }
      }
      private def fail(why: String): Nothing = throw new IllegalStateException(
        s"lease on $resource lost by $owner ($why) — another writer may " +
        "hold the lock; abort instead of double-writing")
      override def ensureValid(): Unit = {
        if (released.get()) fail("already released")
        if (lost.get()) fail("service reports lease taken over")
        // past the locally-tracked expiry the last heartbeat proves
        // nothing (a GC/VM pause longer than the lease) — re-prove
        // ownership synchronously; a transient failure here cannot
        // prove validity, so it fails too (safe direction)
        if (System.currentTimeMillis() >= expiresAt.get()) {
          if (renewOnce() != "OK") fail("could not re-prove lease past expiry")
        }
      }
      override def fencedPublish(): Boolean = {
        if (released.get()) fail("already released")
        if (lost.get()) fail("service reports lease taken over")
        // transient connection failures retry briefly; an authority
        // that stays unreachable CANNOT vouch for the grant, and an
        // unproven publish is exactly what this primitive exists to
        // prevent — fail in the safe direction (same reasoning as
        // ensureValid past expiry)
        var resp = "ERR"
        var attempt = 0
        while (resp == "ERR" && attempt < 3) {
          if (attempt > 0) Thread.sleep(math.min(100L, math.max(leaseMs / 10, 10L)))
          resp = try call(s"PUBLISH $resource $owner $grantedEpoch")
            catch { case _: Exception => "ERR" }
          attempt += 1
        }
        resp.split("\\s+").toSeq match {
          case Seq("OK") => true
          case "FENCED" +: rest =>
            lost.set(true)
            fail(s"fencing: authority reports grant epoch $grantedEpoch " +
              s"superseded by ${rest.headOption.getOrElse("?")} at publish")
          case Seq("GONE") =>
            lost.set(true)
            fail("authority has no current grant for this holder at publish")
          case other =>
            fail(s"authority unreachable at publish ($other) — cannot " +
              "prove the grant is current")
        }
      }
      override def commitSwap(next: Long): LockProvider.SwapResult = {
        if (released.get()) fail("already released")
        if (lost.get()) fail("service reports lease taken over")
        // same retry/fail-safe stance as fencedPublish: an authority
        // that stays unreachable cannot vouch for the swap, and an
        // unproven commit pointer move is what this verb prevents
        var resp = "ERR"
        var attempt = 0
        while (resp == "ERR" && attempt < 3) {
          if (attempt > 0) Thread.sleep(math.min(100L, math.max(leaseMs / 10, 10L)))
          resp = try call(s"SWAP $resource $owner $grantedEpoch $next")
            catch { case _: Exception => "ERR" }
          attempt += 1
        }
        resp.split("\\s+").toSeq match {
          case Seq("OK", prev) =>
            LockProvider.Committed(
              scala.util.Try(prev.toLong).getOrElse(0L))
          case Seq("STALE", cur) =>
            LockProvider.Superseded(
              scala.util.Try(cur.toLong).getOrElse(Long.MaxValue))
          case "FENCED" +: rest =>
            lost.set(true)
            fail(s"fencing: authority reports grant epoch $grantedEpoch " +
              s"superseded by ${rest.headOption.getOrElse("?")} at commit swap")
          case Seq("GONE") =>
            lost.set(true)
            fail("authority has no current grant for this holder at commit swap")
          case other =>
            fail(s"authority unreachable at commit swap ($other) — cannot " +
              "prove the grant is current")
        }
      }
    }
  }
}
