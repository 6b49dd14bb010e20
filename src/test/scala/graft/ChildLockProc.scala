package graft

import graft.kv.FsLockProvider
import java.nio.file.{Files, Paths}

/** Child-JVM side of the cross-process lock/commit tests
  * (ConcurrencySpec): a real second process that acquires the SAME
  * lock files a [[graft.kv.Catalog]] uses, so pid-liveness stale
  * breaking and mid-commit crash recovery are exercised across true
  * process boundaries — not simulated with hand-written pids inside
  * one JVM. No SparkSession: lock + journal + meta are plain files.
  *
  * Modes (args: mode warehouse table [...]):
  *  - acquire-hold: take the table's write lock, print ACQUIRED, hold
  *    it until stdin closes, release cleanly, exit.
  *  - acquire-die: take the lock, print ACQUIRED, halt(0) WITHOUT
  *    releasing — the dead-owner lock a later writer must break.
  *  - crash-commit (extra args: otherTable next): reconstruct a
  *    committer that died mid-commit: roll `table`'s meta back to
  *    next-1, journal publishes for BOTH tables at `next`, take
  *    `table`'s lock, print ACQUIRED, halt — leaving a pending
  *    journal AND a dead-owner lock for the parent to recover.
  *  - acquire-publish (lease only): take the lease, print ACQUIRED,
  *    wait for one stdin line (during which the parent expires the
  *    lease and acquires a newer grant), then attempt the
  *    authority-side compare-and-publish and print PUBLISH-OK or
  *    PUBLISH-FENCED — the lapsed holder's publish racing a newer
  *    grant across a TRUE process boundary.
  */
object ChildLockProc {
  def main(args0: Array[String]): Unit = {
    // optional trailing "--lease=<port>:<leaseMs>" switches the child
    // onto the lease provider against the parent's LeaseLockServer —
    // the same modes then exercise lease expiry instead of
    // pid-liveness as the stale-break mechanism. Optional
    // "--lockres=<resource>" names the authority-side resource to
    // acquire when it differs from the table name (the Catalog
    // qualifies lease resources with a warehouse id); file paths keep
    // using the bare table name.
    val (flags, args) = args0.partition(_.startsWith("--"))
    val leaseSpec = flags.find(_.startsWith("--lease="))
    val mode = args(0)
    val wh = args(1)
    val table = args(2)
    val lockRes = flags.find(_.startsWith("--lockres="))
      .map(_.stripPrefix("--lockres=")).getOrElse(table)
    val provider: graft.kv.LockProvider = leaseSpec match {
      case Some(spec) =>
        val Array(port, lease) = spec.stripPrefix("--lease=").split(":")
        new graft.kv.LeaseLockProvider("127.0.0.1", port.toInt, lease.toLong)
      case None => new FsLockProvider(r => Paths.get(wh, r))
    }
    mode match {
      case "acquire-hold" =>
        val h = provider.acquire(lockRes, 30000)
        println("ACQUIRED"); Console.flush()
        while (System.in.read() != -1) {}
        h.release()

      case "acquire-die" =>
        provider.acquire(lockRes, 30000)
        println("ACQUIRED"); Console.flush()
        Runtime.getRuntime.halt(0)

      case "acquire-publish" =>
        val h = provider.acquire(lockRes, 30000)
        println("ACQUIRED"); Console.flush()
        // wait for the parent's go-signal (one line), then race
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in))
        r.readLine()
        val verdict =
          try { h.fencedPublish(); "PUBLISH-OK" }
          catch { case _: IllegalStateException => "PUBLISH-FENCED" }
        println(verdict); Console.flush()

      case "crash-commit" =>
        val other = args(3)
        val next = args(4).toInt
        provider.acquire(lockRes, 30000)
        // the committer's work up to the crash: other's pointer bumped
        // to `next` already (by the parent's real commit); this table's
        // meta rolled back to the pre-image, journal in place
        val meta = Paths.get(wh, table, "_graft_meta.json")
        Files.writeString(meta, Files.readString(meta)
          .replace(s""""dataVersion":$next""", s""""dataVersion":${next - 1}"""))
        val txnDir = Paths.get(wh, "_graft_txn")
        Files.createDirectories(txnDir)
        Files.writeString(txnDir.resolve("_graft_txn_childcrash.json"),
          s"""{"publishes":[{"table":"$other","next":$next},{"table":"$table","next":$next}]}""")
        println("ACQUIRED"); Console.flush()
        Runtime.getRuntime.halt(0)
    }
  }
}
