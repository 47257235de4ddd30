package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Coarse advisory WRITER LOCK for table mutations — the serialization
  * complement to the upsert/compaction race GUARDS: the guards detect a
  * concurrent writer and abort (correct, but one writer loses its work);
  * with the lease, cooperating batch writers queue on a marker and all
  * complete.
  *
  * Mechanics (over a pluggable [[LeaseStore]]):
  *  - The lock is ONE marker (default: a file under
  *    `<warehouse>/_locks/<name>.lock`) holding the holder's random
  *    token. Acquisition is the store's atomic create-if-absent.
  *  - The LEASE is the marker's modification time: a lock older than
  *    `leaseMs` is presumed abandoned (holder crashed mid-operation) and
  *    may be stolen. Stealing renames the stale marker to a tombstone
  *    first — rename is atomic, so of N contenders exactly one wins the
  *    steal; everyone then re-races the create.
  *  - Release deletes the marker ONLY if it still holds the caller's
  *    token. A token mismatch means the lease expired mid-operation and
  *    another writer took over — release then throws, because mutual
  *    exclusion was already violated and the table needs a look; size
  *    `leaseMs` well above the longest expected mutation.
  *
  * BACKEND CONTRACT: correctness of the arbitration rests on the store's
  * atomic create-if-absent and atomic rename. The default
  * [[HadoopLeaseStore]] has them on HDFS-like stores (HDFS server-side;
  * the `file:` scheme via an O_EXCL `CREATE_NEW` NIO create, atomic
  * across PROCESSES at the kernel — the driver-verify-racing-a-local-
  * bench case — not just across threads of one JVM). On object stores
  * whose Hadoop connector only emulates them (S3A: check-then-put
  * create, copy+delete rename) two contenders can both "win" —
  * [[HadoopLeaseStore]] does not pretend to close that gap. There,
  * plug in a [[LeaseStore]] over a real coordination primitive
  * (DynamoDB conditional put, ZooKeeper ephemeral nodes, a database
  * row) — the lock protocol above is backend-agnostic and spec-tested
  * against an in-memory store — or use a transaction-log table format
  * instead. Known residual window even on conforming stores: release's
  * token-check and delete are two calls, so a lease that expires in the
  * instant between them can delete a thief's fresh marker instead of
  * throwing; `leaseMs` far above the operation duration is the actual
  * safety margin, the loud-failure release is the backstop for gross
  * overruns.
  *
  * This is an ADVISORY lock for cooperating writers (all participants
  * must opt in); the detect-and-abort guards stay on regardless, so a
  * non-cooperating writer is still caught, just not serialized.
  */
object WriterLease {

  /** Tunables for lease-serialized writers. `leaseMs` must sit well above
    * the longest expected mutation (it is the mutual-exclusion safety
    * margin); `waitMs` bounds how long a queued writer polls before
    * giving up loudly — a cooperating writer queued behind an operation
    * longer than `waitMs` throws a timeout, so raise BOTH for slow
    * mutations.
    */
  final case class Lease(leaseMs: Long = 10 * 60 * 1000L,
                         waitMs: Long = 60 * 1000L)

  /** Arbitration primitives a lock backend must provide. `key` is an
    * opaque lock identity (the default store uses it as a file path; a
    * database-backed store can use it as a row key). All four must be
    * safe under concurrent callers; `createExclusive` and `rename` must
    * be ATOMIC — exactly one concurrent caller may succeed.
    */
  trait LeaseStore {
    /** Atomically create the marker holding `token` iff absent. */
    def createExclusive(key: String, token: String): Boolean
    /** Holder token, or None if the marker is absent/unreadable. */
    def readToken(key: String): Option[String]
    /** Marker age source: last modification epoch-millis, if present. */
    def modificationTime(key: String): Option[Long]
    /** Atomic rename; false if the source vanished or the store lost the
      * race. Exactly one of N concurrent renamers of `key` may win.
      */
    def rename(key: String, toKey: String): Boolean
    /** Best-effort delete (idempotent). */
    def delete(key: String): Unit
    /** Conditional delete: remove the marker iff it still holds `token`,
      * returning whether it did — the release primitive. Must be atomic
      * wherever the backend can provide it (a CAS/conditional-put store
      * makes it one operation; the Hadoop store closes the intra-JVM
      * check-then-delete window under its process gate, and documents
      * the residual cross-process instant).
      */
    def deleteIfToken(key: String, token: String): Boolean
  }

  /** Lock marker path for a table name (warehouse-level `_locks/` dir, so
    * upsert and compaction contend on the same file per table without any
    * catalog metadata lookup).
    */
  def lockPath(spark: SparkSession, name: String): Path =
    new Path(
      new Path(spark.conf.get("spark.sql.warehouse.dir"), "_locks"),
      name.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9_.]", "_") + ".lock")

  /** [[Lease]]-typed overload — the form the `serializeWriters` entry
    * points ([[TableStore.upsert]], [[Compaction]]) plumb through.
    */
  def withLock[T](spark: SparkSession, name: String, lease: Lease)
                 (f: => T): T =
    withLock(spark, name, lease.leaseMs, lease.waitMs)(f)

  /** Run `f` holding the named lock on the default (warehouse-file)
    * store. Waits up to `waitMs` (polling) for a live holder to release;
    * steals leases older than `leaseMs`.
    */
  def withLock[T](spark: SparkSession, name: String,
                  leaseMs: Long = 10 * 60 * 1000L,
                  waitMs: Long = 60 * 1000L)(f: => T): T = {
    val path = lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withLock(new HadoopLeaseStore(fs, path.getParent), path.toString,
      leaseMs, waitMs)(f)
  }

  /** Backend-agnostic core: run `f` holding `key` on `store`. */
  def withLock[T](store: LeaseStore, key: String, leaseMs: Long,
                  waitMs: Long)(f: => T): T = {
    require(leaseMs > 0 && waitMs >= 0, s"bad lease/wait: $leaseMs/$waitMs")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    while (!store.createExclusive(key, token)) {
      stealIfStale(store, key, leaseMs, token)
      if (!store.createExclusive(key, token)) {
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"timed out after ${waitMs}ms waiting for writer lock '$key' " +
              s"(held by ${store.readToken(key).getOrElse("<gone>")}); " +
              "a slow writer holds it, or raise waitMs")
        Thread.sleep(100)
      } else return runHolding(store, key, token, f)
    }
    runHolding(store, key, token, f)
  }

  // If f itself threw, a release failure — lost lease, or a pluggable
  // store's own error (connection loss, SDK exception) — must not REPLACE
  // f's exception: that would hide the root cause of the aborted write.
  // Attach ANY non-fatal release failure as suppressed instead; a release
  // failure after a SUCCESSFUL f still throws (mutual exclusion was
  // violated, or the backend is broken, and the caller must know).
  private def runHolding[T](store: LeaseStore, key: String, token: String,
                            f: => T): T = {
    var failure: Throwable = null
    try f
    catch { case t: Throwable => failure = t; throw t }
    finally {
      try release(store, key, token)
      catch {
        case scala.util.control.NonFatal(r) =>
          if (failure != null) failure.addSuppressed(r) else throw r
      }
    }
  }

  private def stealIfStale(store: LeaseStore, key: String, leaseMs: Long,
                           token: String): Unit =
    store.modificationTime(key).foreach { mtime =>
      if (System.currentTimeMillis() - mtime > leaseMs) {
        // atomic rename: exactly one contender wins the steal
        if (store.rename(key, key + ".stale-" + token))
          store.delete(key + ".stale-" + token)
      }
    }

  private def release(store: LeaseStore, key: String,
                      token: String): Unit =
    if (!store.deleteIfToken(key, token))
      throw new IllegalStateException(
        s"writer lease '$key' was lost during the operation (lease " +
          "expired and another writer took over) — mutual exclusion was " +
          "violated; verify the target table and raise leaseMs above the " +
          "operation's duration")
}

/** Default [[WriterLease.LeaseStore]]: marker files through a Hadoop
  * FileSystem. See the backend contract in [[WriterLease]]'s scaladoc —
  * atomic on HDFS-like stores and (via NIO O_EXCL) the local scheme;
  * NOT sufficient on S3A-style emulated stores.
  */
class HadoopLeaseStore(fs: FileSystem, locksDir: Path)
  extends WriterLease.LeaseStore {

  fs.mkdirs(locksDir)

  override def createExclusive(key: String, token: String): Boolean =
    HadoopLeaseStore.jvmGate.synchronized {
      if (fs.getScheme == "file") createLocalAtomic(key, token)
      else {
        val path = new Path(key)
        var created = false
        try {
          val out = fs.create(path, false)
          created = true
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        } catch {
          case _: java.io.IOException =>
            // if WE created the marker but failed to stamp the token,
            // remove it (best-effort) — an orphaned tokenless marker
            // would block every writer until the lease expires
            if (created) try fs.delete(path, false)
            catch { case _: java.io.IOException => () }
            false
        }
      }
    }

  // Local scheme: O_EXCL via NIO CREATE_NEW — kernel-atomic arbitration
  // ACROSS PROCESSES (two local JVMs sharing a warehouse — e.g. a verify
  // run racing a bench run — truly serialize, where Hadoop's
  // RawLocalFileSystem create(overwrite=false) is check-then-create and
  // both could "win"). Token readback/delete still go through the Hadoop
  // FS, which reads NIO-written files fine (a missing .crc is tolerated).
  private def createLocalAtomic(key: String, token: String): Boolean = {
    val p = java.nio.file.Paths.get(new Path(key).toUri.getPath)
    var created = false
    try {
      java.nio.file.Files.createDirectories(p.getParent)
      val ch = java.nio.file.Files.newByteChannel(p,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      created = true
      try ch.write(java.nio.ByteBuffer.wrap(token.getBytes("UTF-8")))
      finally ch.close()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.io.IOException =>
        if (created) try java.nio.file.Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
        false
    }
  }

  override def readToken(key: String): Option[String] =
    try {
      val in = fs.open(new Path(key))
      try {
        val buf = new Array[Byte](128)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  override def modificationTime(key: String): Option[Long] =
    try Some(fs.getFileStatus(new Path(key)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  override def rename(key: String, toKey: String): Boolean =
    try fs.rename(new Path(key), new Path(toKey))
    catch { case _: java.io.IOException => false }

  override def delete(key: String): Unit =
    HadoopLeaseStore.jvmGate.synchronized {
      try fs.delete(new Path(key), false)
      catch { case _: java.io.IOException => () }
    }

  // check+delete under the process gate: same-JVM contenders cannot
  // interleave a steal between the token check and the delete (the old
  // fully-synchronized release guarantee); the cross-process instant
  // remains, as documented in WriterLease's backend contract.
  override def deleteIfToken(key: String, token: String): Boolean =
    HadoopLeaseStore.jvmGate.synchronized {
      if (readToken(key).contains(token)) {
        try fs.delete(new Path(key), false)
        catch { case _: java.io.IOException => () }
        true
      } else false
    }
}

object HadoopLeaseStore {
  // Process-wide monitor: FileSystem.create(overwrite=false) on non-local
  // schemes without server-side arbitration is check-then-create, so two
  // threads of one JVM could both win; HDFS arbitrates atomically
  // server-side and the local scheme uses kernel O_EXCL, but the gate is
  // kept for all schemes — cheap, and it keeps intra-JVM contention off
  // the filesystem entirely.
  private val jvmGate = new Object
}
