package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Coarse advisory WRITER LOCK for table mutations — the serialization
  * complement to the upsert/compaction race GUARDS: the guards detect a
  * concurrent writer and abort (correct, but one writer loses its work);
  * with the lease, cooperating batch writers queue on a marker file and
  * all complete.
  *
  * Mechanics:
  *  - The lock is ONE marker file under `<warehouse>/_locks/<name>.lock`,
  *    holding the holder's random token. Acquisition is
  *    `create(overwrite = false)` — atomic arbitration on HDFS-like
  *    stores (intra-JVM contenders additionally serialize on a process
  *    monitor, which closes the local-FS check-then-create window).
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
  * FILESYSTEM CONTRACT: correctness of the arbitration rests on atomic
  * `create(overwrite=false)` and atomic `rename` — true on HDFS-like
  * stores (HDFS server-side; the `file:` scheme via an O_EXCL
  * `CREATE_NEW` NIO create, atomic across PROCESSES at the kernel — the
  * driver-verify-racing-a-local-bench case — not just across threads of
  * one JVM). On
  * object stores whose Hadoop connector emulates these (S3A: check-then-
  * put create, copy+delete rename) two contenders can both "win"; there,
  * use a real coordination service or a transaction-log table format
  * instead — this lease does not pretend to close that gap. Known
  * residual window even on conforming stores: release's token-check and
  * delete are two calls, so a lease that expires in the instant between
  * them can delete a thief's fresh marker instead of throwing; `leaseMs`
  * far above the operation duration is the actual safety margin, the
  * loud-failure release is the backstop for gross overruns.
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

  /** Lock marker path for a table name (warehouse-level `_locks/` dir, so
    * upsert and compaction contend on the same file per table without any
    * catalog metadata lookup).
    */
  def lockPath(spark: SparkSession, name: String): Path =
    new Path(
      new Path(spark.conf.get("spark.sql.warehouse.dir"), "_locks"),
      name.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9_.]", "_") + ".lock")

  /** Run `f` holding the named lock. Waits up to `waitMs` (polling) for a
    * live holder to release; steals leases older than `leaseMs`.
    */
  /** [[Lease]]-typed overload — the form the `serializeWriters` entry
    * points ([[TableStore.upsert]], [[Compaction]]) plumb through.
    */
  def withLock[T](spark: SparkSession, name: String, lease: Lease)
                 (f: => T): T =
    withLock(spark, name, lease.leaseMs, lease.waitMs)(f)

  def withLock[T](spark: SparkSession, name: String,
                  leaseMs: Long = 10 * 60 * 1000L,
                  waitMs: Long = 60 * 1000L)(f: => T): T = {
    require(leaseMs > 0 && waitMs >= 0, s"bad lease/wait: $leaseMs/$waitMs")
    val path = lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    while (!tryAcquire(fs, path, token)) {
      stealIfStale(fs, path, leaseMs, token)
      if (!tryAcquire(fs, path, token)) {
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"timed out after ${waitMs}ms waiting for writer lock '$path' " +
              s"(held by ${holderToken(fs, path).getOrElse("<gone>")}); " +
              "a slow writer holds it, or raise waitMs")
        Thread.sleep(100)
      } else return runHolding(fs, path, token, f)
    }
    runHolding(fs, path, token, f)
  }

  // If f itself threw, a release failure (lease stolen mid-operation, or
  // marker vanished) must not REPLACE f's exception — that would hide the
  // root cause of the aborted write. Attach it as suppressed instead; a
  // release failure after a SUCCESSFUL f still throws (mutual exclusion
  // was violated and the caller must know).
  private def runHolding[T](fs: FileSystem, path: Path, token: String,
                            f: => T): T = {
    var failure: Throwable = null
    try f
    catch { case t: Throwable => failure = t; throw t }
    finally {
      try release(fs, path, token)
      catch {
        case r: IllegalStateException =>
          if (failure != null) failure.addSuppressed(r) else throw r
      }
    }
  }

  // Process-wide monitor: FileSystem.create(overwrite=false) on the LOCAL
  // fs is check-then-create, so two threads of one JVM could both win;
  // HDFS-like stores arbitrate atomically server-side and don't need
  // this. The `file:` scheme doesn't go through the Hadoop create at all
  // (see tryAcquireLocal), but the gate is kept for it too — cheap, and
  // it keeps intra-JVM contention off the filesystem entirely.
  private val jvmGate = new Object

  private def tryAcquire(fs: FileSystem, path: Path,
                         token: String): Boolean = jvmGate.synchronized {
    if (fs.getScheme == "file") tryAcquireLocal(path, token)
    else {
      var created = false
      try {
        val out = fs.create(path, false)
        created = true
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: java.io.IOException =>
          // if WE created the marker but failed to stamp the token, remove
          // it (best-effort) — an orphaned tokenless marker would block
          // every writer until the lease expires
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
  private def tryAcquireLocal(path: Path, token: String): Boolean = {
    val p = java.nio.file.Paths.get(path.toUri.getPath)
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

  private def stealIfStale(fs: FileSystem, path: Path, leaseMs: Long,
                           token: String): Unit = {
    val st = try Some(fs.getFileStatus(path))
    catch { case _: java.io.FileNotFoundException => None }
    st.foreach { s =>
      if (System.currentTimeMillis() - s.getModificationTime > leaseMs) {
        val tomb = new Path(path.toString + ".stale-" + token)
        // atomic rename: exactly one contender wins the steal
        if (try fs.rename(path, tomb) catch { case _: java.io.IOException => false })
          fs.delete(tomb, false)
      }
    }
  }

  private def holderToken(fs: FileSystem, path: Path): Option[String] =
    try {
      val in = fs.open(path)
      try {
        val buf = new Array[Byte](128)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  private def release(fs: FileSystem, path: Path, token: String): Unit =
    jvmGate.synchronized {
      if (holderToken(fs, path).contains(token)) fs.delete(path, false)
      else throw new IllegalStateException(
        s"writer lease '$path' was lost during the operation (lease " +
          "expired and another writer took over) — mutual exclusion was " +
          "violated; verify the target table and raise leaseMs above the " +
          "operation's duration")
    }
}
