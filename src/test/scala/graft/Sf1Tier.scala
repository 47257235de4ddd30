package graft

import org.apache.spark.sql.SparkSession

/** Build-gated sf1 tier: [[available]] generates the 10× scale tier
  * ONCE per machine (deterministic [[TestDataGen]], ~175 MB, ~1-2 min
  * on the test session), so a fresh-clone `sbt test` exercises the 10×
  * scaling regime instead of silently cancelling it — the round-11
  * verdict's "plain CI never checks the bound" gap. The
  * `_TIER_COMPLETE` marker is written last by the generator; a tier
  * without it (crash mid-generation, or a pre-marker checkout) is
  * regenerated in place — overwrite-mode writes make that idempotent.
  *
  * Escape hatch: set SPARK_GRAFT_SKIP_SF1=1 to skip generation on
  * machines where the one-time cost or disk is unacceptable — suites
  * using the tier `assume` on [[available]] and CANCEL loudly there,
  * never silently pass.
  */
object Sf1Tier {

  val dir = "local-data/sf1"

  private def marker = new java.io.File(dir, "_TIER_COMPLETE")

  def skipped: Boolean = sys.env.get("SPARK_GRAFT_SKIP_SF1").contains("1")

  /** Generate-if-absent under a process-wide gate (suites share the test
    * JVM; concurrent calls must not race the overwrite writes) AND a
    * cross-process file lock: two concurrent test JVMs on one machine
    * (parallel sbt invocations, CI sharding) could otherwise both see
    * the marker absent and race overwrite-mode generation into the same
    * directory — mixed files from two writers, markered complete by
    * whichever finished last. The lock serializes generation; the
    * marker re-check after acquiring means the loser of the race finds
    * the winner's completed tier and generates nothing (the
    * stateBuildGate double-check, cross-JVM form). Marker-last
    * discipline is unchanged: a crash mid-generation leaves no marker
    * and the next caller regenerates in place.
    * Returns true when the tier is present and complete.
    */
  def available(spark: SparkSession): Boolean = synchronized {
    if (skipped && !marker.isFile) false
    else {
      if (!marker.isFile) {
        val base = new java.io.File(dir).getAbsoluteFile
        base.getParentFile.mkdirs()
        val lockPath = new java.io.File(base.getParentFile,
          base.getName + ".lock").toPath
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          // lock() blocks for locks held by OTHER processes, but THROWS
          // OverlappingFileLockException for one held elsewhere in THIS
          // JVM (JVM-level file-lock semantics). The object-level
          // synchronized above serializes callers only while suites run
          // in one classloader world — an in-process/layered-classloader
          // test runner (sbt with fork:=false) would load a second
          // Sf1Tier object whose synchronized doesn't exclude ours. So
          // same-JVM overlap gets a retry-until-free loop equivalent to
          // the blocking wait; the post-acquire marker re-check makes
          // the eventual winner-or-loser outcome identical.
          def acquire(): java.nio.channels.FileLock = {
            var lk: java.nio.channels.FileLock = null
            var waitedMs = 0L
            while (lk == null) {
              // a loop, not catch-block recursion: scalac can't TCO a
              // recursive call inside a catch, and a long wait would
              // otherwise grow the stack one frame per retry
              try lk = ch.lock()
              catch {
                case _: java.nio.channels.OverlappingFileLockException =>
                  Thread.sleep(500)
                  waitedMs += 500
                  // a leaked same-JVM lock (a crashed suite holding the
                  // channel open in a layered-classloader runner) would
                  // otherwise hang the build silently forever at 500 ms
                  // polls — log every minute so the wedge is diagnosable;
                  // still wait (a real generator legitimately takes
                  // minutes), never time out a healthy build
                  if (waitedMs % 60000L == 0L)
                    Console.err.println(s"[graft] Sf1Tier: still waiting " +
                      s"for the sf1 generator file lock after " +
                      s"${waitedMs / 1000}s - if no generator is running, " +
                      s"a crashed suite may have leaked the lock on " +
                      s"$lockPath")
              }
            }
            lk
          }
          val lk = acquire() // blocks until a concurrent generator exits
          try {
            if (!marker.isFile) TestDataGen.generate(spark, dir, 10.0)
          } finally lk.release()
        } finally ch.close()
      }
      marker.isFile
    }
  }
}
