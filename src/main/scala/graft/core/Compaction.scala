package graft.core

import org.apache.spark.sql.SparkSession

/** Small-file compaction for managed tables — the table-maintenance
  * operation every long-running lakehouse pipeline needs: streaming /
  * incremental appends accumulate small files until scan task scheduling
  * and footer reads dominate; compaction rewrites the table into
  * row-budgeted files.
  *
  * Crash safety: the rewrite stages into a `__compact` sibling table; the
  * swap is rename-rename-drop, so a CRASH at any point loses no data — a
  * failure before the swap leaves the original untouched, and a failure
  * mid-swap leaves the full table under `__old` and/or `__compact`
  * (self-healed on the next run). The swap itself is two catalog renames —
  * a Hive-style catalog has no atomic multi-table commit, so a reader
  * racing the swap can transiently miss the name (table formats with a
  * transaction log make that window disappear; this is the portable form).
  *
  * Writer safety: callers MUST quiesce writers for the duration — rows
  * appended to `fqn` while the rewrite runs are not in the staged copy.
  * As a guard, the swap compares the renamed original's row count against
  * the staged copy after the first rename and ABORTS (restoring the
  * original, raising IllegalStateException) on mismatch, converting the
  * silent-loss window into an error. The guard is detection, not a lock:
  * an append that lands between the verify count and the final DROP is
  * still lost — quiescing writers is the contract.
  *
  * At cluster scale the same pattern runs per partition.
  */
object Compaction {

  // Same identifier rule as TableStore.ident; names are interpolated into
  // SQL, so reject anything that isn't a plain word before quoting it.
  private def quoted(fqn: String): String = {
    val parts = fqn.split('.')
    parts.foreach(p => require(p.matches("[A-Za-z0-9_]+"),
      s"invalid table identifier part '$p' in '$fqn' ([A-Za-z0-9_]+)"))
    parts.map(p => s"`$p`").mkString(".")
  }

  /** Rewrite `fqn` into ceil(rows/targetRows) files.
    * Returns (filesBefore, filesAfter).
    *
    * `beforeSwap` is a test seam: runs after staging, before the swap —
    * the window where a concurrent append must trip the abort guard.
    */
  def compactTable(spark: SparkSession, fqn: String, targetRows: Long,
                   beforeSwap: () => Unit = () => ()): (Int, Int) = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val old = s"${fqn}__old"
    val tmp = s"${fqn}__compact"
    val (qFqn, qOld, qTmp) = (quoted(fqn), quoted(old), quoted(tmp))
    // Self-heal a previous run that died mid-swap: if __old survives next
    // to a complete fqn the final DROP was all that was missed; if fqn is
    // gone the crash was between the two renames — rename the copy back.
    // Without this, a leftover __old wedges every retry at the RENAME.
    if (spark.catalog.tableExists(old)) {
      if (spark.catalog.tableExists(fqn)) spark.sql(s"DROP TABLE $qOld")
      else spark.sql(s"ALTER TABLE $qOld RENAME TO $qFqn")
    }
    val before = spark.table(fqn).inputFiles.length
    val rows = spark.table(fqn).count()
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    spark.table(fqn).repartition(nOut)
      .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    beforeSwap()
    // rename-rename-drop: every intermediate state keeps one complete
    // copy of the data reachable by SOME name
    spark.sql(s"ALTER TABLE $qFqn RENAME TO $qOld")
    // Writer-race guard: the staged copy must hold exactly the rows the
    // original holds now. A count mismatch means a writer appended after
    // the staging read — undo the rename, drop the stage, and fail loudly
    // instead of dropping those rows with the original.
    val stagedRows = spark.table(tmp).count()
    val currentRows = spark.table(old).count()
    if (stagedRows != currentRows) {
      spark.sql(s"ALTER TABLE $qOld RENAME TO $qFqn")
      spark.sql(s"DROP TABLE $qTmp")
      throw new IllegalStateException(
        s"compactTable aborted: '$fqn' changed during compaction " +
          s"(staged $stagedRows rows, table now has $currentRows); " +
          "original restored — quiesce writers and retry")
    }
    spark.sql(s"ALTER TABLE $qTmp RENAME TO $qFqn")
    spark.sql(s"DROP TABLE $qOld")
    (before, spark.table(fqn).inputFiles.length)
  }
}
