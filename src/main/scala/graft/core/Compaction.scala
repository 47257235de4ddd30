package graft.core

import org.apache.spark.sql.SparkSession

/** Small-file compaction for managed tables — the table-maintenance
  * operation every long-running lakehouse pipeline needs: streaming /
  * incremental appends accumulate small files until scan task scheduling
  * and footer reads dominate; compaction rewrites the table into
  * row-budgeted files.
  *
  * The rewrite stages into a `__compact` sibling table; the swap is
  * rename-rename-drop, so DATA IS NEVER LOST at any crash point: a
  * failure before the swap leaves the original untouched, and a failure
  * mid-swap leaves the full table under `__old` and/or `__compact`
  * (recover by renaming back). The swap itself is two catalog renames —
  * a Hive-style catalog has no atomic multi-table commit, so a reader
  * racing the swap can transiently miss the name (table formats with a
  * transaction log make that window disappear; this is the portable
  * form). At cluster scale the same pattern runs per partition.
  */
object Compaction {

  /** Rewrite `fqn` into ceil(rows/targetRows) files.
    * Returns (filesBefore, filesAfter).
    */
  def compactTable(spark: SparkSession, fqn: String,
                   targetRows: Long): (Int, Int) = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val old = s"${fqn}__old"
    // Self-heal a previous run that died mid-swap: if __old survives next
    // to a complete fqn the final DROP was all that was missed; if fqn is
    // gone the crash was between the two renames — rename the copy back.
    // Without this, a leftover __old wedges every retry at the RENAME.
    if (spark.catalog.tableExists(old)) {
      if (spark.catalog.tableExists(fqn)) spark.sql(s"DROP TABLE $old")
      else spark.sql(s"ALTER TABLE $old RENAME TO $fqn")
    }
    val before = spark.table(fqn).inputFiles.length
    val rows = spark.table(fqn).count()
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    val tmp = s"${fqn}__compact"
    spark.table(fqn).repartition(nOut)
      .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    // rename-rename-drop: every intermediate state keeps one complete
    // copy of the data reachable by SOME name
    spark.sql(s"ALTER TABLE $fqn RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $fqn")
    spark.sql(s"DROP TABLE $old")
    (before, spark.table(fqn).inputFiles.length)
  }
}
