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
  * (self-healed on the next run, with a content check before anything is
  * dropped). The swap itself is two catalog renames — a Hive-style catalog
  * has no atomic multi-table commit, so a reader racing the swap can miss
  * the name for the duration of the first rename plus ONE verification
  * scan of the renamed original (the staged copy is summarized before the
  * swap — it is immutable once written — so only the `__old` count sits
  * inside the window). Table formats with a transaction log make the
  * window disappear; this is the portable form.
  *
  * Writer safety: callers MUST quiesce writers for the duration — rows
  * appended to `fqn` while the rewrite runs are not in the staged copy.
  * As a guard, the swap compares the renamed original against the staged
  * copy on (row count, content fingerprint) and ABORTS (restoring the
  * original, raising IllegalStateException) on mismatch. The fingerprint
  * is an order-independent sum of per-row hashes, so same-cardinality
  * mutations (an UPDATE/overwrite, or a balanced append+delete) are
  * detected too, not just count changes. The guard is detection, not a
  * lock: a write that lands between the verification scan and the final
  * DROP is still lost — quiescing writers is the contract.
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

  /** True if a MapType occurs anywhere in the (possibly nested) type —
    * Spark's hash expressions reject maps (element order is undefined),
    * so such tables fall back to the cardinality-only guard.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType  => containsMap(a.elementType)
      case _             => false
    }
  }

  /** (row count, order-independent content fingerprint) of a table in one
    * scan: the fingerprint sums xxhash64 over all columns per row as
    * DECIMAL(38,0) (overflow-free, reduction-order-independent), so two
    * tables agree iff they hold the same row multiset up to 64-bit hash
    * collisions. Tables with map-typed columns (which Spark's hash
    * expressions reject) degrade to (count, 0) — the guard then detects
    * cardinality changes only, as the pre-fingerprint code did for all
    * tables.
    */
  private def contentSummary(spark: SparkSession,
                             tbl: String): (Long, BigDecimal) = {
    import org.apache.spark.sql.functions._
    val df = spark.table(tbl)
    if (df.schema.fields.exists(f => containsMap(f.dataType))) {
      (df.count(), BigDecimal(0))
    } else {
      // backtick-quote names: a bare col("a.b") would parse as nested-field
      // access and abort compaction on tables with dotted column names
      val cols = df.columns.toIndexedSeq
        .map(n => col(s"`${n.replace("`", "``")}`"))
      val row = df.agg(count(lit(1)),
        sum(xxhash64(struct(cols: _*)).cast("decimal(38,0)"))).head()
      (row.getLong(0),
        if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
    }
  }

  /** Rewrite `fqn` into ceil(rows/targetRows) files.
    * Returns (filesBefore, filesAfter).
    *
    * `beforeSwap` is a test seam: runs after staging, before the swap —
    * the window where a concurrent write must trip the abort guard.
    */
  def compactTable(spark: SparkSession, fqn: String, targetRows: Long,
                   beforeSwap: () => Unit = () => ()): (Int, Int) = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val old = s"${fqn}__old"
    val tmp = s"${fqn}__compact"
    val (qFqn, qOld, qTmp) = (quoted(fqn), quoted(old), quoted(tmp))
    // Self-heal a previous run that died mid-swap: if fqn is gone the crash
    // was between the two renames — rename the complete copy back. If BOTH
    // survive, normally only the final DROP was missed (fqn = the compacted
    // copy) — but a non-quiesced writer may have RE-CREATED fqn (append-mode
    // saveAsTable creates missing tables) after the first rename, making
    // `__old` the only complete copy; dropping it then would be silent data
    // loss. So `__old` is dropped only when fqn provably holds the same
    // content; otherwise fail loudly for manual resolution.
    if (spark.catalog.tableExists(old)) {
      if (!spark.catalog.tableExists(fqn)) {
        spark.sql(s"ALTER TABLE $qOld RENAME TO $qFqn")
      } else if (contentSummary(spark, fqn) == contentSummary(spark, old)) {
        spark.sql(s"DROP TABLE $qOld")
      } else {
        throw new IllegalStateException(
          s"compactTable self-heal refused: '$old' and '$fqn' differ — a " +
            "writer raced a previous crashed run; reconcile manually (keep " +
            s"one of '$fqn' / '$old', drop the other) and retry")
      }
    }
    val before = spark.table(fqn).inputFiles.length
    val rows = spark.table(fqn).count()
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    spark.table(fqn).repartition(nOut)
      .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    // Summarize the staged copy BEFORE the swap — it is immutable once
    // written, so this scan sits outside the reader-miss window.
    val staged = contentSummary(spark, tmp)
    beforeSwap()
    // rename-rename-drop: every intermediate state keeps one complete
    // copy of the data reachable by SOME name
    spark.sql(s"ALTER TABLE $qFqn RENAME TO $qOld")
    // Writer-race guard: the staged copy must hold exactly the content the
    // original holds now (count + fingerprint — see the object scaladoc).
    // A mismatch means a writer changed the table after the staging read —
    // undo the rename, drop the stage, and fail loudly instead of silently
    // publishing the stale staged copy.
    val current = contentSummary(spark, old)
    if (staged != current) {
      spark.sql(s"ALTER TABLE $qOld RENAME TO $qFqn")
      spark.sql(s"DROP TABLE $qTmp")
      throw new IllegalStateException(
        s"compactTable aborted: '$fqn' changed during compaction " +
          s"(staged ${staged._1} rows, table now has ${current._1}, " +
          s"fingerprints ${if (staged._2 == current._2) "match" else "differ"}); " +
          "original restored — quiesce writers and retry")
    }
    spark.sql(s"ALTER TABLE $qTmp RENAME TO $qFqn")
    spark.sql(s"DROP TABLE $qOld")
    (before, spark.table(fqn).inputFiles.length)
  }
}
