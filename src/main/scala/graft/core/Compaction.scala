package graft.core

import org.apache.spark.sql.SparkSession

/** Small-file compaction for managed tables — the table-maintenance
  * operation every long-running lakehouse pipeline needs: streaming /
  * incremental appends accumulate small files until scan task scheduling
  * and footer reads dominate; compaction rewrites the table into
  * row-budgeted files.
  *
  * The rewrite stages into a `__compact` sibling table and swaps via
  * catalog rename, so a reader never observes a half-written table and a
  * failure before the swap leaves the original untouched. At cluster scale
  * the same pattern runs per partition (rewrite one partition's files,
  * swap that partition) — the whole-table form here is the unit the spec
  * can exercise.
  */
object Compaction {

  /** Rewrite `fqn` into ceil(rows/targetRows) files.
    * Returns (filesBefore, filesAfter).
    */
  def compactTable(spark: SparkSession, fqn: String,
                   targetRows: Long): (Int, Int) = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val before = spark.table(fqn).inputFiles.length
    val rows = spark.table(fqn).count()
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    val tmp = s"${fqn}__compact"
    spark.table(fqn).repartition(nOut)
      .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    spark.sql(s"DROP TABLE $fqn")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $fqn")
    (before, spark.table(fqn).inputFiles.length)
  }
}
