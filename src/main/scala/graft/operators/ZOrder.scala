package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * "cluster the table so range predicates on EITHER key skip files" write
  * optimization (Delta/Iceberg's OPTIMIZE ZORDER BY, built from scratch).
  *
  * `zkey` interleaves the low `bits` bits of two dimensions (x in even bit
  * positions, y in odd), so rows close in z-value are close in both
  * dimensions; range-partitioning + sorting the write by `zkey` gives
  * parquet row-groups whose min/max spans are tight on both columns, which
  * is what makes scan-time skipping fire for predicates on either one.
  *
  * The key is a pure unrolled chain of codegen'd bitwise ops (no UDF, no
  * HOF): ~4·bits integer ops per row, constant-folded shift amounts.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of x (even positions) and
    * y (odd positions) into a non-negative BIGINT.
    */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Re-layout a frame for writing: range-partition on the z-key (balanced
    * output files, since z-values are near-uniform under hash-like ids) and
    * sort within partitions, so each written file covers a tight z-range →
    * tight min/max on BOTH dimensions. This is the write-side half; the
    * read-side payoff is ordinary parquet row-group skipping.
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive: $numFiles")
    df.withColumn("zkey", zkey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }

  /** Reference implementation for specs: interleave on plain Longs. */
  private[graft] def zkeyRef(x: Long, y: Long, bits: Int = 16): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }
}
