package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed as-of join: each left row is matched to the right row with
  * the greatest timestamp ≤ the left timestamp within the same key.
  *
  * Built by composition (SURVEY.md §7.3 preference (a)) — no custom
  * SparkPlan needed: tag and union both sides, then one key-partitioned
  * time-ordered window carries the latest right-side values forward
  * (`last(…, ignoreNulls=true)` over an unbounded-preceding frame), and the
  * left rows are filtered back out. Exactly one shuffle (the window
  * partitioning), any scale; ties at equal timestamps order right-before-
  * left so `≤` matches like a native ASOF join.
  */
object AsOfJoin {

  /** @param left       probe side (each row seeks its as-of match)
    * @param right      reference side
    * @param keyCol     equi key present in both frames
    * @param leftTsCol  left timestamp column
    * @param rightTsCol right timestamp column
    * @param rightCols  right columns to carry (aliased as given)
    * @param joinType   "inner" drops unmatched left rows; "left" keeps them
    *                   with null right columns
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTsCol: String, rightTsCol: String,
           rightCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left")
    val leftCols = left.columns.toSeq
    // a genuinely NULL struct (a struct of null fields would not be
    // skipped by last(..., ignoreNulls))
    val rType = org.apache.spark.sql.types.StructType(rightCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val nullR = lit(null).cast(rType)
    val tagged =
      right.select(
        col(keyCol).as("_k"), col(rightTsCol).as("_ts"), lit(0).as("_tag"),
        struct(rightCols.map(col): _*).as("_r")
      ).unionByName(
        left.select(
          (Seq(col(keyCol).as("_k"), col(leftTsCol).as("_ts"),
            lit(1).as("_tag"), nullR.as("_r")) ++ leftCols.map(col)): _*),
        allowMissingColumns = true)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    // match-existence = the _match struct itself (non-null iff a right row
    // matched); testing a projected field instead would wrongly drop left
    // rows whose matched right row has a legitimate NULL in that field
    val matched =
      if (joinType == "inner") carried.filter(col("_match").isNotNull)
      else carried
    matched.select(
      leftCols.map(col) ++ rightCols.map(c =>
        col(s"_match.$c").as(c)): _*)
  }
}
