package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / the 100TB levers).
  *
  * AQE's skew-join split handles sort-merge skew automatically; explicit
  * salting remains the tool when one side must be replicated (e.g. a hot
  * dimension row joined by billions of fact rows, or aggregations on a
  * power-law key). `saltedJoin` spreads each hot key across `saltFactor`
  * partitions deterministically: the big side salts by a hash of its whole
  * row, the small side is replicated once per salt value.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, with the big side spread over
    * `saltFactor` sub-keys. Result equals the plain join (inner or
    * left-outer from the big side), row-for-row — salt assignment cannot
    * change the output, only the partitioning, so the nondeterministic
    * salt below is safe.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // rand(), not a row hash: fully identical rows (the duplicate-heavy
    // case salting exists for) would all hash to one salt bucket and the
    // hot key would still land on a single reducer
    val saltExpr: Column = floor(rand(42) * saltFactor).cast("long")
    val bigS = big.withColumn("_salt", saltExpr)
    val smallS = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates (sum/count/min/
    * max) results are identical to a direct groupBy; the first phase caps
    * any single reducer's share of a hot key at 1/saltFactor.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltFactor: Int): DataFrame = {
    // rand salt (see saltedJoin): algebraic aggregates are salt-invariant
    val salted = df.withColumn("_salt",
      floor(rand(42) * saltFactor).cast("long"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_ps"), count(lit(1)).as("_pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_ps")).as(s"sum_$valueCol"),
        sum(col("_pc")).cast("bigint").as("n"))
  }
}
