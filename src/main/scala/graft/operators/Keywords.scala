package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** TF-IDF keyword extraction — the "top distinguishing terms per document"
  * operator of a corpus-analysis pipeline.
  *
  * idf uses the rational form `(N+1)/(df+1)` rather than a logarithm:
  * rankings are identical (log is monotone), and every arithmetic step is
  * a single IEEE add/divide/multiply that any engine reproduces
  * bit-for-bit — `ln` implementations differ in the last ulp across libm
  * builds, which would poison cross-engine rank parity.
  *
  * Shape at scale: one (doc, term) aggregation, one (term) aggregation,
  * an equi-join back on term, and a rank window partitioned by doc —
  * all map-side-combinable shuffles on compact keys. The corpus size N
  * joins in as a broadcast single-row aggregate (no driver action).
  */
object Keywords {

  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(total))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs").cast("double") + lit(1.0))
            / (col("df").cast("double") + lit(1.0))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank"), col("score"))
  }
}
