package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Calibration audit for sim2's pinned IVF constants: per-query
  * recall-at-5 across (nCentroids, nProbe) settings and tiers INCLUDING
  * the locally generated sf1 tier (where nProbe=8 measured a 0.2
  * worst-query recall — the drift that moved the pin to 12). Run after
  * any seed/sampleSize/tier change:
  * `Test/runMain graft.queries.Sim2Probe` (sf1 rows require the tier:
  * `Test/runMain graft.TestDataGen local-data/sf1 10`).
  */
object Sim2Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val tiers = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
      "local-data/sf1").filter(new java.io.File(_).isDirectory)
    for (d <- tiers; (nc, np) <- Seq((16, 8), (16, 10), (16, 12))) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 10)
      val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = nc)
      val ivf = Similarity.ivfTopK(idx, qs, "vec_id", "embedding", k = 5, nProbe = np)
      val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
      val rec = bf.select(col("qid"), col("neighbor"))
        .join(ivf.select(col("qid"), col("neighbor"), lit(1).as("hit")),
          Seq("qid", "neighbor"), "left")
        .groupBy(col("qid"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double")
          / count(lit(1)).cast("double")).as("recall"))
        .orderBy(col("recall")).limit(3).collect()
      println(s"PROBE $d nc=$nc np=$np worst=" +
        rec.map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f").mkString(","))
    }
    spark.stop()
  }
}
