package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregate statistics over embedding columns: per-label centroids (the
  * class-prototype / cluster-summary step of an embedding pipeline).
  *
  * Shape at scale: `posexplode` turns N vectors × D dims into N·D rows,
  * then one hash aggregation on (label, dim) — map-side partial aggregation
  * applies, the shuffle carries only (label, dim, partial sum, partial
  * count), i.e. |labels|·D rows per task regardless of N. No driver
  * materialization, no windows.
  *
  * Parity: float→double cast is exact; each double is rounded once to
  * DECIMAL(38,6), summed exactly as decimal (reduction order can't
  * matter), and divided once as double. Any ANSI engine reproduces the
  * result bit-for-bit.
  *
  * Scale 6 is deliberate: a float32 with exactly `scale+1` fractional
  * bits lands EXACTLY on a decimal rounding boundary, where Spark
  * (HALF_UP) and half-even engines (DuckDB) round apart. At scale 12
  * that's a ~2⁻¹⁶ per-value event (observed: 7 ties in the sf0.1
  * corpus); at scale 6 it needs 22 trailing zero mantissa bits
  * (~2⁻²², observed zero at every SF). QueryUtil's "doubles never tie"
  * note holds for arithmetic-derived doubles, not float-sourced ones.
  */
object VectorStats {

  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      // (18,6): Long-backed fast decimal per row (embedding components
      // are O(1) — far inside the 10^12 magnitude bound). Cast hoisted
      // below the aggregate (r20, guide §1.2): an agg child re-evaluates
      // per update-expression reference
      .withColumn("_xd", col("x").cast("double").cast(DecimalType(18, 6)))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        sum(col("_xd")).as("s"),
        count(lit(1)).as("n_vecs"))
      .select(col(labelCol), col("dim").cast("int").as("dim"),
        (col("s").cast("double") / col("n_vecs").cast("double")).as("centroid"),
        col("n_vecs").cast("bigint").as("n_vecs"))

  /** Per-DIMENSION standardization (z-scoring) of an embedding column —
    * the feature-prep step before distance-based ops (k-means, ANN) when
    * dimensions carry different scales. Returns (id, dim, z) rows.
    *
    * Shape at scale: one posexplode + one (dim)-keyed aggregation whose
    * output is D rows — broadcast back onto the exploded rows, so the
    * corpus shuffles once regardless of N.
    *
    * Parity recipe (every step IEEE/decimal-mirrorable, labelCentroids'
    * argument extended to second moments): components round once to
    * DECIMAL(18,6); Σx is summed at (38,12), Σx² uses the EXACT decimal
    * square (scale 12) — reduction order can't matter; mean and E[x²]
    * are single double divisions, var = E[x²] − mean² clamped at 0 (the
    * exact-arithmetic value can land a few ulps negative in doubles),
    * std = IEEE sqrt, z = (x − mean)/std, constant dims (std = 0) → 0.
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col(idCol), col("dim").cast("int").as("dim"),
        col("x").cast("double").cast(DecimalType(18, 6)).as("xr"))
    val stats = exploded.groupBy(col("dim"))
      .agg(sum(col("xr").cast(DecimalType(38, 12))).as("s1"),
        sum(col("xr") * col("xr")).as("s2"),
        count(lit(1)).as("n"))
      .select(col("dim"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        (col("s2").cast("double") / col("n").cast("double")).as("ex2"))
      .select(col("dim"), col("mean"),
        sqrt(greatest(col("ex2") - col("mean") * col("mean"), lit(0.0)))
          .as("std"))
    exploded.join(broadcast(stats), "dim")
      .select(col(idCol), col("dim"),
        when(col("std") > 0.0,
          (col("xr").cast("double") - col("mean")) / col("std"))
          .otherwise(0.0).as("z"))
  }
}
