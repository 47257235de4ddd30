package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-split assignment — the train/validation/test
  * partitioner of a training-data pipeline.
  *
  * The bucket is a pure per-row projection: first 8 hex chars of
  * `md5(id)` → integer mod 100. Using md5 (rather than `xxhash64`/murmur)
  * makes the assignment portable across engines — any system with md5
  * reproduces the exact same split, so an experiment's split survives an
  * engine migration byte-for-byte. No shuffle, codegen'd builtins only;
  * partition the written table by `split` and downstream readers prune
  * whole splits at the scan.
  */
object Splits {

  /** Portable 32-bit hash: first 8 hex chars of md5(id) as an integer —
    * the ONE definition of the engine-portable uniform driving every
    * sampling/split decision ([[bucket]], [[weightedSample]]).
    */
  def md5_32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)

  /** Stable bucket in [0, 100) from the row id. */
  def bucket(id: Column): Column =
    md5_32(id).cast("long") % 100

  /** Add a `split` column: `train` / `validation` / `test` with the given
    * percentages (test gets the remainder).
    */
  def assignSplit(df: DataFrame, idCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct val=$valPct")
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "validation")
        .otherwise("test"))
  }

  /** LEAKAGE-SAFE split assignment: a near-duplicate that lands in train
    * while its twin lands in test silently inflates eval scores — the
    * cross-SPLIT version of the contamination problem `ct1` guards
    * against cross-CORPUS. The fix is granularity: bucket on the
    * near-dup CLUSTER's canonical id ([[DedupClusters.canonicalize]]),
    * not the row id, so every member of a cluster draws the same split;
    * singletons (the overwhelming majority) fall back to their own id
    * via the left join + coalesce and keep `assignSplit`'s exact
    * portable-md5 assignment.
    *
    * Output: `df` + `split_key` (the id actually bucketed) + `split`.
    * Shape at scale: pair generation and closure are the dedup family's
    * cost (sub-quadratic banded/LSH paths); this adds one left equi-join
    * of the corpus against the (clustered-members-only, ≪ corpus)
    * canonical map and the same shuffle-free bucket projection as sp1.
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val canon = DedupClusters.canonicalize(pairs, aCol, bCol)
      .select(col("member_id").as("_ls_id"), col("canonical_id").as("_ls_canon"))
    val keyed = df.join(canon, col(idCol) === col("_ls_id"), "left")
      .withColumn("split_key", coalesce(col("_ls_canon"), col(idCol)))
      .drop("_ls_id", "_ls_canon")
    assignSplit(keyed, "split_key", trainPct, valPct)
  }

  /** Deterministic stratified sample: the first `n` rows per stratum in
    * portable-hash order — "give me a reproducible k-per-source eval
    * slice". Ordering by (bucket-of-id, id) makes the pick pseudo-random
    * but engine-portable and stable under repartitioning; `sample_rank`
    * records the order. One window shuffle partitioned by the stratum —
    * per-task state is one stratum's rows, and the rank short-circuits via
    * the `<=` filter (WindowGroupLimit pushes the limit into the sort at
    * execution), so skewed strata don't materialize beyond n winners.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"sample size must be positive: $n")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(bucket(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= n)
  }

  /** WEIGHTED sample without replacement, per stratum — the
    * quality-weighted corpus subsample (keep n docs per source, higher
    * weight → proportionally likelier), via the Efraimidis–Spirakis
    * A-Res scheme made deterministic: each row draws its uniform from
    * the portable md5 bucket space instead of an RNG, u ∈ (0,1) =
    * (md5_32(id) + 0.5)/2³², and ranks by the A-Res key ln(u)/w
    * descending — the top-n per stratum are EXACTLY a weight-
    * proportional sample over the hash-uniforms, reproducible across
    * engines and runs (the sampling property itself is spec-verified on
    * planted weights).
    *
    * Cross-engine parity: `ln` rides the same empirical libm-agreement
    * as kl1/dsir1/ppl1, with the key rounded to DECIMAL(28,12) before
    * ranking (ties then break on id in both engines; a tie at the
    * rounding boundary needs the double to land exactly on a 5·10⁻¹³
    * grid point — measure-zero for md5-derived uniforms). Width 28
    * leaves 10¹⁶ of integer headroom: |ln u| ≤ ~22, so even weights of
    * 10⁻¹⁴ can't overflow the cast (at (18,12), weights under ~2.3·10⁻⁵
    * overflowed — Spark nulled silently where DuckDB threw).
    *
    * WEIGHTS MUST BE POSITIVE to mean anything: a negative weight flips
    * the key's sign and would rank FIRST. Non-positive weights get a
    * null key — desc ordering ranks them last, i.e. "never preferred",
    * never silently first.
    *
    * Shape at scale: zero extra passes — a projection computing (u, key)
    * plus one per-stratum top-n window; no corpus statistics needed,
    * unlike [[temperatureMix]].
    */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
                     weightCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"sample size must be positive: $n")
    val w0 = col(weightCol).cast("double")
    val u = (md5_32(col(idCol)).cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = when(w0 > 0.0, (log(u) / w0)
      .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("_ws_key").desc, col(idCol))
    df.withColumn("_ws_key", key)
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= n)
      .drop("_ws_key")
  }

  /** TEMPERATURE-SCALED source mixing — the multilingual/source-balance
    * sampling recipe (mT5 / XLM-R style): sample sources proportional to
    * `n_s^α` instead of `n_s`, so with α < 1 head sources are downsampled
    * and tail sources keep (relatively) more mass. `targetFrac` sets the
    * overall corpus fraction kept; each source's keep-probability is
    * `min(1, targetFrac·N·share_s / n_s)` with `share_s = n_s^α / Σ n_t^α`,
    * decided per row by the same portable md5 bucket as [[assignSplit]].
    *
    * Cross-engine determinism: α = 0.5 makes the power a `sqrt` — IEEE
    * correctly-rounded, bit-identical everywhere (other α go through
    * libm `pow`; the threshold's DECIMAL(18,6) rounding then carries the
    * tf1 boundary argument instead of exactness). Each per-source
    * `sqrt` is rounded to DECIMAL(18,6) BEFORE the normalizer sums them,
    * so Σ is exact in any reduction order; the per-source threshold is a
    * fixed-order double expression of exact inputs, rounded to
    * DECIMAL(18,6), and compared against the integer bucket.
    *
    * Shape at scale: one tiny (source) aggregation, thresholds broadcast
    * back on the source key, then a pure filter — the mix pipelines into
    * the scan like [[mixBySource]], with the rates COMPUTED from corpus
    * statistics instead of hand-supplied.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double = 0.5, targetFrac: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(targetFrac > 0 && targetFrac <= 1,
      s"targetFrac must be in (0, 1]: $targetFrac")
    val pw: Column => Column =
      if (alpha == 0.5) sqrt else (c: Column) => pow(c, lit(alpha))
    val perSource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_tm_ns"))
      .withColumn("_tm_sq",
        pw(col("_tm_ns").cast("double")).cast("decimal(18,6)"))
    val totals = perSource
      .agg(sum(col("_tm_ns")).as("_tm_total"), sum(col("_tm_sq")).as("_tm_z"))
    val thr = perSource.crossJoin(broadcast(totals))
      .select(col(sourceCol),
        (least(lit(1.0),
          (lit(targetFrac) * col("_tm_total").cast("double")
            * (col("_tm_sq").cast("double") / col("_tm_z").cast("double")))
            / col("_tm_ns").cast("double")) * lit(100.0))
          .cast("decimal(18,6)").cast("double").as("_tm_thr"))
    df.join(broadcast(thr), sourceCol)
      .filter(bucket(col(idCol)).cast("double") < col("_tm_thr"))
      .drop("_tm_thr")
  }

  /** Deterministic weighted corpus mixing — the "dataset mixing weights"
    * step of a training-data pipeline: keep each row with its source's
    * sampling rate (percent kept, 0–100), decided by the same portable
    * md5 bucket, so the mix is reproducible across engines and immune to
    * partition layout. A plain filter: pipelines into the scan, no
    * shuffle.
    */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
                  ratesPct: Map[String, Int],
                  defaultPct: Int = 100): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      s"rates must be 0-100 percent: $ratesPct / $defaultPct")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (src, pct)) =>
      when(col(sourceCol) === src, lit(pct)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }
}
