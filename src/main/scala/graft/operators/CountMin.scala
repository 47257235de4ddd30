package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count–Min sketch frequency estimation with sketch MERGE — the
  * complement to [[HeavyHitters]]' SpaceSaving: where SpaceSaving keeps
  * the top-m items, Count–Min answers point frequency queries for ANY
  * key from a fixed-size array, with the classic one-sided guarantee
  * (Cormode–Muthukrishnan): estimate ≥ true count always, and
  * estimate ≤ true count + ε·N with probability ≥ confidence.
  *
  * Scale shape — the "sketch as data" pattern (hll1's scheme applied to
  * frequencies): per-group sketches are built by Spark's native
  * `count_min_sketch` aggregate (map-side combinable; each task emits one
  * ~depth×width array, not the key space), persist as a tiny table, and
  * any scope-combination question (per-day → arbitrary range) is a
  * sketch merge — `CountMinSketch.mergeInPlace`, cells add — not a
  * rescan. The merged blob is KB-sized: driver-side merge of G group
  * sketches is metadata-class work, same as collecting partition stats.
  */
object CountMin {

  /** Per-group Count–Min sketches over a LONG key column, via the
    * codegen'd native aggregate. eps/confidence size the array (Spark's
    * CountMinSketchImpl): width = ⌈2/ε⌉ (2000 at ε=0.001),
    * depth = ⌈log₂(1/(1−conf))⌉ (7 at conf=0.99).
    */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
                    eps: Double = 0.001, confidence: Double = 0.99,
                    seed: Int = 42): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"))

  /** Merge sketch blobs (must share eps/confidence/seed) into one. */
  def mergeSketches(blobs: Seq[Array[Byte]]): CountMinSketch = {
    require(blobs.nonEmpty, "no sketches to merge")
    val merged = CountMinSketch.readFrom(blobs.head)
    blobs.tail.foreach(b => merged.mergeInPlace(CountMinSketch.readFrom(b)))
    merged
  }

  /** Point-estimate the given LONG keys from the merged per-group
    * sketches. Returns (key, estimate) rows plus the sketch's ε·N bound
    * so callers can assert the CM guarantee relationally.
    */
  def estimateKeys(sketches: DataFrame,
                   keys: Seq[Long]): (Map[Long, Long], Long) = {
    val blobs = sketches.select(col("cms")).collect()
      .map(_.getAs[Array[Byte]](0)).toIndexedSeq
    val merged = mergeSketches(blobs)
    val bound = math.ceil(merged.relativeError() * merged.totalCount()).toLong
    (keys.map(k => k -> merged.estimateCount(Long.box(k))).toMap, bound)
  }
}
