package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.DataFrame

/** Theta sketches for SET-EXPRESSION cardinality estimation — the
  * capability HLL lacks: HLL unions, but only theta (KMV-style: keep the
  * k minimum hashes) supports INTERSECTION and difference, answering
  * "how much do two sources overlap?" before merging corpora, dedup
  * planning ("what fraction of the crawl is already ingested?"), or
  * audience-overlap questions — without a pairwise join.
  *
  * Scale shape: one `mapPartitions` pass builds a (group, sketch) per
  * partition (each sketch is ≤ 8·2^lgK bytes; lgK=12 → ≤ 32 KB), the
  * driver unions per group — blobs-per-group × partitions of KB-class
  * data, the same metadata-class collect as [[CountMin]]. Set algebra on
  * the compact sketches is then driver-side arithmetic, zero further
  * scans: any pair/triple overlap of G groups from G stored sketches.
  *
  * Determinism: the retained set is the k smallest murmur hashes under
  * the fixed default seed — independent of row order, partitioning, and
  * merge order — so estimates are reproducible per dataset (the property
  * the oracle booleans rely on). Below ~2^lgK distinct keys the sketch
  * is in exact mode and the estimate IS the exact count; beyond, the
  * relative standard error is ≈ 1/√(k−1) (~1.6% at lgK=12).
  */
object ThetaSketches {

  /** One compact theta sketch of `keyCol` (LONG) per `groupCol` value. */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
                    lgK: Int = 12): Map[String, CompactSketch] = {
    require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")
    val sp = df.sparkSession
    import sp.implicits._
    // Null policy: a null key carries no identity, so it cannot count as a
    // distinct element — drop it before the Dataset decoder (which would
    // crash unboxing null into a primitive Long). Null GROUP values are
    // fine: the String side of the tuple decoder is nullable, and they
    // sketch under the null group like any other.
    val partial: Array[(String, Array[Byte])] = df
      .select(org.apache.spark.sql.functions.col(groupCol).cast("string"),
        org.apache.spark.sql.functions.col(keyCol).cast("long"))
      .filter(org.apache.spark.sql.functions.col(keyCol).isNotNull)
      .as[(String, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.Map.empty[String, UpdateSketch]
        it.foreach { case (g, k) =>
          acc.getOrElseUpdate(g, UpdateSketch.builder()
            .setLogNominalEntries(lgK).build()).update(k)
        }
        acc.iterator.map { case (g, s) =>
          (g, s.compact(true, null).toByteArray)
        }
      }.collect()
    partial.groupBy(_._1).map { case (g, blobs) =>
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      blobs.foreach { case (_, b) =>
        u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
      }
      g -> u.getResult
    }
  }

  /** |A ∩ B| estimate from two compact sketches (driver arithmetic). */
  def intersectionEstimate(a: CompactSketch, b: CompactSketch): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a)
    i.intersect(b)
    i.getResult.getEstimate
  }

  /** |A ∪ B| estimate from two compact sketches. */
  def unionEstimate(a: CompactSketch, b: CompactSketch,
                    lgK: Int = 12): Double = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(a)
    u.union(b)
    u.getResult.getEstimate
  }
}
