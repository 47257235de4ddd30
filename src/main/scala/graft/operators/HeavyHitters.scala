package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters sketch as a typed Spark [[Aggregator]] — the
  * one-pass, mergeable alternative to a full groupBy+count when only the
  * head of the frequency distribution matters (token/domain/user-id
  * censuses at 100TB, where the exact aggregation shuffles billions of
  * distinct keys to answer a top-20 question).
  *
  * Guarantees (Metwally et al., the standard SpaceSaving bounds): with
  * capacity m over n observations, every item with true count > n/m is
  * in the sketch, and every reported count overestimates the true count
  * by at most its recorded `err` ≤ n/m. When the distinct-item count
  * never exceeds m the sketch is EXACT (no eviction happens) and the
  * result is independent of partitioning/merge order — the regime the
  * oracle-checked catalog entry runs in. Under eviction the top set is
  * correct for any item separated by more than n/m, while exact ranks
  * among near-ties can vary with merge order (documented sketch trade).
  *
  * The aggregator is partial-aggregation friendly by construction:
  * per-partition sketches reduce locally and `merge` combines two
  * sketches (absent items substitute the absent side's minimum counter —
  * the mergeable-SpaceSaving rule — then re-truncate to capacity), the
  * same map-side-combine shape as a built-in agg, shuffling one
  * m-entry sketch per partition instead of the key space.
  *
  * State is an encoder-friendly immutable Map, so the eviction-regime
  * hot path pays a persistent-map copy per element plus an O(m) minimum
  * scan per eviction; the Metwally stream-summary structure does both in
  * O(1) with mutable linked buckets, the right trade if this aggregator
  * ever becomes the bottleneck rather than the scan feeding it.
  */
object HeavyHitters {

  /** (token, count, err): `count` overestimates by at most `err`. */
  final case class Entry(item: String, count: Long, err: Long)

  /** Sketch state: observation count + capped item map. */
  final case class Sketch(n: Long, entries: Map[String, (Long, Long)])

  final class SpaceSavingAgg(capacity: Int)
      extends Aggregator[String, Sketch, Seq[Entry]] {
    require(capacity > 0, s"capacity must be positive: $capacity")

    override def zero: Sketch = Sketch(0L, Map.empty)

    override def reduce(b: Sketch, item: String): Sketch = {
      if (item == null) return b
      val n = b.n + 1
      b.entries.get(item) match {
        case Some((c, e)) =>
          Sketch(n, b.entries.updated(item, (c + 1, e)))
        case None if b.entries.size < capacity =>
          Sketch(n, b.entries.updated(item, (1L, 0L)))
        case None =>
          // evict the minimum-count entry; the newcomer inherits its
          // count as upper bound, recorded as err (deterministic victim:
          // min count, then lexicographic)
          val (vict, (vc, _)) = b.entries.minBy { case (k, (c, _)) => (c, k) }
          Sketch(n, (b.entries - vict).updated(item, (vc + 1, vc)))
      }
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      // Mergeable-SpaceSaving rule: an item ABSENT from a FULL sketch may
      // still have occurred up to that sketch's minimum counter times
      // (that is what eviction erased), so the absent side contributes
      // its minimum count — as both count and error — not zero.
      // Substituting 0 would understate counts and void the
      // "count ≤ true + err" bound exactly in the multi-partition regime.
      def minCount(s: Sketch): Long =
        if (s.entries.size < capacity) 0L
        else s.entries.valuesIterator.map(_._1).min
      val minA = minCount(a)
      val minB = minCount(b)
      val combined = (a.entries.keySet ++ b.entries.keySet).map { k =>
        val (ac, ae) = a.entries.getOrElse(k, (minA, minA))
        val (bc, be) = b.entries.getOrElse(k, (minB, minB))
        k -> (ac + bc, ae + be)
      }.toMap
      val kept =
        if (combined.size <= capacity) combined
        else combined.toSeq
          .sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
      Sketch(a.n + b.n, kept)
    }

    override def finish(r: Sketch): Seq[Entry] =
      r.entries.toSeq
        .map { case (k, (c, e)) => Entry(k, c, e) }
        .sortBy(en => (-en.count, en.item))

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** One-row DataFrame holding the sketch of `itemCol` as
    * `array<struct<item,count,err>>` sorted by count desc, item asc.
    * The Aggregator crosses into the untyped DataFrame world via
    * `functions.udaf`, so the same sketch also composes with groupBy.
    */
  def sketch(df: DataFrame, itemCol: Column, capacity: Int): DataFrame = {
    val fn = udaf(new SpaceSavingAgg(capacity), Encoders.STRING)
    df.select(itemCol.cast("string").as("item"))
      .agg(fn(col("item")).as("sketch"))
  }
}
