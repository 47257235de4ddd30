package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column zkey matches the reference interleave on random inputs") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)((rnd.nextLong().abs % 65536,
      rnd.nextLong().abs % 65536)) :+ ((0L, 0L)) :+ ((65535L, 65535L))
    val got = cases.toDF("x", "y")
      .select($"x", $"y", ZOrder.zkey($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.zkeyRef(x, y), s"($x,$y)")
    }
  }

  test("zkey bit-interleave basics") {
    // x=0b11, y=0b01 → even bits 1,1; odd bits 1,0 → 0b0111 = 7
    assert(ZOrder.zkeyRef(3, 1) == 7L)
    assert(ZOrder.zkeyRef(0, 1) == 2L) // y bit 0 lands at position 1
    assert(ZOrder.zkeyRef(1, 0) == 1L)
  }

  test("clustering tightens per-file min/max spans on BOTH dimensions") {
    // uniform grid: after z-clustering into 16 ranges, each range's x-span
    // and y-span must be far below the global span (that's what makes
    // row-group skipping fire); a single-column sort would leave the other
    // dimension's span at ~full width in every file.
    val n = 1 << 12
    val df = (0 until n).map(i => (i % 64L, i / 64L)).toDF("x", "y")
    val spans = ZOrder.cluster(df, "x", "y", numFiles = 16, bits = 6)
      .withColumn("part", spark_partition_id())
      .groupBy("part")
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .as[(Int, Long, Long)].collect()
    assert(spans.length == 16)
    val (maxXs, maxYs) = (spans.map(_._2).max, spans.map(_._3).max)
    // global span is 63 in each dimension; z-clustered files must be ≤ half
    assert(maxXs <= 32, s"x spans: ${spans.map(_._2).toSeq}")
    assert(maxYs <= 32, s"y spans: ${spans.map(_._3).toSeq}")
  }
}
