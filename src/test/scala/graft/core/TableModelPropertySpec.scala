package graft.core

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based randomized testing of the managed-table mutation layer:
  * random SEQUENCES of upserts and compactions must leave the table equal
  * to a trivial in-memory key→value map. The per-transition specs
  * (TableUpsertSpec/CompactionSpec) cover each edge in isolation; this
  * covers their COMPOSITIONS — an upsert over a just-compacted table, a
  * compaction over a partition a previous upsert emptied, keys moving
  * partitions repeatedly — where layout state left by one operation is
  * the next one's input. Runs the same sequence against a plain table and
  * a partitioned one (partition derived from the value, so every update
  * can MOVE its key across partitions — the stale-row/emptied-partition
  * path on every step).
  */
class TableModelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(3)

  private sealed trait Op
  private final case class Up(batch: List[(Long, Long)]) extends Op
  private case object CompactAll extends Op
  private final case class CompactPart(p: Long) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.listOfN(6, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 99L)))
      .map(b => Up(b.distinctBy(_._1))),
    2 -> Gen.const(CompactAll),
    2 -> Gen.choose(0L, 2L).map(CompactPart))

  // first op is always an upsert so the table exists before compactions
  private val seqGen: Gen[List[Op]] = for {
    first <- opGen.retryUntil(_.isInstanceOf[Up])
    rest <- Gen.listOfN(5, Gen.frequency(
      5 -> opGen.retryUntil(_.isInstanceOf[Up]),
      4 -> opGen))
  } yield first :: rest

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("random upsert/compact sequences == the in-memory map (plain + partitioned)") {
    check(Prop.forAll(seqGen) { ops =>
      val plain = new TableStore(spark, PipelineConfig(
        catalog = "graftc", schema = s"tmp_${System.nanoTime()}"))
      val parted = new TableStore(spark, PipelineConfig(
        catalog = "graftc", schema = s"tmq_${System.nanoTime()}"))
      try {
        var model = Map.empty[Long, Long]
        var created = false
        ops.foreach {
          case Up(batch) =>
            val df = batch.toDF("id", "v")
              .withColumn("p", org.apache.spark.sql.functions.col("v") % 3)
            if (!created) {
              plain.save(df, "dim", "t")
              parted.savePartitioned(df, "dim", "t", Seq("p"))
              created = true
            } else {
              plain.upsert(df, "dim", "t", Seq("id"))
              parted.upsert(df, "dim", "t", Seq("id"))
            }
            model = model ++ batch
          case CompactAll if created =>
            Compaction.compactTable(spark, plain.fqn("dim", "t"), 1000L)
            // the layout-correct form for the partitioned twin: compactTable
            // refuses partitioned targets (spec below)
            Compaction.compactPartitions(spark, parted.fqn("dim", "t"),
              "p >= 0", 1000L)
          case CompactPart(p) if created && model.values.exists(_ % 3 == p) =>
            Compaction.compactPartitions(spark, parted.fqn("dim", "t"),
              s"p = $p", 1000L)
          case _ => () // compaction before the table exists / empty slice
        }
        val gotPlain = plain.load("dim", "t").select("id", "v")
          .as[(Long, Long)].collect()
        val gotParted = parted.load("dim", "t")
          .select("id", "v", "p").as[(Long, Long, Long)].collect()
        // row counts asserted BEFORE the map collapse: a stale-row
        // regression leaves a duplicate id that .toMap would hide
        gotPlain.length == model.size &&
          gotPlain.toMap == model &&
          gotParted.length == model.size &&
          gotParted.map(r => r._1 -> r._2).toMap == model &&
          gotParted.forall(r => r._3 == r._2 % 3) // derived partition moved
      } finally { plain.dropAll(); parted.dropAll() }
    })
  }

  test("compactTable refuses partitioned targets with the layout-preserving fix") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"tmr_${System.nanoTime()}"))
    try {
      store.savePartitioned(
        Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("id", "v", "p"),
        "dim", "t", Seq("p"))
      val e = intercept[IllegalArgumentException] {
        Compaction.compactTable(spark, store.fqn("dim", "t"), 1000L)
      }
      assert(e.getMessage.contains("compactPartitions"))
      // table untouched by the refusal
      assert(store.load("dim", "t").count() == 2)
    } finally store.dropAll()
  }
}
