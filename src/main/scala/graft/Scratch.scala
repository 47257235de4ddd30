package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

// temporary measurement scratchpad — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-46s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val nBlocks = 16
    val c = emb.select(col("vec_id").cast("long").as("vid"),
      Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.l2NormNative(col("v")))
      .withColumn("blk", pmod(xxhash64(col("vid")), lit(nBlocks)).cast("int"))
    val left = c.withColumn("pk", explode(sequence(
        col("blk") * nBlocks + col("blk"),
        col("blk") * nBlocks + lit(nBlocks - 1))))
      .select(col("vid").as("ida"), col("v").as("va"), col("nrm").as("na"),
        col("blk").as("blk_a"), col("pk"))
    val right = c.withColumn("pk", explode(transform(
        sequence(lit(0), col("blk")), i => i * nBlocks + col("blk"))))
      .select(col("vid").as("idb"), col("v").as("vb"), col("nrm").as("nb"),
        col("blk").as("blk_b"), col("pk"))
    val joined = left.join(right, Seq("pk"))
      .filter(col("blk_a") =!= col("blk_b") || col("ida") < col("idb"))

    time("pairs join only (count cosines skipped)") {
      noop(joined.select(col("pk"), col("ida"), col("idb"))) }
    time("pairs + split cosine") {
      noop(joined.select(col("pk"), col("ida"), col("idb"),
        Similarity.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")).as("c"))) }
    time("pairs + fused cosine") {
      noop(joined.select(col("pk"), col("ida"), col("idb"),
        Similarity.cosine(col("va"), col("vb")).as("c"))) }
    val edges = joined
      .withColumn("cosine", Similarity.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .select(col("pk"), col("cosine"), explode(array(
        struct(col("ida").as("src"), col("idb").as("dst")),
        struct(col("idb").as("src"), col("ida").as("dst")))).as("e"))
      .select(col("pk"), col("e.src").as("src"), col("e.dst").as("dst"), col("cosine"))
    time("edges (explode) noop") { noop(edges) }
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk"), col("src")).orderBy(col("cosine").desc, col("dst"))
    val partial = edges.withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= 3).select(col("src"), col("dst"), col("cosine"))
    time("partial topk noop") { noop(partial) }
    time("full knnGraph") { noop(Similarity.knnGraph(emb, "vec_id", "embedding", 3)) }
    spark.stop()
  }
}

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-46s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val nBlocks = 16
    val c = emb.select(col("vec_id").cast("long").as("vid"),
      Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.l2NormNative(col("v")))
      .withColumn("blk", pmod(xxhash64(col("vid")), lit(nBlocks)).cast("int"))
    val left = c.withColumn("pk", explode(sequence(
        col("blk") * nBlocks + col("blk"),
        col("blk") * nBlocks + lit(nBlocks - 1))))
      .select(col("vid").as("ida"), col("v").as("va"), col("nrm").as("na"),
        col("blk").as("blk_a"), col("pk"))
    val right = c.withColumn("pk", explode(transform(
        sequence(lit(0), col("blk")), i => i * nBlocks + col("blk"))))
      .select(col("vid").as("idb"), col("v").as("vb"), col("nrm").as("nb"),
        col("blk").as("blk_b"), col("pk"))
    val edges = left.join(right, Seq("pk"))
      .filter(col("blk_a") =!= col("blk_b") || col("ida") < col("idb"))
      .withColumn("cosine", Similarity.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .select(col("pk"), col("cosine"), explode(array(
        struct(col("ida").as("src"), col("idb").as("dst")),
        struct(col("idb").as("src"), col("ida").as("dst")))).as("e"))
      .select(col("pk"), col("e.src").as("src"), col("e.dst").as("dst"), col("cosine"))
    val k = 3
    // window form (current)
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk"), col("src")).orderBy(col("cosine").desc, col("dst"))
    time("window partial") {
      noop(edges.withColumn("lr", row_number().over(localW))
        .filter(col("lr") <= k).select(col("src"), col("dst"), col("cosine"))) }
    // agg form
    val agg = edges
      .groupBy(col("pk"), col("src"))
      .agg(slice(array_sort(collect_list(struct(
        coalesce(-col("cosine"), lit(2d)).as("negc"),
        col("dst").as("dst"),
        col("cosine").as("cosine")))), 1, k).as("top"))
      .select(col("src"), explode(col("top")).as("t"))
      .select(col("src"), col("t.dst").as("dst"), col("t.cosine").as("cosine"))
    time("agg partial") { noop(agg) }
    // equality of sets
    val a = edges.withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= k).select(col("src"), col("dst"), col("cosine"))
    val d1 = a.exceptAll(agg).count()
    val d2 = agg.exceptAll(a).count()
    println(s"set diff: $d1 / $d2")
    spark.stop()
  }
}

object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-46s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val before = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("apx"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    time("ag2 multi-distinct (expand)") { noop(before) }
    val parts = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("apx"),
        count(col("l_partkey")).as("exact_parts"))
    val orders = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_orderkey")).as("exact_orders"))
    val after = parts.join(orders, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("apx"), col("exact_parts"), col("exact_orders"))
    time("ag2 split distinct") { noop(after) }
    val b = before.select(col("l_returnflag"), col("apx"), col("exact_parts"), col("exact_orders"))
    println("diff: " + b.exceptAll(after).count() + " / " + after.exceptAll(b).count())
    spark.stop()
  }
}
