package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed windows: size 4, overlap 2 over 10 tokens") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Chunking.chunk(df, "doc_id", "text", size = 4, overlap = 2)
      .orderBy("chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t5 t6 t7 t8", 4),
      (1L, 3, "t7 t8 t9 t10", 4)))
  }

  test("short and exact-size docs yield exactly one chunk") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Chunking.chunk(df, "doc_id", "text", size = 4, overlap = 2)
      .orderBy("doc_id").as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((1L, 0, "a b", 2), (2L, 0, "a b c d", 4)))
  }

  test("final partial window keeps the tail tokens") {
    // 5 tokens, size 4, stride 2: windows [1..4], [3..5]
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunking.chunk(df, "doc_id", "text", size = 4, overlap = 2)
      .orderBy("chunk_idx").as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((1L, 0, "a b c d", 4), (1L, 1, "c d e", 3)))
  }

  test("dropping the overlap prefix of each later chunk reconstructs the doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val size = 64; val overlap = 16
    val rebuilt = Chunking.chunk(docs, "doc_id", "text", size, overlap)
      .withColumn("part",
        when($"chunk_idx" === 0, $"chunk_text")
          .otherwise(array_join(
            slice(split($"chunk_text", " "), overlap + 1, size), " ")))
      .groupBy($"doc_id")
      .agg(array_join(array_sort(collect_list(struct($"chunk_idx", $"part")))
        .getField("part"), " ").as("rebuilt"))
    val bad = docs.join(rebuilt, "doc_id")
      .filter($"text" =!= $"rebuilt")
    assert(bad.isEmpty, bad.take(1).mkString)
  }

  test("chunking is a shuffle-free single-pass projection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Chunking.chunk(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("invalid parameters are rejected loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "doc_id", "text", size = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "doc_id", "text", size = 4, overlap = 4)
    }
  }

  test("language mix flags code-switched docs; tie-break is lang-ascending") {
    import org.apache.spark.sql.functions._
    val en = Seq.fill(8)("the cat of a dog and").mkString(" ")   // 48 tokens
    val de = Seq.fill(8)("der hund und die das").mkString(" ")   // 40 tokens
    val docs = Seq(
      (1L, s"$en $de"),   // ~3 chunks: en, en/de boundary, de → mixed
      (2L, en),           // pure English → not mixed
      (3L, "zz qq ww")    // no markers → und, not mixed
    ).toDF("doc_id", "text")
    val got = Chunking.languageMix(docs, "doc_id", "text", chunkSize = 32)
      .select($"doc_id", $"n_langs", $"dominant_lang", $"mixed")
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4, "code-switched doc flagged mixed")
    assert(got(1L)._2 >= 2)
    assert(got(2L)._3 == "en" && !got(2L)._4)
    assert(got(3L)._3 == "und" && !got(3L)._4)
  }

  test("chunk-grain dedup counts shared windows, not whole-doc digests") {
    // docs 1 and 2 share their FIRST 2-token window only; doc 3 is unique;
    // doc 4 repeats a window internally (both occurrences count as dups)
    val df = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "p q r s"),
      (4L, "z z z z")).toDF("doc_id", "text")
    // size=2 → windows: 1:[a b][c d], 2:[a b][x y], 3:[p q][r s],
    // 4:[z z][z z] (its two windows are identical)
    val got = TextDedup.chunkDupStats(df, "doc_id", "text", size = 2)
      .select($"doc_id", $"n_chunks", $"n_dup_chunks")
      .as[(Long, Long, Long)].collect().map { case (d, n, k) => d -> ((n, k)) }.toMap
    assert(got == Map(
      1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 0L)),
      4L -> ((2L, 2L))))
  }

  test("line-grain dedup counts corpus-wide duplicate lines, skips empties") {
    // docs 1 and 2 share one line; doc 3 repeats a line internally (both
    // occurrences dup); blank lines never count toward n_lines
    val df = Seq(
      (1L, "shared line\nunique one"),
      (2L, "shared line\nother text\n"),
      (3L, "twin\ntwin")).toDF("doc_id", "text")
    val got = TextDedup.lineDupStats(df, "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_dup_lines")
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, k) => d -> ((n, k)) }.toMap
    assert(got == Map(
      1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 2L))))
  }
}

class BloomNewDocsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")

  private def exactNew(corpus: org.apache.spark.sql.DataFrame,
                       batch: org.apache.spark.sql.DataFrame): Set[Long] =
    batch.join(corpus.select(md5($"text").as("d")),
        md5(batch("text")) === col("d"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet

  test("bloom + verify equals the exact digest anti-join") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val replays = corpus.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val batch = docs.filter($"doc_id" % 10 === 0).unionByName(replays)
    val got = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text")
      .as[Long].collect().toSet
    assert(got == exactNew(corpus, batch))
    assert(got.nonEmpty && got.size < batch.count())
  }

  test("a saturated filter (forced false positives) still yields the exact set") {
    // expectedItems=1 over a 450-doc corpus drives the fpp toward 1 — every
    // batch doc becomes a candidate — yet the verify join keeps the output
    // exact. The sketch moderates cost, never correctness.
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val got = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text",
      expectedItems = 1L)
      .as[Long].collect().toSet
    assert(got == exactNew(corpus, batch))
  }

  test("verify joins broadcast the candidate side — corpus is never shuffled") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val plan = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("batch-internal duplicates are all emitted when new to the corpus") {
    val corpus = Seq((1L, "old text")).toDF("doc_id", "text")
    val batch = Seq((10L, "fresh"), (11L, "fresh"), (12L, "old text"))
      .toDF("doc_id", "text")
    val got = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text")
      .as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("all-duplicate batch: broadcast and shuffle verify paths agree") {
    // a replayed batch (100% duplicates) saturates the candidate gate; the
    // two fractions force each verify path in turn and must agree exactly
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = corpus.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val want = exactNew(corpus, batch) // empty: every text already in corpus
    assert(want.isEmpty)
    val viaBroadcast = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text",
      broadcastCandidateFraction = 1.0).as[Long].collect().toSet
    val viaShuffle = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text",
      broadcastCandidateFraction = 0.0).as[Long].collect().toSet
    assert(viaBroadcast == want && viaShuffle == want)
  }

  test("mixed batch: both verify paths equal the exact anti-join") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val replays = corpus.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val batch = docs.filter($"doc_id" % 10 === 0).unionByName(replays)
    val want = exactNew(corpus, batch)
    val viaBroadcast = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text",
      broadcastCandidateFraction = 1.0).as[Long].collect().toSet
    val viaShuffle = TextDedup.bloomNewDocs(corpus, batch, "doc_id", "text",
      broadcastCandidateFraction = 0.0).as[Long].collect().toSet
    assert(viaBroadcast == want && viaShuffle == want)
  }
}

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed lift on a two-doc corpus") {
    // tokens: [a b a b], [a c] → U=6, T=4; "a b" twice, u_a=3, u_b=2
    // lift = ((2/4) * (6/3)) * (6/2) = 3.0
    val df = Seq("a b a b", "a c").toDF("text")
    val got = NgramStats.collocations(df, "text", minCount = 2)
      .as[(String, Long, Long, Long, java.math.BigDecimal)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == Seq(("a b", 2L, 3L, 2L)))
    assert(got.head._5 == new java.math.BigDecimal("3.000000"))
  }

  test("minCount=1 keeps every distinct bigram") {
    val df = Seq("a b a b", "a c").toDF("text")
    val got = NgramStats.collocations(df, "text", minCount = 1)
      .select($"bigram").as[String].collect().toSet
    assert(got == Set("a b", "b a", "a c"))
  }

  test("single-token and empty docs contribute no bigrams but count tokens") {
    val df = Seq("a", "a b").toDF("text")
    val got = NgramStats.collocations(df, "text", minCount = 1)
      .as[(String, Long, Long, Long, java.math.BigDecimal)].collect().toSeq
    // U=3, T=1; "a b": lift = ((1/1)*(3/2))*(3/1) = 4.5
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == Seq(("a b", 1L, 2L, 1L)))
    assert(got.head._5 == new java.math.BigDecimal("4.500000"))
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added / removed / changed / unchanged / null transitions") {
    val old = Seq(
      (1L, Some(10.0), "x"),  // unchanged
      (2L, Some(20.0), "y"),  // changed (value)
      (3L, Some(30.0), "z"),  // removed
      (5L, None: Option[Double], "n")) // null -> null = unchanged
      .toDF("k", "price", "tag")
    val neu = Seq(
      (1L, Some(10.0), "x"),
      (2L, Some(21.0), "y"),
      (4L, Some(40.0), "w"),  // added
      (5L, None: Option[Double], "n"))
      .toDF("k", "price", "tag")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null to value counts as changed (null-safe compare)") {
    val old = Seq((1L, None: Option[Double])).toDF("k", "v")
    val neu = Seq((1L, Some(1.0))).toDF("k", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "changed")))
  }

  test("composite keys and explicit valueCols") {
    val old = Seq((1L, "a", 1.0, "ignore1")).toDF("k1", "k2", "v", "noise")
    val neu = Seq((1L, "a", 1.0, "ignore2"), (2L, "b", 2.0, "n"))
      .toDF("k1", "k2", "v", "noise")
    val got = SnapshotDiff.diff(old, neu, Seq("k1", "k2"), Seq("v"))
      .as[(Long, String, String)].collect().toSeq
    // noise differs but is not compared; only the new key shows up
    assert(got == Seq((2L, "b", "added")))
  }

  test("missing columns are rejected loudly") {
    val old = Seq((1L, 1.0)).toDF("k", "v")
    val neu = Seq((1L, 1.0)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, neu, Seq("k"))
    }
  }

  test("diffWithValues carries new-side values; applyDelta closes the loop") {
    val old = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)),
      (5L, None: Option[Double])).toDF("k", "v")
    val neu = Seq(
      (1L, Some(10.0)), (2L, Some(21.0)), (4L, Some(40.0)),
      (5L, Some(5.0))).toDF("k", "v")
    val delta = SnapshotDiff.diffWithValues(old, neu, Seq("k"))
    val byKey = delta.as[(Long, String, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byKey == Map(
      2L -> (("changed", Some(21.0))),
      3L -> (("removed", None)),
      4L -> (("added", Some(40.0))),
      5L -> (("changed", Some(5.0)))))
    // old + delta == new, exactly, including the null-to-value transition
    val applied = SnapshotDiff.applyDelta(old, delta, Seq("k"))
      .as[(Long, Option[Double])].collect().toSet
    val want = neu.as[(Long, Option[Double])].collect().toSet
    assert(applied == want)
  }

  test("applyDelta on an empty delta is the identity") {
    val old = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val delta = SnapshotDiff.diffWithValues(old, old, Seq("k"))
    assert(delta.isEmpty)
    val applied = SnapshotDiff.applyDelta(old, delta, Seq("k"))
      .as[(Long, Double)].collect().toSet
    assert(applied == Set((1L, 1.0), (2L, 2.0)))
  }

  test("a value column named 'change' is rejected loudly") {
    val old = Seq((1L, "a")).toDF("k", "change")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, old, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.applyDelta(old,
        Seq((1L, "added", "a")).toDF("k", "change", "v"), Seq("k"))
    }
  }

  test("checkUniqueKeys fails loudly on a duplicated key; clean inputs pass") {
    val dup = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val clean = Seq((1L, 1.0), (2L, 3.0)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(dup, clean, Seq("k"), checkUniqueKeys = true)
    }
    assert(ex.getMessage.contains("duplicated key"))
    intercept[IllegalArgumentException] {
      SnapshotDiff.diffWithValues(clean, dup, Seq("k"), checkUniqueKeys = true)
    }
    val got = SnapshotDiff.diff(clean, clean, Seq("k"), checkUniqueKeys = true)
    assert(got.isEmpty)
  }
}
