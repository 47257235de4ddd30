package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the split/sampling/statistics operators against
  * independent in-memory references:
  *
  *  - the split bucket is recomputed from `java.security.MessageDigest` —
  *    a second MD5 implementation — so the engine-portability claim
  *    ("any system with md5 reproduces the split") is checked against
  *    something other than Spark's own md5;
  *  - `stratifiedSample` must equal the literal contract: the first n rows
  *    per stratum under (bucket, id) order, ranks included;
  *  - `clusterSafeSplit` must give every member of a pair-connected
  *    component one split, and every singleton its plain `assignSplit`;
  *  - `groupedCorrelation` must reproduce the documented fixed double
  *    chain over exact integer moment sums, including the
  *    degenerate-group NULL and the 12-decimal rounding.
  */
class SplitsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString) // status carries the counterexample
  }

  /** Independent portable-hash reference: first 8 hex chars of md5(id)
    * (= first 4 digest bytes) as an unsigned int, mod 100.
    */
  private def refBucket32(id: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private def refBucket(id: String): Long = refBucket32(id) % 100

  private def refSplit(id: String, trainPct: Int, valPct: Int): String = {
    val b = refBucket(id)
    if (b < trainPct) "train"
    else if (b < trainPct + valPct) "validation"
    else "test"
  }

  test("assignSplit matches an independent MD5 implementation (portability)") {
    val idsGen = Gen.listOfN(20, Gen.choose(0L, 1000000L)).map(_.distinct)
    val pctGen = for {
      tr <- Gen.choose(1, 90); va <- Gen.choose(0, 100 - tr)
    } yield (tr, va)
    check(Prop.forAll(idsGen, pctGen) { case (ids, (tr, va)) =>
      val got = Splits.assignSplit(ids.toDF("id"), "id", tr, va)
        .as[(Long, String)].collect().toMap
      got == ids.map(id => id -> refSplit(id.toString, tr, va)).toMap
    })
  }

  test("stratifiedSample = first n per stratum under (bucket, id), with ranks") {
    val rowsGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 1000000L)))
      .map(_.distinctBy(_._2))
    check(Prop.forAll(rowsGen, Gen.choose(1, 4)) { (rows, n) =>
      val got = Splits
        .stratifiedSample(rows.toDF("stratum", "id"), "stratum", "id", n)
        .select("stratum", "id", "sample_rank")
        .as[(Int, Long, Int)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (s, rs) =>
        rs.map(_._2).sortBy(id => (refBucket(id.toString), id)).take(n)
          .zipWithIndex.map { case (id, i) => (s, id, i + 1) }
      }.toSet
      got == expected
    })
  }

  test("clusterSafeSplit: components share a split; singletons keep sp1's") {
    val idsGen = Gen.const((0L to 9L).toList)
    val pairsGen = Gen.listOfN(5, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    check(Prop.forAll(idsGen, pairsGen) { (ids, pairs) =>
      val got = Splits.clusterSafeSplit(ids.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b")
        .select("id", "split_key", "split")
        .as[(Long, Long, String)].collect()
      // in-memory min-root union-find over the pair graph
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      // completeness first: an operator regressing to an inner join
      // against the pair graph would drop singletons and pass a bare
      // forall vacuously
      got.length == ids.length &&
        got.map(_._1).toSet == ids.toSet &&
        got.forall { case (id, key, split) =>
          val expectedKey = if (inPairs(id)) find(id) else id
          key == expectedKey &&
            split == refSplit(expectedKey.toString, 80, 10)
        }
    })
  }

  test("weightedSample = the exact A-Res selection reference, ranks included") {
    val rowsGen = Gen.listOfN(20, for {
      s <- Gen.choose(0, 1)
      id <- Gen.choose(0L, 1000000L)
      w <- Gen.oneOf(0.0, -1.0, 1.0, 2.0, 5.0) // incl. the null-key cases
    } yield (s, id, w)).map(_.distinctBy(_._2))
    check(Prop.forAll(rowsGen, Gen.choose(1, 4)) { (rows, n) =>
      val got = Splits
        .weightedSample(rows.toDF("stratum", "id", "w"), "stratum", "id", "w", n)
        .select("stratum", "id", "sample_rank")
        .as[(Int, Long, Int)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (s, rs) =>
        val keyed = rs.map { case (_, id, w) =>
          val u = (refBucket32(id.toString).toDouble + 0.5) / 4294967296.0
          val key = if (w > 0.0)
            Some(BigDecimal(math.log(u) / w)
              .setScale(12, BigDecimal.RoundingMode.HALF_UP))
          else None // non-positive weight → null key, ranked last
          (id, key)
        }
        // desc with nulls last, id-asc tie-break — the window's ordering
        keyed.sortWith { case ((ida, ka), (idb, kb)) =>
          (ka, kb) match {
            case (Some(a), Some(b)) => if (a != b) a > b else ida < idb
            case (Some(_), None) => true
            case (None, Some(_)) => false
            case (None, None) => ida < idb
          }
        }.take(n).zipWithIndex.map { case ((id, _), i) => (s, id, i + 1) }
      }.toSet
      got == expected
    })
  }

  test("temperatureMix keeps exactly the reference threshold cut (α = 0.5)") {
    val rowsGen = Gen.listOfN(30, for {
      src <- Gen.oneOf("web", "code", "books")
      id <- Gen.choose(0L, 1000000L)
    } yield (id, src)).map(_.distinctBy(_._1))
    check(Prop.forAll(rowsGen, Gen.oneOf(0.3, 0.5, 1.0)) { (rows, frac) =>
      val got = Splits
        .temperatureMix(rows.toDF("id", "source"), "id", "source",
          alpha = 0.5, targetFrac = frac)
        .select("id").as[Long].collect().toSet
      val perSource = rows.groupBy(_._2).map { case (s, rs) =>
        s -> rs.length.toLong
      }
      val total = rows.length.toLong
      // each per-source sqrt rounds to DECIMAL(18,6) BEFORE the sum
      val sq = perSource.map { case (s, ns) =>
        s -> BigDecimal(math.sqrt(ns.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val z = sq.values.sum
      val thr = perSource.map { case (s, ns) =>
        val raw = math.min(1.0,
          frac * total.toDouble * (sq(s).doubleValue / z.doubleValue)
            / ns.toDouble) * 100.0
        s -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .doubleValue
      }
      val expected = rows.collect {
        case (id, s) if refBucket(id.toString).toDouble < thr(s) => id
      }.toSet
      got == expected
    })
  }

  test("groupedCorrelation reproduces the documented double chain exactly") {
    val rowsGen = Gen.listOfN(20,
      for {
        g <- Gen.choose(0, 2)
        x <- Gen.choose(-5, 5)
        y <- Gen.choose(-5, 5)
      } yield (g, x, y))
    check(Prop.forAll(rowsGen) { rows =>
      val got = Stats
        .groupedCorrelation(rows.toDF("g", "x", "y"), "g", "x", "y")
        .as[(Int, Long, Option[Double])].collect()
        .map { case (g, n, c) => g -> ((n, c)) }.toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        // exact integer moment sums, then the operator's fixed IEEE chain
        val n = rs.length.toDouble
        val sx = rs.map(_._2).sum.toDouble
        val sy = rs.map(_._3).sum.toDouble
        val sxy = rs.map(r => r._2.toLong * r._3).sum.toDouble
        val sxx = rs.map(r => r._2.toLong * r._2).sum.toDouble
        val syy = rs.map(r => r._3.toLong * r._3).sum.toDouble
        val num = n * sxy - sx * sy
        val vx = n * sxx - sx * sx
        val vy = n * syy - sy * sy
        val c =
          if (vx <= 0.0 || vy <= 0.0) None
          else Some(BigDecimal(num / (math.sqrt(vx) * math.sqrt(vy)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).doubleValue)
        g -> ((rs.length.toLong, c))
      }
      got.keySet == expected.keySet && got.forall { case (g, (n, c)) =>
        val (en, ec) = expected(g)
        n == en && ((c, ec) match {
          case (None, None) => true
          case (Some(a), Some(b)) => math.abs(a - b) <= 1e-12
          case _ => false
        })
      }
    })
  }
}
