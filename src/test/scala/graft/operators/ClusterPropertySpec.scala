package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the cluster-canonicalization family against an
  * independent in-memory union-find: random edge lists (self-loops,
  * duplicates, reversed edges, chains that need several propagation
  * rounds) exercise the convergence and incremental-merge logic far past
  * what hand-built fixtures reach. The reference unions toward the MINIMUM
  * root, so its component representative equals the operator's canonical
  * (min-id) contract by construction.
  */
class ClusterPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(4)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString) // status carries the counterexample
  }

  // small vertex domain → collisions, multi-edge components, chains
  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L)))

  /** member → min id of its connected component, for every vertex that
    * appears in any edge (the operator's exact output contract).
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)], pj: Boolean): Map[Long, Long] =
    DedupClusters
      .canonicalize(edges.toDF("a", "b"), "a", "b", pointerJumping = pj)
      .as[(Long, Long)].collect().toMap

  test("canonicalize equals in-memory union-find on arbitrary graphs") {
    check(Prop.forAll(edgesGen) { edges =>
      run(edges, pj = false) == unionFind(edges)
    })
  }

  test("pointer jumping is a pure speedup: same fixpoint on arbitrary graphs") {
    check(Prop.forAll(edgesGen) { edges =>
      run(edges, pj = true) == unionFind(edges)
    })
  }

  test("incremental merge equals batch closure over the union pair set") {
    check(Prop.forAll(edgesGen, edgesGen) { (p1, p2) =>
      val existing = DedupClusters
        .canonicalize(p1.toDF("a", "b"), "a", "b")
      val got = DedupClusters
        .incrementalCanonicalize(existing, p2.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      got == unionFind(p1 ++ p2)
    })
  }
}
