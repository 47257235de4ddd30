package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER canonicalization — the step after pair
  * generation in every production dedup pipeline: pairs (a,b) only say
  * "same-ish"; to drop duplicates you need the transitive closure (a~b,
  * b~c ⇒ {a,b,c} is one cluster) and one canonical survivor per cluster.
  *
  * Implemented as distributed min-label propagation over the undirected
  * pair graph: every vertex starts labeled with itself; each round a
  * vertex takes the minimum label among itself and its neighbors; at
  * fixpoint the label is the component's minimum id — the canonical doc.
  *
  * Scale shape: each round is one equi-join (edges ⋈ labels on an 8-byte
  * key) + one groupBy min — compact-key shuffles, map-side combinable,
  * nothing on the driver but a converged? boolean per round. Round count
  * is the component DIAMETER, not corpus size: near-dup clusters are
  * shallow (stars around a popular document, short chains), so 3-5
  * rounds close web-scale corpora. `localCheckpoint` truncates the plan
  * lineage each round (iterative self-reference would otherwise compound
  * the DAG); it stores blocks on executors, so on a cluster with
  * preemptible/decommissioning executors swap in reliable
  * `checkpoint()` (HDFS-backed) — same semantics, crash-proof lineage
  * cut. For adversarially long chains the same loop accepts a
  * pointer-jumping variant (label ← label-of-label, O(log d) rounds);
  * plain propagation is what the data needs and keeps every round a
  * single join.
  */
object DedupClusters {

  /** (member id → canonical id) for every vertex of the pair graph —
    * docs in no pair are their own cluster and are omitted (join the
    * result back left-outer + coalesce to canonicalize a full corpus).
    */
  def canonicalize(pairs: DataFrame, aCol: String, bCol: String,
                   maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .union(pairs
        .select(col(bCol).cast("long").as("u"), col(aCol).cast("long").as("v")))
      .distinct()
      .localCheckpoint() // edges are reused every round; cut the source plan
    var labels = edges.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("lbl"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // pull each neighbor's current label, take the minimum with our own
      val next = edges
        .join(labels.select(col("u").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u")).agg(min(col("nlbl")).as("pulled"))
        .join(labels, "u")
        .select(col("u"), least(col("lbl"), col("pulled")).as("lbl"))
        .localCheckpoint() // truncate the iterative lineage
      converged = next.join(labels.withColumnRenamed("lbl", "prev"), "u")
        .filter(col("lbl") =!= col("prev")).isEmpty
      labels = next
      iter += 1
    }
    require(converged,
      s"label propagation did not converge in $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters or switch " +
        "to the pointer-jumping variant")
    labels.select(col("u").as("member_id"), col("lbl").as("canonical_id"))
  }
}
