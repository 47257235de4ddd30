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
  * rounds close web-scale corpora.
  *
  * Iteration state (optimization round 20, guide §1.2/§2.4): both the
  * edge set and each round's label frame get a lineage CUT to a leaf —
  * the cut is load-bearing, not hygiene: labels are referenced 2-3× per
  * round, so an uncut plan doubles in size every round (exponential
  * planning time; a persist-only variant OOMed the driver). The cuts
  * are LAZY (`localCheckpoint(eager = false)`, or reliable
  * `checkpoint(eager = false)` with `useReliableCheckpoint = true` —
  * the right setting on a cluster with preemptible/decommissioning
  * executors, requires `sparkContext.setCheckpointDir`, checked
  * loudly), so each round runs exactly ONE action: a 1-row
  * changed-label aggregate that materializes the round's blocks AND
  * returns the convergence signal — where the r19 shape paid an eager
  * cut (full pass) plus a separate `isEmpty` scan per round. At scale
  * that is one fewer pass over the label frame per round; at bench
  * scale it halves the loop's job count. (A size-pinned pre-partition
  * of the edge set was prototyped and rejected: `persist` pins the
  * partition count, defeating AQE coalescing — 13× the task count at
  * sf0.1 — while the per-round edge shuffle it removes only exists once
  * labels outgrow the broadcast threshold; AQE already picks the
  * broadcast plan below it.)
  *
  * For adversarially long chains, `pointerJumping = true` adds label
  * shortcutting to each round (label ← min(own, neighbors', label's
  * label)): labels reach the component minimum in O(log diameter) rounds
  * instead of O(diameter), at the price of one extra self-join per round.
  * Plain propagation stays the default — near-dup graphs are shallow and
  * each round stays a single join.
  */
object DedupClusters {

  /** (member id → canonical id) for every vertex of the pair graph —
    * docs in no pair are their own cluster and are omitted (join the
    * result back left-outer + coalesce to canonicalize a full corpus).
    *
    * Ids keep their NATIVE type (canonical = minimum under the type's
    * ordering — numeric for numeric ids, lexicographic for string ids);
    * a silent cast would turn e.g. UUID-string ids into NULLs and return
    * an empty mapping, so mismatched a/b column types fail loudly
    * instead.
    */
  def canonicalize(pairs: DataFrame, aCol: String, bCol: String,
                   maxIters: Int = 20,
                   pointerJumping: Boolean = false,
                   useReliableCheckpoint: Boolean = false): DataFrame = {
    val aType = pairs.schema(aCol).dataType
    val bType = pairs.schema(bCol).dataType
    require(aType == bType,
      s"id columns must share a type: $aCol is ${aType.sql}, " +
        s"$bCol is ${bType.sql}")
    if (useReliableCheckpoint)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "useReliableCheckpoint = true needs " +
          "sparkContext.setCheckpointDir(<fault-tolerant path>) first")
    // edges are reused every round; cut the source plan to a leaf. LAZY:
    // round 1's aggregate is the materializing action (localCheckpoint
    // stores blocks during that first computation), so the build pays no
    // separate up-front job.
    val edges = {
      val base = pairs
        .select(col(aCol).as("u"), col(bCol).as("v"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .distinct()
      if (useReliableCheckpoint) base.checkpoint(eager = false)
      else base.localCheckpoint(eager = false)
    }
    var labels = edges.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("lbl"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // Each round takes, per vertex, the MIN over a set of label
      // "contributions", assembled as a UNION feeding one aggregate
      // (r20, guide §2.4): neighbors' labels (one equi-join through the
      // edge set), the vertex's OWN label (a shuffle-free union branch —
      // the r19 shape re-joined `labels` on u AFTER the aggregate just
      // to mix the own label in and carry `prev`, a whole extra shuffle
      // of the label frame every round), and under pointer jumping the
      // label OF the label (one labels⋈labels join — own-label routing
      // is a message from vertex lbl to vertex u, irreducibly a join).
      // `prev` rides the self branch: every u has exactly one self row,
      // so max(when(self)) recovers it in the same aggregate.
      val neighborC = edges
        .join(labels.select(col("u").as("v"), col("lbl").as("nlbl")), "v")
        .select(col("u"), col("nlbl"), lit(false).as("self"))
      val selfC = labels.select(col("u"), col("lbl").as("nlbl"),
        lit(true).as("self"))
      val contrib =
        if (!pointerJumping) neighborC.unionByName(selfC)
        else neighborC.unionByName(selfC).unionByName(
          labels.join(
            labels.select(col("u").as("lbl"), col("lbl").as("jlbl")), "lbl")
            .select(col("u"), col("jlbl").as("nlbl"), lit(false).as("self")))
      // labels only ever shrink and stay within the component, so the min
      // over {own, neighbors', label's label} keeps the invariant while
      // (under pointer jumping) halving chain depth per round
      val stepped = contrib.groupBy(col("u")).agg(
        min(col("nlbl")).as("lbl"),
        max(when(col("self"), col("nlbl"))).as("prev"))
      // The per-round lineage cut is LOAD-BEARING, not hygiene: `labels`
      // is referenced 2-3× in each round's plan, so without a cut to a
      // leaf the logical plan doubles per round — exponential planning
      // time (a persist-only variant of this loop OOMed the driver
      // building explain strings). The cut is LAZY so the convergence
      // aggregate below is the one action that both materializes the
      // round's blocks and returns the changed-label count — replacing
      // the eager-cut-then-isEmpty pair (two actions per round).
      val next =
        if (useReliableCheckpoint) stepped.checkpoint(eager = false)
        else stepped.localCheckpoint(eager = false)
      val changedRow = next.agg(
        sum(when(col("lbl") =!= col("prev"), 1L).otherwise(0L))
          .as("changed")).head()
      // sum over an empty frame is NULL — no vertex means converged
      converged = changedRow.isNullAt(0) || changedRow.getLong(0) == 0L
      labels = next.select(col("u"), col("lbl"))
      iter += 1
    }
    require(converged,
      s"label propagation did not converge in $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters or pass " +
        "pointerJumping = true (O(log diameter) rounds)")
    labels.select(col("u").as("member_id"), col("lbl").as("canonical_id"))
  }

  /** INCREMENTAL cluster maintenance — merge a batch's new pair edges into
    * an existing `(member_id, canonical_id)` state (the [[canonicalize]]
    * output, persisted as a table) without re-running the closure over the
    * full corpus graph.
    *
    * The old closure is carried by its STAR: the member→canonical edges of
    * a component have exactly its connectivity, so re-converging
    * (affected stars ∪ new pairs) equals re-converging (old pairs ∪ new
    * pairs) on the affected subgraph — and stars have diameter 2, so with
    * the pointer jumping this path always uses, rounds are bounded by the
    * NEW chain depth, not the accumulated component history.
    *
    * Scale shape: work is increment-proportional — two semi-joins carve
    * out the components the batch touches, propagation runs on THAT
    * subgraph plus the batch pairs, and every untouched component passes
    * through as a left-anti scan, byte-identical (spec-asserted). This is
    * the composition the persisted LSH index (mh1) was built for: stored
    * signatures → batch candidate pairs → stored clusters updated in
    * O(batch) — where recomputing [[canonicalize]] over the union pair set
    * is O(corpus) per increment.
    */
  def incrementalCanonicalize(existing: DataFrame, pairs: DataFrame,
                              aCol: String, bCol: String,
                              maxIters: Int = 20,
                              useReliableCheckpoint: Boolean = false)
      : DataFrame = {
    require(Set("member_id", "canonical_id").subsetOf(existing.columns.toSet),
      s"existing cluster state needs (member_id, canonical_id), got " +
        existing.columns.mkString(","))
    if (useReliableCheckpoint)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "useReliableCheckpoint = true needs " +
          "sparkContext.setCheckpointDir(<fault-tolerant path>) first")
    require(existing.schema("member_id").dataType == pairs.schema(aCol).dataType,
      s"id type mismatch: state member_id is " +
        s"${existing.schema("member_id").dataType.sql}, " +
        s"batch $aCol is ${pairs.schema(aCol).dataType.sql}")
    // The batch pair plan feeds BOTH the seed carve-out and the merged
    // closure graph; pair generation is typically the expensive upstream
    // (an LSH band join + exact verify) — cut it to a leaf so it
    // computes once. LAZY like the closure loop's cuts (r20): the seed
    // semi-join is the materializing action, so the cut pays no
    // separate up-front job.
    val p0 =
      if (useReliableCheckpoint) pairs.checkpoint(eager = false)
      else pairs.localCheckpoint(eager = false)
    val seeds = p0.select(col(aCol).as("_ic_id"))
      .union(p0.select(col(bCol).as("_ic_id"))).distinct()
    // canonicals of every existing component the batch touches (batch ids
    // outside any existing cluster simply have no row here)
    val touched = existing
      .join(seeds, col("member_id") === col("_ic_id"), "left_semi")
      .select(col("canonical_id")).distinct()
    val affected = existing.join(touched, Seq("canonical_id"), "left_semi")
    val starPairs = affected
      .filter(col("member_id") =!= col("canonical_id"))
      .select(col("member_id").as("_ic_a"), col("canonical_id").as("_ic_b"))
    val merged = starPairs.unionByName(
      p0.select(col(aCol).as("_ic_a"), col(bCol).as("_ic_b")))
    val reconverged = canonicalize(merged, "_ic_a", "_ic_b", maxIters,
      pointerJumping = true, useReliableCheckpoint = useReliableCheckpoint)
    existing.join(touched, Seq("canonical_id"), "left_anti")
      .select(col("member_id"), col("canonical_id"))
      .unionByName(reconverged)
  }
}
