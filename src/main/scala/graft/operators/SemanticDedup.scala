package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEMANTIC deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus embeddings
  * with a cheap coarse quantizer, then search for cosine near-duplicates
  * only WITHIN each cluster. Textually different documents that embed to
  * nearly the same point (templated rewrites, translations back and forth,
  * boilerplate paraphrases) are exactly what the lexical families
  * ([[TextDedup]]) cannot see and this operator exists to catch.
  *
  * Relationship to the other embedding-dedup path: [[Similarity.cosineNearDupPairsBanded]]
  * buckets by random-hyperplane signs (data-independent); this operator
  * buckets by learned k-means cells (data-dependent — clusters follow the
  * corpus density, so a tight semantic clump lands in one cell even when
  * its spread straddles several sign-LSH bands). The two are complementary
  * candidate generators over the same exact-verify core.
  *
  * Shape at scale: the corpus shuffles ONCE on the cluster id (a small
  * int), then each cluster self-joins locally — candidate pairs are
  * Σ |cluster|²/2 instead of n²/2, a ~nClusters× cut for balanced
  * clusters. The centroid matrix is the only driver state (the
  * [[Similarity.ivfIndex]] contract), and every emitted pair carries its
  * exact recomputed cosine, so precision is 1 by construction — cluster
  * quality only affects recall. A pathologically popular cell (mode
  * collapse in the embedding model) re-creates the quadratic locally; the
  * lever is `nClusters` ∝ corpus size, keeping E|cluster| constant so
  * per-cluster work stays bounded as data grows.
  *
  * `assignProbes` > 1 assigns each vector to its `assignProbes` nearest
  * cells (overlapping clusters): a pair straddling a Voronoi boundary is
  * missed only if all probed cells differ. Pure SemDeDup is `probes=1`;
  * 2 is the boundary-robust setting worth its 2× membership cost when
  * recall is contractual (the semd1 oracle).
  */
object SemanticDedup {

  /** All within-cluster pairs with cosine ≥ `threshold`, as
    * (keep_id, drop_id, cosine DECIMAL(18,4)) with keep_id < drop_id —
    * min-id survivor convention, duplicates from overlapping memberships
    * collapsed. Feed into [[DedupClusters.canonicalize]] when transitive
    * closure (cluster-level survivors) is wanted.
    *
    * `nClusters <= 0` auto-sizes by the C ≈ √n rule
    * ([[Similarity.ivfSizing]], one `count()`): the production setting —
    * a hard-coded cell count keeps E|cell| growing with the corpus and
    * within-cell pair work quadratic-with-n/C, which is exactly how a
    * "sub-quadratic" dedup silently degrades as data grows 100×.
    *
    * @param maxPairFactor opt-in pair-volume preflight
    *   ([[BlockingBudget.preflightSelf]] on the CELL id — the ANN
    *   analogue of the text families' guards): fail fast, hottest cells
    *   named, when the within-cell candidate volume Σ|cell|² exceeds
    *   `maxPairFactor · (membership rows)`. Degenerate embeddings — a
    *   broken upstream encoder emitting constant or zero vectors — crowd
    *   every row into ONE k-means cell regardless of the C ≈ √n
    *   auto-sizing, squaring the cell self-join with no plan-shape
    *   change; only the pair volume sees it. FACTOR SEMANTICS differ
    *   from the LSH families: a balanced layout measures
    *   volume/rows ≈ E|cell| = n·probes/C (≈ √n at the auto-sizing), so
    *   the budget is a small multiple of the cell size the caller's
    *   sizing implies, not a corpus-independent constant; degeneration
    *   drives the ratio toward n. Guard cost: ONE extra
    *   assignment-and-count pass over the corpus (the membership frame
    *   is pruned to its cell-id column). Deliberately NOT the LSH
    *   shared-materialization shape — the membership frame carries the
    *   corpus EMBEDDINGS (dim × 8 B per row; the
    *   `prefixBlockedLinkage` class), so nothing is persisted and no
    *   release contract exists; the repeated-run production posture is
    *   the persisted index ([[incrementalPairsFromIndex]]), where the
    *   guard's corpus side reads the STORED cell-id column at
    *   pruned-columnar-scan cost. Default `None`: no extra work, plan
    *   byte-identical (the guard is a separate eager action; the
    *   returned plan never changes).
    */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
                       nClusters: Int, threshold: Double,
                       assignProbes: Int = 1, seed: Long = 42L,
                       maxPairFactor: Option[Double] = None): DataFrame = {
    require(assignProbes >= 1, s"assignProbes must be >= 1: $assignProbes")
    Similarity.requireCosineThreshold(threshold)
    // before the eager count + k-means below (thresholds validate before
    // eager work — the r12 rule)
    maxPairFactor.foreach(f => require(f > 0, s"maxPairFactor must be > 0: $f"))
    val c = if (nClusters > 0) nClusters else Similarity.ivfSizing(df.count())
    // one assignment pass yields both the index and the memberships —
    // assigning twice would pay the O(n·k·dim) centroid scoring per
    // consumer (code-review finding, closed)
    val (_, members) = Similarity.ivfIndexAndMembers(df, idCol, vecCol,
      c, probes = assignProbes, seed = seed)
    maxPairFactor.foreach(f =>
      BlockingBudget.preflightSelf(members, col("cluster"), f,
        "semanticDupPairs"))
    // membership frames carry nrm: norms once per vector, dot-only per
    // within-cell pair (see [[Similarity.cosineFromNorms]])
    val a = members.select(col("cluster"), col("vid").as("_sd_ida"),
      col("v").as("_sd_va"), col("nrm").as("_sd_na"))
    val b = members.select(col("cluster"), col("vid").as("_sd_idb"),
      col("v").as("_sd_vb"), col("nrm").as("_sd_nb"))
    a.join(b, Seq("cluster"))
      .filter(col("_sd_ida") < col("_sd_idb"))
      .withColumn("_sd_cos", Similarity.cosineFromNorms(col("_sd_va"),
        col("_sd_vb"), col("_sd_na"), col("_sd_nb")))
      // null cosine = zero-norm vector: no direction, never a duplicate
      // (cosineAtLeast drops it without an isNotNull conjunct — see its
      // scaladoc for the join-condition refilter this avoids)
      .filter(Similarity.cosineAtLeast(col("_sd_cos"), threshold))
      .select(col("_sd_ida").as("keep_id"), col("_sd_idb").as("drop_id"),
        col("_sd_cos").cast("decimal(18,4)").as("cosine"))
      .distinct()
  }

  /** INCREMENTAL semantic dedup — the embedding analog of
    * [[TextDedup]]'s batch-vs-corpus paths (il1/il2): which of a new
    * batch's vectors are semantic duplicates of the EXISTING corpus?
    * The coarse quantizer is trained on (and the cluster shuffle paid
    * by) the corpus once; the batch — typically ≪ corpus — is assigned
    * to its `assignProbes` nearest cells and compared only against the
    * corpus members of those cells. Batch-internal duplicates are
    * [[semanticDupPairs]] on the batch alone; this operator answers the
    * cross question an append-only ingest loop asks every increment.
    *
    * Output: (new_id, match_id, cosine DECIMAL(18,4)) — one row per
    * (batch vector, corpus near-duplicate) pair with cosine ≥
    * `threshold`, exact by recomputation (cell quality only affects
    * recall, the [[semanticDupPairs]] argument). Ids need not be
    * disjoint; a batch vector never matches the corpus vector with the
    * same id (self-pair guard).
    *
    * @param maxPairFactor opt-in cross pair-volume preflight
    *   ([[BlockingBudget.preflight]] on the cell id, the cross form of
    *   [[semanticDupPairs]]'s guard): budget is `maxPairFactor ·
    *   max(corpus, batch) · assignProbes` membership rows — the larger
    *   side, so the bound stays linear in the corpus an append-only
    *   ingest loop accumulates (the `crossMinHashLshPairs` convention;
    *   the row counts are raw-input counts × probes, exact because every
    *   vector gets exactly `assignProbes` memberships). Guard cost: one
    *   extra assignment-and-count pass per side; nothing persisted (the
    *   membership frames carry embeddings — see [[semanticDupPairs]]).
    */
  def incrementalPairs(corpus: DataFrame, batch: DataFrame,
                       idCol: String, vecCol: String,
                       nClusters: Int, threshold: Double,
                       assignProbes: Int = 2, seed: Long = 42L,
                       maxPairFactor: Option[Double] = None): DataFrame = {
    require(assignProbes >= 1, s"assignProbes must be >= 1: $assignProbes")
    // validate BEFORE the k-means training below — a bad threshold must
    // not cost an O(n·k·dim) scoring pass before it throws
    Similarity.requireCosineThreshold(threshold)
    maxPairFactor.foreach(f => require(f > 0, s"maxPairFactor must be > 0: $f"))
    // the corpus is centroid-scored ONCE: the same assignment pass
    // produces the index (for the batch side's probes) and the corpus
    // memberships (code-review finding, closed)
    val (index, corpusMembers) = Similarity.ivfIndexAndMembers(corpus, idCol,
      vecCol, nClusters, probes = assignProbes, seed = seed)
    crossPairs(
      Similarity.clusterAssignments(index, batch, idCol, vecCol, assignProbes),
      corpusMembers, threshold, maxPairFactor,
      refRows = math.max(corpus.count(), batch.count()) * assignProbes,
      op = "incrementalPairs")
  }

  // ---------------------------------------------------------------------
  // Persisted semantic index (the sim4/mh1 sketch-as-data pattern): an
  // append-only ingest loop pays the corpus k-means + membership shuffle
  // ONCE at build time; every increment then assigns only the batch
  // (O(batch·nClusters·dim) flops) and joins the STORED memberships of
  // its probed cells — O(batch + touched cells), never O(corpus). This
  // is the production form of [[incrementalPairs]], which trains
  // in-query and is the right call only when corpus and batch arrive
  // together.
  // ---------------------------------------------------------------------

  /** Build and persist the semantic index under `path` as two parquet
    * tables: `centroids` (centroid_id, centroid) and `members`
    * (vid, v, nrm, cluster — the corpus's `assignProbes`-way overlapping
    * memberships). Layout mirrors [[Similarity.saveIvfIndex]]; the
    * members table is written LAST, so its `_SUCCESS` marker implies a
    * complete index.
    */
  def saveSemanticIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        nClusters: Int, assignProbes: Int, path: String,
                        seed: Long = 42L): Unit = {
    require(assignProbes >= 1, s"assignProbes must be >= 1: $assignProbes")
    // nClusters <= 0: C ≈ √corpus (the semanticDupPairs auto-size rule)
    val c = if (nClusters > 0) nClusters
            else Similarity.ivfSizing(corpus.count())
    val (index, members) = Similarity.ivfIndexAndMembers(corpus, idCol,
      vecCol, c, probes = assignProbes, seed = seed)
    val sp = corpus.sparkSession
    import sp.implicits._
    // REBUILD ordering: the completeness marker must be invalidated FIRST
    // — overwriting centroids while a PRIOR build's members/_SUCCESS
    // survives would let a crash-between-writes leave a marker-valid
    // index whose two tables come from different builds.
    val membersPath = new org.apache.hadoop.fs.Path(path + "/members")
    val fs = membersPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
    if (fs.exists(membersPath)) fs.delete(membersPath, true)
    index.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path + "/centroids")
    members.write.mode("overwrite").parquet(path + "/members")
  }

  /** [[saveSemanticIndex]] as a pair of MANAGED tables with the members
    * side BUCKETED BY the cluster id (the
    * [[Similarity.saveIvfIndexBucketed]] layout, applied where it pays
    * most): an ingest loop joins the stored memberships on `cluster`
    * once PER BATCH ([[incrementalPairsFromIndex]] — feed it
    * `spark.table(s"${prefix}_centroids")` / `_members`), and on plain
    * parquet every one of those joins re-shuffles the full membership
    * table — corpus × assignProbes rows CARRYING VECTORS — to
    * co-locate with a batch that is orders of magnitude smaller. The
    * bucketed scan comes back hash-clustered on `cluster`, the
    * corpus-side exchange disappears from every increment, and only
    * the batch memberships shuffle (pinned in `IvfBucketedIndexSpec`).
    * Same crash-window discipline: the members table (written last,
    * the completeness signal) is dropped before centroids overwrite.
    */
  def saveSemanticIndexBucketed(corpus: DataFrame, idCol: String,
                                vecCol: String, nClusters: Int,
                                assignProbes: Int, tablePrefix: String,
                                nBuckets: Int, seed: Long = 42L): Unit = {
    require(assignProbes >= 1, s"assignProbes must be >= 1: $assignProbes")
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    graft.core.TableStore.requireTablePrefix(tablePrefix)
    val c = if (nClusters > 0) nClusters
            else Similarity.ivfSizing(corpus.count())
    val (index, members) = Similarity.ivfIndexAndMembers(corpus, idCol,
      vecCol, c, probes = assignProbes, seed = seed)
    val sp = corpus.sparkSession
    import sp.implicits._
    // ordering pinned by IndexCrashPropertySpec via the BuildSteps seam
    graft.core.BuildSteps.step("sem:drop_members")
    sp.sql(s"DROP TABLE IF EXISTS ${tablePrefix}_members")
    graft.core.BuildSteps.step("sem:write_centroids")
    index.centroids.toSeq.zipWithIndex
      .map { case (cc, i) => (i, cc.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${tablePrefix}_centroids")
    graft.core.BuildSteps.step("sem:write_members")
    members.write.format("parquet")
      .bucketBy(nBuckets, "cluster").sortBy("cluster")
      .saveAsTable(s"${tablePrefix}_members")
  }

  /** [[incrementalPairs]] over the persisted tables — the increment's
    * entry point. By construction this path CANNOT train or score the
    * corpus: it reads the stored centroid matrix (nClusters driver rows,
    * validated like [[Similarity.loadIvfIndex]]) and the stored
    * memberships; only the BATCH is assigned in-plan. The batch's probe
    * count is fixed at build time on the corpus side; `assignProbes`
    * here governs the batch side and should match the build for the
    * documented recall.
    *
    * @param maxPairFactor opt-in cross preflight, as [[incrementalPairs]]
    *   — and here the guard is the PRODUCTION-cheap form the text
    *   families get from their shared banding cache: the corpus side of
    *   the per-cell counts reads the STORED members table's cell-id
    *   column (a pruned columnar scan — no k-means, no assignment UDF),
    *   so only the small batch is centroid-scored twice. Budget
    *   denominator: `max(stored membership rows, batch rows ·
    *   assignProbes)`.
    */
  def incrementalPairsFromIndex(centroidsDf: DataFrame, membersDf: DataFrame,
                                batch: DataFrame, idCol: String,
                                vecCol: String, threshold: Double,
                                assignProbes: Int = 2,
                                maxPairFactor: Option[Double] = None)
      : DataFrame = {
    require(assignProbes >= 1, s"assignProbes must be >= 1: $assignProbes")
    // before the centroid collect+validation in loadIvfIndex below
    Similarity.requireCosineThreshold(threshold)
    maxPairFactor.foreach(f => require(f > 0, s"maxPairFactor must be > 0: $f"))
    val mCols = membersDf.columns.toSet
    require(Set("vid", "v", "nrm", "cluster").subsetOf(mCols),
      s"semantic members table needs (vid, v, nrm, cluster), got " +
        mCols.mkString(","))
    // reuse loadIvfIndex's centroid validation by presenting the members
    // table in its vectors shape (cluster ≙ centroid)
    val index = Similarity.loadIvfIndex(centroidsDf,
      membersDf.select(col("vid"), col("v"), col("nrm"),
        col("cluster").as("centroid")))
    crossPairs(
      Similarity.clusterAssignments(index, batch, idCol, vecCol, assignProbes),
      membersDf, threshold, maxPairFactor,
      refRows = math.max(membersDf.count(),
        batch.count() * assignProbes),
      op = "incrementalPairsFromIndex")
  }

  /** Shared verify core: batch memberships × corpus memberships on the
    * cluster id, exact cosine, threshold, self-pair guard, overlap dedup.
    * `refRows` is by-name: the side counts are only paid when the guard
    * is on.
    */
  private def crossPairs(batchMembers: DataFrame, corpusMembers: DataFrame,
                         threshold: Double,
                         maxPairFactor: Option[Double] = None,
                         refRows: => Long = 0L,
                         op: String = ""): DataFrame = {
    maxPairFactor.foreach(f =>
      BlockingBudget.preflight(batchMembers, col("cluster"),
        corpusMembers, col("cluster"), f, refRows, op))
    // backstop — both public entry points validate before their eager work
    // membership frames carry nrm: dot-only per cross pair
    val corpusM = corpusMembers
      .select(col("cluster"), col("vid").as("_sd_cid"),
        col("v").as("_sd_cv"), col("nrm").as("_sd_cn"))
    val batchM = batchMembers
      .select(col("cluster"), col("vid").as("_sd_bid"),
        col("v").as("_sd_bv"), col("nrm").as("_sd_bn"))
    batchM.join(corpusM, Seq("cluster"))
      .filter(col("_sd_bid") =!= col("_sd_cid"))
      .withColumn("_sd_cos", Similarity.cosineFromNorms(col("_sd_bv"),
        col("_sd_cv"), col("_sd_bn"), col("_sd_cn")))
      .filter(Similarity.cosineAtLeast(col("_sd_cos"), threshold))
      .select(col("_sd_bid").as("new_id"), col("_sd_cid").as("match_id"),
        col("_sd_cos").cast("decimal(18,4)").as("cosine"))
      .distinct()
  }
}
