package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The production pair-volume preflight (`maxPairFactor` →
  * [[BlockingBudget.preflight]]) on every blocked-join entry point —
  * the round-13 wiring of the spec-side budgets
  * ([[FuzzyBlockingBudgetSpec]], `LshBucketBudgetSpec`) into the
  * operators themselves, so a SCHEDULED job can fail fast on corpus
  * drift instead of silently squaring its shuffle.
  *
  * Per family this spec proves all three contract points:
  * (1) a PLANTED crowding corpus (boilerplate-identical text — every
  * signature lands in the same buckets, volume ~n² against an O(n)
  * budget) FAILS the preflight, and the error names the hot block
  * (the [[BlockingBudget.blockProfile]] attribution — the operator
  * tells you WHICH key went hot, not just that one did);
  * (2) a benign corpus PASSES with the spec-calibrated factor and
  * returns the identical result as the unguarded call;
  * (3) the default (`None`) runs the planted corpus WITHOUT the guard
  * — opt-in means oracle plans and legacy callers are untouched.
  */
class BlockingPreflightSpec extends SparkSpec {

  import spark.implicits._

  /** ~n² crowding: every doc is the same boilerplate text, so every
    * signature/fingerprint/prefix collides. The drift mode the
    * preflight exists for (one dominant template, an empty-field
    * default, a collapsing vocabulary).
    */
  private def plantedCrowd(n: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      lit("the same boilerplate head every document shares verbatim")
        .as("text"))

  /** Benign corpus: distinct texts over a varied vocabulary — buckets
    * stay near-singleton (plus the planted pair the operators should
    * still find).
    */
  private def benign(n: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("document number "), col("id").cast("string"),
        lit(" talks about topic "), (col("id") * 37 % 101).cast("string"),
        lit(" in its own distinct words "),
        md5(col("id").cast("string"))).as("text"))

  private def assertTrips(body: => Any, op: String): Unit = {
    val e = intercept[IllegalStateException](body)
    assert(e.getMessage.contains(s"$op blocking preflight failed"),
      e.getMessage)
    assert(e.getMessage.contains("hottest blocks:"), e.getMessage)
    // the attribution names at least one block with its pair count —
    // the "WHICH key went hot" half of the contract
    assert(e.getMessage.contains("pairs)"), e.getMessage)
  }

  test("minHashLshPairs: planted crowding fails the preflight with the " +
    "hot bucket named; default off runs it; benign passes unchanged") {
    val crowd = plantedCrowd(200)
    assertTrips(
      TextDedup.minHashLshPairs(crowd, "doc_id", "text",
        maxPairFactor = Some(4.0)),
      "minHashLshPairs")
    // default None: same corpus, no guard — the call constructs and runs
    val unguarded = TextDedup.minHashLshPairs(crowd, "doc_id", "text")
    assert(unguarded.count() == 200L * 199 / 2) // all-identical: every pair
    val ok = TextDedup.minHashLshPairs(benign(200), "doc_id", "text",
      maxPairFactor = Some(4.0))
    val plain = TextDedup.minHashLshPairs(benign(200), "doc_id", "text")
    assert(ok.collect().toSet == plain.collect().toSet)
  }

  test("crossMinHashLshPairs: planted crowding fails the preflight; " +
    "benign batch-vs-corpus passes with the guard on") {
    val corpus = plantedCrowd(200)
    val batch = plantedCrowd(20)
    assertTrips(
      TextDedup.crossMinHashLshPairs(corpus, batch, "doc_id", "text",
        maxPairFactor = Some(4.0)),
      "crossMinHashLshPairs")
    val ok = TextDedup.crossMinHashLshPairs(benign(200), benign(20),
      "doc_id", "text", maxPairFactor = Some(4.0))
    val plain = TextDedup.crossMinHashLshPairs(benign(200), benign(20),
      "doc_id", "text")
    assert(ok.collect().toSet == plain.collect().toSet)
  }

  test("simHashPairs: planted crowding fails the preflight (the 16-bit " +
    "band regime check, now enforceable at the call site)") {
    assertTrips(
      TextDedup.simHashPairs(plantedCrowd(200), "doc_id", "text",
        maxPairFactor = Some(4.0)),
      "simHashPairs")
    // 32, not 4: even this varied corpus measures ~19·rows — 16-bit
    // bands crowd on any shared-template text (the documented regime
    // bound that motivated simHashPairs128, visible here in miniature);
    // the budget a 64-bit caller can hold is correspondingly looser
    val ok = TextDedup.simHashPairs(benign(200), "doc_id", "text",
      maxPairFactor = Some(32.0))
    val plain = TextDedup.simHashPairs(benign(200), "doc_id", "text")
    assert(ok.collect().toSet == plain.collect().toSet)
  }

  test("simHashPairs128: planted crowding fails the preflight over the " +
    "combination-band keys; benign passes unchanged") {
    assertTrips(
      TextDedup.simHashPairs128(plantedCrowd(200), "doc_id", "text",
        maxPairFactor = Some(4.0)),
      "simHashPairs128")
    val ok = TextDedup.simHashPairs128(benign(200), "doc_id", "text",
      maxPairFactor = Some(4.0))
    val plain = TextDedup.simHashPairs128(benign(200), "doc_id", "text")
    assert(ok.collect().toSet == plain.collect().toSet)
  }

  test("prefixBlockedLinkage: a degenerate shared prefix fails the " +
    "preflight (fz1's production guard); the corruption-model prefix " +
    "passes and matches the unguarded result") {
    // every title opens with the same >=14 chars — the
    // FuzzyBlockingBudgetSpec planted shape, now tripping INSIDE the
    // operator instead of only in the audit
    val n = 2000
    val titles = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("SAME BOILERPLATE HEAD "), col("id").cast("string"))
        .as("title"))
    val queries = titles.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("q_id"), col("title").as("q_title"))
    assertTrips(
      TextDedup.prefixBlockedLinkage(queries, "q_id", "q_title",
        titles, "doc_id", "title", prefixLen = 14, maxEdit = 2,
        maxPairFactor = Some(4.0)),
      "prefixBlockedLinkage")
    // benign: distinct prefixes, titles EXACTLY 30 chars (the fz1
    // shape — dropping char 15 must leave edit distance 1, which a
    // longer tail would inflate past maxEdit)
    val good = spark.range(n).select(col("id").as("doc_id"),
      substring(md5(col("id").cast("string")), 1, 30).as("title"))
    val goodQ = good.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("q_id"),
        concat(substring(col("title"), 1, 14), substring(col("title"), 16, 30))
          .as("q_title"))
    val ok = TextDedup.prefixBlockedLinkage(goodQ, "q_id", "q_title",
      good, "doc_id", "title", prefixLen = 14, maxEdit = 2,
      maxPairFactor = Some(4.0))
    val plain = TextDedup.prefixBlockedLinkage(goodQ, "q_id", "q_title",
      good, "doc_id", "title", prefixLen = 14, maxEdit = 2)
    assert(ok.collect().toSet == plain.collect().toSet)
    assert(plain.count() >= n / 10) // every query finds its canonical
  }
}
