package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Full-text retrieval scoring — Okapi BM25 (Robertson & Zaragoza 2009),
  * the ranking function behind Lucene/Elasticsearch and the lexical half
  * of every retrieval-augmented pipeline. In a training-data context this
  * is the workhorse for (a) mining query→document supervision pairs at
  * corpus scale and (b) the lexical baseline that embedding retrieval
  * ([[Similarity]]) is measured against.
  *
  * Scoring (the Lucene idf variant, strictly positive):
  * `score(q,d) = Σ_{t∈q} ln(1 + (N - df + 0.5)/(df + 0.5))
  *               · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`
  * over DISTINCT query terms (bag-of-words queries; repeating a term in a
  * short query is noise, not signal).
  *
  * Cross-engine determinism (the Keywords/tf1 scheme, extended to a SUM):
  * each per-term contribution is rounded to DECIMAL(18,6) — a few-ulp
  * cross-libm `ln` divergence survives rounding only within ulps of a
  * 0.5e-6 boundary, which transcendental outputs hit with ~1e-10
  * probability — and the per-(query,doc) score is then a DECIMAL sum,
  * exact in ANY reduction order. Ranking compares the decimal (never the
  * re-cast double) with a doc-id tie-break, so rank and score are both
  * engine-portable. idf ≥ 0 always ((N-df+0.5)/(df+0.5) > 0 ⇒ argument
  * > 1), so HALF_UP and half-away-from-zero coincide.
  *
  * Shape at scale: this is the inverted-index join — postings
  * (doc, term, tf) meet the query term list on the term key. Two
  * map-side-combinable aggregations build postings and df; corpus size
  * and total length broadcast as a 1-row aggregate; the query side of the
  * postings join is small (broadcast) while the postings table never
  * moves except the one (term) shuffle. A stopword-grade term with df≈N
  * produces a posting row per document it touches — cap the query side
  * (or pre-filter df/N > maxDf terms, the maxShingleDocFreq argument) when
  * queries may contain stopwords; idf already scores such terms near 0.
  */
object Retrieval {

  /** Top-`k` documents per query under BM25.
    * Output: (qid, doc_id, rank INT, score DOUBLE). Documents sharing no
    * term with a query never pair with it (inner inverted-index join);
    * a query whose terms appear nowhere yields no rows.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
               docId: String, textCol: String,
               qId: String, qTextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // postings come from the native NgramCounts expression (a projection)
    // rather than explode + groupBy(doc, term) — the inverted-index build
    // drops its (doc, term) exchange (value-equivalence spec-asserted)
    val postings = docs
      .select(col(docId).as("doc_id"),
        explode(graft.functions.NgramCounts.ngramCounts(col(textCol), 1))
          .as("_tc"))
      .select(col("doc_id"), col("_tc.gram").as("term"),
        col("_tc.cnt").cast("long").as("tf"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val docLen = docs.select(col(docId).as("doc_id"),
      size(toks).cast("long").as("dl"))
    val totals = docLen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qTerms = queries
      .select(col(qId).as("qid"), explode(TextAnalysis.tokens(col(qTextCol))).as("term"))
      .distinct()
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val tfPart = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val contrib = postings
      .join(broadcast(qTerms), "term")
      .join(dfreq, "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(totals))
      .select(col("qid"), col("doc_id"),
        (idf * tfPart).cast("decimal(18,6)").as("_bm_c"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("_bm_d").desc, col("doc_id"))
    contrib
      .groupBy(col("qid"), col("doc_id")).agg(sum(col("_bm_c")).as("_bm_d"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"),
        col("_bm_d").cast("double").as("score"))
  }

  /** Retrieval EVALUATION over a ranked result list — the metric half of
    * a retriever pipeline (MRR and hit-rate are how BM25 and the
    * embedding retrievers ([[Similarity]]) get compared at corpus scale).
    *
    * `results` is any (qid, doc_id, rank) ranking ([[bm25TopK]],
    * [[Similarity.bruteForceTopK]] renamed, …); `qrels` is the relevance
    * set (qid, rel_doc), many rows per query allowed. Per query:
    * `best_rank` = rank of the first relevant hit (null if none
    * retrieved), `rr` = 1/best_rank (0.0 on a miss — the MRR convention),
    * `hit` = any relevant doc retrieved. Queries present only in `qrels`
    * still report (rr 0) — a retriever that drops a query entirely must
    * not inflate the mean.
    *
    * Determinism: rr = 1.0/rank is one IEEE division of exact integers.
    * Shape at scale: one equi-join on (qid, doc) and one (qid) min-agg —
    * both on compact keys; results are already k-bounded per query.
    */
  def evalTopK(results: DataFrame, qrels: DataFrame): DataFrame = {
    val hits = results
      .join(qrels.select(col("qid"), col("rel_doc")),
        results("qid") === qrels("qid")
          && col("doc_id") === col("rel_doc"))
      .select(results("qid").as("qid"), col("rank"))
      .groupBy(col("qid")).agg(min(col("rank")).cast("int").as("best_rank"))
    qrels.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("best_rank"),
        when(col("best_rank").isNotNull,
          lit(1.0) / col("best_rank").cast("double")).otherwise(lit(0.0))
          .as("rr"),
        col("best_rank").isNotNull.as("hit"))
  }
}
