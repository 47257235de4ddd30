package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeStats, TextAnalysis}
import QueryUtil._

/** Subword (BPE) token-grain catalog — round 8.
  *
  * Every earlier token count in the library is WORD-grain; these entries
  * re-measure the token economy (budgets, packing, curation) in MODEL
  * tokens via the native [[BpeStats]] expression. The oracles are BUILT
  * from the same merge table the expression executes
  * ([[Bpe.oracleMergeChain]] — a replace() chain that IS the merge pass),
  * so a drift between the tokenizer and its SQL replay is impossible by
  * construction.
  *
  * Scale shape: [[BpeStats]] is a codegen'd projection (no shuffle, no
  * UDF boundary, Zipf-memoized per-word), so every query here keeps
  * exactly the shuffle plan of its word-grain sibling (tb1/pk1/cur2) —
  * the token grain changes the NUMBERS, not the exchanges.
  */
object BpeQueries {

  /** Budget/capacity at BPE grain: ~2× the word-grain levers (the merge
    * table's measured fertility on the harness corpus is ≈2 symbols/word),
    * so the reports have comparable selectivity to tb1/pk1.
    */
  private val TokenBudget = 2000L
  private val PackCapacity = 2048L

  private def bpe = BpeStats.bpeStats(col("text"))

  val queries: Map[String, Q] = Map(
    // per-document subword statistics: word count, char count, BPE token
    // count — the fertility report (n_bpe/n_words) that calibrates every
    // model-token budget downstream
    "bpe1_subword_stats" -> ((s, d) =>
      table(s, d, "documents").select(col("doc_id"),
        bpe.getField("n_words").as("n_words"),
        bpe.getField("n_chars").as("n_chars"),
        bpe.getField("n_bpe").as("n_bpe"))),

    // tb1 at model-token grain: fill each source's budget best-docs-first,
    // measured in BPE tokens (the number a trainer actually consumes).
    // Generic window form; the histogram-pruned scale posture is proven
    // on tb1b (same operator — the grain of the token column doesn't
    // change the prune)
    "tb2_bpe_token_budget" -> ((s, d) => {
      val docs = table(s, d, "documents").select(
        col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        bpe.getField("n_bpe").cast("long").as("n_tokens"))
      graft.operators.CorpusBudget.budgetFill(docs, "source", "n_tokens",
        budget = TokenBudget, orderBy = Seq(col("q").desc, col("doc_id")))
        .select(col("source"), col("doc_id"), col("cum_tokens"))
    }),

    // pk1 at model-token grain: contiguous packing into real
    // context-window lengths instead of ceil(chars/4) estimates
    "pk2_bpe_packing" -> ((s, d) =>
      graft.operators.Packing.packContiguous(
        table(s, d, "documents").select(col("doc_id"), col("source"),
          bpe.getField("n_bpe").cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", capacity = PackCapacity)),

    // cur2 at model-token grain: Gopher survivors → exact dedup → split,
    // reported in BOTH grains plus the realized fertility factor — the
    // number that says how far the word-grain budget was off
    "cur3_bpe_curation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val survivors = graft.operators.FilterFunnel.survivors(
        table(s, d, "documents"), TrainPrepQueries.gopherRules)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = survivors
        .withColumn("_c3_rn", row_number().over(w))
        .filter(col("_c3_rn") === 1)
      graft.operators.Splits.assignSplit(deduped, "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .cast("bigint").as("n_word_tokens"),
          sum(bpe.getField("n_bpe").cast("long"))
            .cast("bigint").as("n_bpe_tokens"),
          sum(bpe.getField("n_words").cast("long"))
            .cast("bigint").as("_nw"))
        .select(col("split"), col("n_docs"), col("n_word_tokens"),
          col("n_bpe_tokens"),
          (col("n_bpe_tokens").cast("double") / col("_nw").cast("double"))
            .as("fertility"))
    })
  )

  // ---------------------------------------------------------------------
  // Oracles. The merge chain is interpolated from Bpe.defaultMerges — the
  // single source of truth both engines execute.
  // ---------------------------------------------------------------------

  /** `_bj`/`_bm` CTE pair: per-document joined-word stream and its merged
    * symbol stream. `selectCols` are expressions evaluated against
    * `documents`; `carryCols` their plain output names carried into `_bm`.
    */
  private def bpeCtes(selectCols: String, carryCols: String): String =
    s"""_bj AS (SELECT $selectCols, ${Bpe.oracleJoinedWords("text")} AS _j
       |        FROM documents),
       |_bm AS (SELECT $carryCols, _j,
       |        ${Bpe.oracleMergeChain(Bpe.oracleSpaced("_j"))} AS _m
       |        FROM _bj)""".stripMargin

  /** The shared word-grain quality formula (ff1/tb1's replay). */
  private val qualitySql: String =
    """least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0) * 0.4
      |          + (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.4
      |          + least((CAST(len(list_filter(toks, t -> t IN ('the','a'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 10.0, 1.0) * 0.2""".stripMargin

  val oracle: Map[String, String] = Map(
    "bpe1_subword_stats" -> Bpe.oracleStatsSelect("documents", Seq("doc_id")),

    "tb2_bpe_token_budget" ->
      s"""WITH ${bpeCtes("doc_id, source, string_split(lower(text), ' ') AS toks",
        "doc_id, source, toks")},
        |y AS (SELECT doc_id, source,
        |        $qualitySql AS q,
        |        CAST(${Bpe.oracleBpeCount("_m", "_j")} AS BIGINT) AS n_tokens
        |      FROM _bm),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rn
        |      FROM y)
        |SELECT source, doc_id, cum_tokens FROM c
        |WHERE cum_tokens <= $TokenBudget OR rn = 1""".stripMargin,

    "pk2_bpe_packing" ->
      s"""WITH ${bpeCtes("doc_id, source", "doc_id, source")},
        |t AS (SELECT doc_id, source,
        |        CAST(${Bpe.oracleBpeCount("_m", "_j")} AS BIGINT) AS n_tokens
        |      FROM _bm),
        |c AS (SELECT doc_id, source, n_tokens,
        |  COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum
        | FROM t)
        |SELECT doc_id, source, n_tokens,
        | CAST(cum // $PackCapacity AS BIGINT) AS pack_id FROM c""".stripMargin,

    // cur2's survivor/dedup/split replay, then the BPE CTE pair applied to
    // the SURVIVING docs only, aggregated in both grains
    "cur3_bpe_curation" ->
      s"""WITH x AS (SELECT doc_id, text, string_split(lower(text), ' ') toks
        |           FROM documents),
        |w AS (SELECT doc_id, text, toks,
        |        list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
        |          i -> toks[i] || ' ' || toks[i+1]) bl FROM x),
        |sv AS (SELECT doc_id, text, toks FROM w
        |       WHERE len(toks) BETWEEN 10 AND 100000
        |         AND (CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum') AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE)) BETWEEN 2.0 AND 12.0
        |         AND len(bl) > 0
        |         AND (CAST(len(bl) - len(list_distinct(bl)) AS DOUBLE)
        |              / CAST(len(bl) AS DOUBLE)) <= 0.3
        |         AND len(list_filter(toks, t -> t IN ('the','a','of','and'))) >= 2),
        |dd AS (SELECT doc_id, text, toks,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
        |       FROM sv),
        |bj AS (SELECT doc_id, toks, ${Bpe.oracleJoinedWords("text")} AS _j
        |       FROM dd WHERE rn = 1),
        |bm AS (SELECT doc_id, toks, _j,
        |        ${Bpe.oracleMergeChain(Bpe.oracleSpaced("_j"))} AS _m
        |       FROM bj),
        |bc AS (SELECT doc_id, toks,
        |         CAST(len(regexp_extract_all(_j, '[^|]+')) AS BIGINT) AS nw,
        |         CAST(${Bpe.oracleBpeCount("_m", "_j")} AS BIGINT) AS nb
        |       FROM bm),
        |sp AS (SELECT doc_id, toks, nw, nb,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 100 AS b
        |       FROM bc)
        |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation'
        |        ELSE 'test' END AS split,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(SUM(len(toks)) AS BIGINT) AS n_word_tokens,
        | CAST(SUM(nb) AS BIGINT) AS n_bpe_tokens,
        | CAST(SUM(nb) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE) AS fertility
        |FROM sp GROUP BY 1""".stripMargin
  )
}
