package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the document→training-example (or
  * document→RAG-passage) splitter: each document becomes
  * `1 + ceil(max(n - size, 0) / stride)` windows of `size` tokens
  * advancing by `stride = size - overlap`, so consecutive chunks share
  * `overlap` tokens and every token is covered. The `max(…, 0)` clamp is
  * what makes a document shorter than one window yield exactly one
  * (short) chunk rather than zero.
  *
  * Scale shape: a pure per-row projection — tokenize once, build the
  * window-index array with `sequence`, materialize each window with
  * `slice`, and `posexplode`. No shuffle, no UDF, one whole-stage-codegen
  * pass over the scan (asserted in PlanSpec); output size is
  * input-token-count / stride rows, the same fan-out any chunker must
  * pay. At 100 TB this is the map side of a pipeline — chunking
  * composes with any partitioning and never forces one.
  */
object Chunking {

  /** Split `textCol` into overlapping token windows.
    *
    * Output: input id column plus `chunk_idx` (0-based), `chunk_text`
    * (space-joined window) and `n_tokens` (window length; < `size` only
    * for the final window of a document, or a short document's only
    * window). Tokens are the space-split of the raw text — chunking must
    * not alter case/content, normalization belongs upstream
    * ([[graft.functions.TextAnalysis.normalize]]).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): overlap=$overlap size=$size")
    val stride = size - overlap
    val toks: Column = split(col(textCol), " ")
    val n: Column = size_(toks)
    // number of windows: 1 + ceil(max(n - size, 0) / stride). The double
    // division is exact here (token counts ≪ 2^53), floor makes it the
    // integer ceil-div (a + stride - 1) div stride.
    val extra = greatest(n - lit(size), lit(0)).cast("long")
    val nChunks =
      (floor((extra + lit(stride - 1L)) / lit(stride.toLong)) + 1L).cast("int")
    df.select(col(idCol), toks.as("_ck_toks"), nChunks.as("_ck_n"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_ck_n") - 1),
          i => slice(col("_ck_toks"), i * stride + 1, lit(size)))))
      .select(col(idCol),
        col("pos").cast("int").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size_(col("col")).as("n_tokens"))
  }

  /** Chunk-grain LANGUAGE MIX — [[chunk]] × `TextAnalysis.languageId`
    * composed: per document, the language of each token window, the
    * dominant language (max window count, lang-ascending tie-break) and
    * a mixed flag. Document-grain language-ID averages away
    * code-switching; a half-English-half-German page looks "en" or "de"
    * depending on marker luck, while its windows disagree loudly — and
    * multilingual pipelines route or drop on exactly that disagreement.
    *
    * Output: (id, n_chunks, n_langs, dominant_lang, mixed).
    * Shape at scale: the chunk projection is shuffle-free; one
    * (doc, lang) aggregation and one doc-keyed window/aggregation pair
    * sharing compact keys.
    */
  def languageMix(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = chunk(df, idCol, textCol, size = chunkSize, overlap = 0)
      .select(col(idCol),
        graft.functions.TextAnalysis.languageId(col("chunk_text"))
          .as("chunk_lang"))
      .groupBy(col(idCol), col("chunk_lang"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("n").desc, col("chunk_lang"))
    perLang.withColumn("_rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum(col("n")).cast("bigint").as("n_chunks"),
        count(lit(1)).cast("bigint").as("n_langs"),
        max(when(col("_rn") === 1, col("chunk_lang"))).as("dominant_lang"),
        (count(lit(1)) > 1).as("mixed"))
  }

  // `size` the function, shadowed by the parameter name above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
