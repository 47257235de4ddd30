package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data curation, all built from
  * codegen'd builtins (`split`/`transform`/`filter`/`aggregate`) — no UDFs
  * in the hot path, and every one is a pure per-row projection (no shuffle).
  *
  * Every function is deliberately SQL-mirrorable so results can be
  * oracle-checked in any ANSI engine.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("int")

  /** Distinct-token count (vocabulary size of the doc). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("int")

  /** Type-token ratio — lexical diversity in [0,1]. */
  def lexicalDiversity(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast("double") / tokenCount(text).cast("double")

  /** Count of tokens that appear in `markers` — the native one-pass
    * expression ([[MarkerCount]]); language-ID calls this once per
    * language, and the declarative HOF form paid an interpreted
    * array-filter pass each time. Semantics identical (spec-asserted
    * against [[markerCountDeclarative]]).
    */
  def markerCount(text: Column, markers: Seq[String]): Column =
    MarkerCount.markerCount(text, markers)

  /** Declarative reference form, kept for the equivalence spec. */
  private[graft] def markerCountDeclarative(text: Column,
                                            markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*))).cast("int")

  /** Stopword ratio against a marker list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    markerCount(text, stopwords).cast("double") / tokenCount(text).cast("double")

  /** A BPE-ish subword-count estimate: whitespace tokens weighted by
    * ⌈len/4⌉ (the common "~4 chars per token" heuristic), as a cheap
    * stand-in for a real tokenizer at scan time.
    */
  def estimatedBpeTokens(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))
      .cast("bigint")

  /** Marker-based language ID: score = marker hits per language, winner by
    * max score with deterministic (alphabetical) tie-break; all-zero → "und".
    * An n-gram/stopword heuristic of this shape is the standard cheap
    * language filter; lists are parameters.
    */
  def languageId(text: Column,
                 markers: Map[String, Seq[String]] = DefaultLangMarkers): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(markerCount(text, words).as("score"), lit(lang).as("lang"))
    }
    // array_sort orders struct fields lexicographically: by score then lang;
    // the max element is the last — ties resolve to the later lang name, so
    // flip: sort desc by (score, reversed-rank) — use greatest via sort+last
    val best = element_at(array_sort(array(scored: _*)), -1)
    when(best.getField("score") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  val DefaultLangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  /** Quality score in [0,1]: weighted blend of length saturation, lexical
    * diversity and stopword presence — the length/punct/stopword-ratio
    * family of heuristics. Deterministic; every term a single IEEE op chain.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val lenTerm = least(tokenCount(text).cast("double") / 200.0, lit(1.0))
    val divTerm = lexicalDiversity(text)
    val stopTerm = least(stopwordRatio(text, stopwords) * 10.0, lit(1.0))
    lenTerm * 0.4 + divTerm * 0.4 + stopTerm * 0.2
  }

  /** Canonical text normalization for curation: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace runs, trim. The
    * standard pre-shingling/pre-fingerprint cleanup; plain regex so any
    * ANSI engine reproduces it.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Document fingerprint: digest of the sorted distinct token set —
    * word-order- and repetition-insensitive, the classic "fingerprint"
    * clustering key for near-dup buckets.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))
}
