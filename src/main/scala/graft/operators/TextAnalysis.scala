package graft.operators

import graft.functions.{Funcs, Native}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star scope),
  * over the `documents` table. All map-side, no shuffle: each document is
  * scored independently, so these scale embarrassingly to 100 TB — the
  * plan is scan → project, one WholeStageCodegen span.
  */
object TextAnalysis {

  /** Token / char counting: whitespace tokens, distinct tokens, chars.
    * The "BPE-ish" sub-token count approximates subword pieces as
    * ceil(chars/4) per token, a standard budget heuristic. */
  def tokenStats(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct_tokens"),
      length(col("text")).cast("bigint").as("n_chars_computed"),
      aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t).cast("double") / 4.0)).as("n_subtokens"))
  }

  /** Quality scoring: length, mean token length, stopword ratio,
    * punctuation ratio, uppercase ratio. Ratios are exact IEEE divisions of
    * integer counts → deterministic across engines. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val nToks = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      (nChars / nToks).as("mean_token_len"),
      (Funcs.tokenCountIn(toks, Funcs.StopwordsEn).cast("double") / nToks).as("stopword_ratio"),
      ((nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))) / nChars).as("punct_ratio"),
      ((nChars - length(regexp_replace(col("text"), "[A-Z]", ""))) / nChars).as("upper_ratio"))
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and SQL-expressible (mirrored in the oracle). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Language ID: argmax over per-language marker-word counts, ties broken
    * by list order, "und" (undetermined) when no marker hits. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val scored = documents.select(
      (col("doc_id") +: LangMarkers.map { case (lang, words) =>
        Funcs.tokenCountIn(toks, words).as(s"c_$lang")
      }): _*)
    val best = LangMarkers.map(_._1).foldLeft[Column](lit(null).cast("string")) { (acc, lang) =>
      // first language (in list order) achieving the max count wins
      when(acc.isNull && col(s"c_$lang") === greatest(LangMarkers.map(m => col(s"c_${m._1}")): _*)
        && col(s"c_$lang") > 0, lit(lang)).otherwise(acc)
    }
    scored.select(col("doc_id"), coalesce(best, lit("und")).as("pred_lang"))
  }

  /** Document fingerprinting: md5 content digest + 64-bit SimHash sketch. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      Funcs.fingerprint(col("text")).as("md5"),
      Funcs.simhash64(Funcs.tokens(col("text"))).as("simhash"))

  /** GPT-2-style pre-tokenizer regex (lookahead-free so the same pattern
    * runs identically under Java regex here and RE2 in the DuckDB oracle):
    * contractions | space?+letters | space?+digits | space?+other | spaces. */
  val BpeIshPattern: String =
    """'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** BPE-ish token count: how many pre-tokenizer pieces a BPE vocabulary
    * would start from — the standard budget estimate when no vocab file is
    * at hand (vs [[tokenStats]]' cruder ceil(chars/4)). Map-side regex,
    * one codegen span. */
  def bpeTokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0))).cast("bigint")
        .as("n_bpe_tokens"))

  /** Winnowing rolling-hash fingerprint (Schleimer et al., SIGMOD'03):
    * hash every `k`-token gram, keep the sliding-window-of-`w` minima
    * ([[Native.winnow]], one O(n) deque pass per doc). Any two documents
    * sharing ≥ w+k−1 consecutive tokens share a fingerprint value, so
    * substring-level duplication is detectable by an equi-join on
    * exploded fingerprints — the same ids-only join scaling as MinHash
    * banding, but positional (plagiarism-style) rather than set-level. */
  def winnowFingerprints(documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    documents.select(
      col("doc_id"),
      // fused k-gram hashing ([[Native.shingleHashes]], in document order)
      // feeding the O(n) deque winnow — two native loops per row instead of
      // an interpreted window/concat/hash expression tree per k-gram
      Native.winnow(Native.shingleHashes(Funcs.tokens(col("text")), k, sortedDistinct = false), w)
        .as("fp"))
      .withColumn("n_fp", size(col("fp")).cast("bigint"))

  /** The real word count T1's name promises (WordCountApp.java:62-64 only
    * uppercases): explode tokens → count per word. One shuffle on the word;
    * partial map-side combine keeps it linear. */
  def wordCount(documents: DataFrame): DataFrame =
    documents
      .select(explode(Funcs.tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
}
