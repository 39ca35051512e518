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
    * integer counts → deterministic across engines. Character classes are
    * UNICODE (`\p{L}`/`\p{N}`/`\p{Lu}`, supported identically by Java
    * regex and RE2): ASCII-only classes would count every accented or
    * non-Latin letter as "punctuation" and miss 'É' as uppercase,
    * systematically mis-scoring exactly the non-English text [[langId]]
    * advertises support for. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val nToks = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      (nChars / nToks).as("mean_token_len"),
      (Funcs.tokenCountIn(toks, Funcs.StopwordsEn).cast("double") / nToks).as("stopword_ratio"),
      ((nChars - length(regexp_replace(col("text"), "[^\\p{L}\\p{N} ]", ""))) / nChars).as("punct_ratio"),
      ((nChars - length(regexp_replace(col("text"), "\\p{Lu}", ""))) / nChars).as("upper_ratio"))
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
    val scored = documents.select(
      (col("doc_id") +: LangMarkers.map { case (lang, words) =>
        Funcs.tokenCountIn(Funcs.tokens(col("text")), words).as(s"c_$lang")
      }): _*)
    scored.select(col("doc_id"),
      langVerdict(lang => col(s"c_$lang")).as("pred_lang"))
  }

  /** The argmax-with-list-order-ties verdict over per-language marker
    * counts, shared by [[langId]] (counts materialized behind a projection
    * boundary) and [[attributeReport]] (counts inline). `countOf` maps a
    * language code to its marker-count column. */
  private def langVerdict(countOf: String => Column): Column = {
    val g = greatest(LangMarkers.map(m => countOf(m._1)): _*)
    val best = LangMarkers.map(_._1).foldLeft[Column](lit(null).cast("string")) { (acc, lang) =>
      // first language (in list order) achieving the max count wins
      when(acc.isNull && countOf(lang) === g && countOf(lang) > 0, lit(lang)).otherwise(acc)
    }
    coalesce(best, lit("und"))
  }

  /** Demo per-language hashed-linear models, derived deterministically
    * from [[LangMarkers]]: each marker word contributes +1000 milli to its
    * md5 feature bucket (the [[linearQualityScore]] bucket definition), so
    * the models have exactly the shape a real trainer
    * ([[trainLangWeights]]) produces while every weight is reconstructible
    * by the SQL oracle. Bias 0. */
  def langModels(dim: Int = 64): Seq[(String, Seq[Long], Long)] =
    LangMarkers.map { case (lang, words) =>
      val w = new Array[Long](dim)
      words.foreach { word =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(word.getBytes("UTF-8"))
        val bucket = (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % dim
        w(bucket) += 1000L
      }
      (lang, w.toSeq, 0L)
    }

  /** TRAINED language ID — the deployment shape of a per-language linear
    * classifier bank (fastText's architecture reduced to the engine's
    * hashed-BoW machinery): one integer-milli weight table per language,
    * each document scored by every model in ONE map-side codegen pass
    * (logits are exact integer sums — no cross-engine float ambiguity),
    * verdict = argmax with model-order tie-break, `und` when no logit is
    * positive (the [[langId]] marker heuristic's rule, model edition).
    * Models ship as constant-folded literals: like [[linearQualityScore]],
    * scoring a 100 TB corpus is scan → project, no join, no shuffle, no
    * model service. Train with [[trainLangWeights]], or use the
    * [[langModels]] demo bank (oracle-reconstructible weights).
    *
    * Output: (doc_id, logit_<lang> BIGINT per model, pred_lang). */
  def langModelScore(documents: DataFrame,
      models: Seq[(String, Seq[Long], Long)] = langModels()): DataFrame = {
    require(models.nonEmpty, "langModelScore: no models")
    val d = models.head._2.length
    require(models.forall(_._2.length == d),
      "langModelScore: all models must share one feature dimension")
    // ONE native pass scores the whole bank (one md5 per token total);
    // the per-model `aggregate` HoF form re-hashed every token per model
    // through interpreted lambdas — measured 2.5× on the 4-model bank
    val banks = models.map { case (_, w, b) => (w, b) }
    val withLogits = documents.select(col("doc_id"),
      Native.bankLogits(Funcs.tokens(col("text")), banks).as("__lg"))
    val scored = withLogits.select(
      (col("doc_id") +: models.zipWithIndex.map { case ((lang, _, _), i) =>
        element_at(col("__lg"), i + 1).as(s"logit_$lang")
      }): _*)
    scored.select(
      (scored.columns.map(col).toSeq :+
        langBankVerdict(models.map(_._1), l => col(s"logit_$l")).as("pred_lang")): _*)
  }

  /** Argmax-with-order-ties over per-model logits, positive-only (the
    * [[langVerdict]] rule generalized to any model bank). */
  private def langBankVerdict(langs: Seq[String], logitOf: String => Column): Column = {
    val g = greatest(langs.map(logitOf): _*)
    val best = langs.foldLeft[Column](lit(null).cast("string")) { (acc, lang) =>
      when(acc.isNull && logitOf(lang) === g && logitOf(lang) > 0, lit(lang)).otherwise(acc)
    }
    coalesce(best, lit("und"))
  }

  /** Train the language-ID bank [[langModelScore]] deploys: one-vs-rest
    * logistic regression per language over hashed-BoW features — each
    * language's model is a [[trainQualityWeights]] run (same md5 bucket,
    * same LBFGS trainer, same bounded-training contract: the train set is
    * capped at `maxTrainRows` deterministic-sample rows, so cost never
    * scales with the corpus) with `label = (lang == l)`. Returns literal
    * integer-milli models that plug straight into [[langModelScore]] —
    * train once on labeled data, score any corpus map-side.
    *
    * `labeled` carries (doc_id, text, lang). */
  def trainLangWeights(labeled: DataFrame, langs: Seq[String], dim: Int = 64,
      regParam: Double = 1e-3, maxIter: Int = 100,
      maxTrainRows: Int = 200000): Seq[(String, Seq[Long], Long)] =
    langs.map { l =>
      val (w, b) = trainQualityWeights(
        labeled.withColumn("label", (col("lang") === l).cast("int")),
        dim, regParam, maxIter, maxTrainRows)
      (l, w, b)
    }

  /** Repetition quality signals (the Gopher-rules family): fraction of
    * tokens taken by the single most frequent unigram / bigram, and the
    * duplicate-token fraction. High values flag boilerplate, keyword-stuffed
    * or looping generations that per-token stats miss. Map-side like the
    * rest of the family — each doc scores in one [[Native.MaxFreqCount]]
    * pass over its fused gram hashes, no shuffle. A doc with < 2 tokens has
    * one whole-doc bigram ([[Native.ShingleHashes]]' short-doc rule), so its
    * top_bigram_frac is 1. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val uni = Native.shingleHashes(toks, 1, sortedDistinct = false)
    val bi = Native.shingleHashes(toks, 2, sortedDistinct = false)
    documents.select(
      col("doc_id"),
      (Native.maxFreq(uni).cast("double") / size(uni).cast("double")).as("top_unigram_frac"),
      (Native.maxFreq(bi).cast("double") / size(bi).cast("double")).as("top_bigram_frac"),
      ((size(toks) - size(array_distinct(toks))).cast("double") / size(toks).cast("double"))
        .as("dup_token_frac"))
  }

  /** The COMPLETE 13-signal Gopher repetition suite (Rae et al. 2021
    * Table A1): duplicate line/paragraph fractions (count- and
    * character-weighted), top-{2,3,4}-gram character fractions, and
    * duplicate-{5..10}-gram character coverage — the published filter,
    * where [[repetitionStats]] is the cheap 3-signal tier. One native
    * pass per document ([[Native.GopherRepetition]], which also states
    * the deterministic cross-engine contract); map-side, no shuffle. */
  def gopherRepetitionStats(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), Native.gopherRepetition(col("text")).as("r"))
      .select("doc_id", "r.*")

  /** Rae et al. 2021 Table A1's published repetition thresholds, keyed by
    * the [[gopherRepetitionStats]] column they gate (a doc at the
    * threshold passes; above it fails). */
  val GopherRepetitionThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2_gram_char_frac" -> 0.20, "top_3_gram_char_frac" -> 0.18,
    "top_4_gram_char_frac" -> 0.16,
    "dup_5_gram_char_frac" -> 0.15, "dup_6_gram_char_frac" -> 0.14,
    "dup_7_gram_char_frac" -> 0.13, "dup_8_gram_char_frac" -> 0.12,
    "dup_9_gram_char_frac" -> 0.11, "dup_10_gram_char_frac" -> 0.10)

  /** The repetition GATE at the published thresholds: per-rule pass flags
    * (the [[gopherFilter]] stance — emit which rule rejected, never just
    * the conjunction) plus `keep` = all 13. Same single native pass.
    *
    * `minTokens` is the gate's documented LENGTH PRECONDITION: the Rae
    * et al. char-fraction thresholds presume web-document lengths — a
    * short clean sentence legitimately exceeds `top_2_gram_char_frac`
    * 0.20 because one repeated greeting covers most of a tweet-length
    * doc (the failure mode GoldenTraceSpec's streaming golden records).
    * Documents under `minTokens` whitespace tokens are NOT judged: their
    * `gated` flag is 0, every per-rule flag and `keep` read 1 (the gate
    * ABSTAINS — pass-through, auditable). Compose with [[gopherFilter]]'s
    * length rule when short docs should die instead. The default 0 gates
    * everything (the published behavior, and the existing oracle
    * contract); Rae et al. applied their suite after a 50-token minimum,
    * so `minTokens = 50` is the faithful composition. */
  def gopherRepetitionFilter(documents: DataFrame, minTokens: Long = 0L): DataFrame = {
    val gated = size(Funcs.tokens(col("text"))).cast("bigint") >= minTokens
    val flags = GopherRepetitionThresholds.map { case (c, t) =>
      (!col("gated").cast("boolean") || col(s"r.$c") <= t).cast("bigint").as(s"ok_$c")
    }
    documents
      .select(col("doc_id"), Native.gopherRepetition(col("text")).as("r"),
        gated.cast("bigint").as("gated"))
      .select((col("doc_id") +: flags) ++ Seq(
        (!col("gated").cast("boolean") || GopherRepetitionThresholds
          .map { case (c, t) => col(s"r.$c") <= t }
          .reduce(_ && _)).cast("bigint").as("keep"),
        col("gated")): _*)
  }

  /** Gopher-style composite quality gate (Rae et al. 2021 §A1.1 family):
    * each rule is an independent flag, `keep` is their conjunction —
    * emitted per-rule (not pre-collapsed) so a pipeline can audit WHICH
    * rule rejected a document and re-tune thresholds without re-scoring.
    * Rules: token count in [minTokens,maxTokens]; mean token length in
    * [minMeanTokLen,maxMeanTokLen]; repetition bounded (top-unigram
    * fraction and duplicate-token fraction); ≥ minStopwords stopword hits
    * (the "is this prose" signal). Map-side like the whole family — one
    * scan, one codegen span, no shuffle at any scale. */
  def gopherFilter(
      documents: DataFrame,
      minTokens: Long = 30L,
      maxTokens: Long = 90L,
      minMeanTokLen: Double = 3.0,
      maxMeanTokLen: Double = 4.6,
      maxTopUnigramFrac: Double = 0.12,
      maxDupTokenFrac: Double = 0.5,
      minStopwords: Long = 2L): DataFrame = {
    val (flagLen, flagWordLen, flagRep, flagStop) = gopherFlags(minTokens, maxTokens,
      minMeanTokLen, maxMeanTokLen, maxTopUnigramFrac, maxDupTokenFrac, minStopwords)
    documents.select(
      col("doc_id"),
      flagLen.cast("bigint").as("flag_len"),
      flagWordLen.cast("bigint").as("flag_word_len"),
      flagRep.cast("bigint").as("flag_rep"),
      flagStop.cast("bigint").as("flag_stop"),
      (flagLen && flagWordLen && flagRep && flagStop).cast("bigint").as("keep"))
  }

  /** The four Gopher gate flags as expressions over `text` — shared by
    * [[gopherFilter]] (per-document verdict) and [[domainQuality]] (inline
    * map-side signal, no self-join back to the verdicts). */
  private def gopherFlags(
      minTokens: Long, maxTokens: Long,
      minMeanTokLen: Double, maxMeanTokLen: Double,
      maxTopUnigramFrac: Double, maxDupTokenFrac: Double,
      minStopwords: Long): (Column, Column, Column, Column) = {
    val toks = Funcs.tokens(col("text"))
    val nToks = size(toks).cast("bigint")
    // mean WORD length, the Rae et al. definition: separator spaces
    // ((nToks−1) of them) are excluded, so thresholds ported from the
    // paper's published [3, 10] bounds mean what they say — chars/nToks
    // would sit ~+1 above true word length and silently shift every
    // ported threshold by one character. Defaults shifted accordingly.
    val meanLen = (length(col("text")).cast("double") - (size(toks).cast("double") - 1.0)) /
      size(toks).cast("double")
    val topUni = Native.maxFreq(Native.shingleHashes(toks, 1, sortedDistinct = false))
      .cast("double") / size(toks).cast("double")
    val dupFrac = (size(toks) - size(array_distinct(toks))).cast("double") /
      size(toks).cast("double")
    (nToks >= minTokens && nToks <= maxTokens,
      meanLen >= minMeanTokLen && meanLen <= maxMeanTokLen,
      topUni <= maxTopUnigramFrac && dupFrac <= maxDupTokenFrac,
      Funcs.tokenCountIn(toks, Funcs.StopwordsEn) >= minStopwords)
  }

  /** Hashed linear quality-classifier scoring — the fastText/CCNet/DCLM
    * deployment shape: a bag-of-words model over `D` hashed feature
    * buckets whose weights arrive from any offline trainer and ship as a
    * broadcast LITERAL, so scoring a 100 TB corpus is one map-side
    * codegen pass — no join, no shuffle, no model service in the loop.
    * Feature hash = first 16 bits of md5(token) mod D (md5 so the DuckDB
    * oracle replays it bit-exactly); weights are integer MILLI-units so
    * the per-document logit is an exact integer sum — no floating-point
    * association ambiguity between engines or between partitionings.
    * `keep` = logit ≥ 0 (the classifier's decision threshold; callers
    * calibrate by shifting a bias into the weights). Training is out of
    * scope by design — the engine contribution is the scoring plumbing.
    *
    * Output: (doc_id, logit_milli BIGINT, keep BIGINT). */
  def linearQualityScore(documents: DataFrame, weightsMilli: Seq[Long],
      biasMilli: Long = 0L): DataFrame = {
    require(weightsMilli.nonEmpty, "weightsMilli must have at least one bucket")
    documents
      .select(col("doc_id"),
        // single-bank case of the native bank scorer (one md5 per token,
        // no interpreted per-token lambda) — same math as the original
        // aggregate-HoF form, oracle unchanged
        element_at(Native.bankLogits(Funcs.tokens(col("text")),
          Seq((weightsMilli, biasMilli))), 1).as("logit_milli"))
      .withColumn("keep", (col("logit_milli") >= 0L).cast("bigint"))
  }

  /** The hashed-bag-of-words feature bucket shared by [[linearQualityScore]]
    * (deploy side) and [[trainQualityWeights]] (train side): first 16 bits
    * of md5(token) mod `d`. One hash definition on both sides is what makes
    * a trained model deployable as a literal — and md5 keeps the DuckDB
    * oracle replaying the deploy side bit-exactly. */
  private def featureBucket(t: Column, d: Int): Column =
    conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int") % d

  /** Train the quality classifier [[linearQualityScore]] deploys — the
    * full FineWeb-Edu/DCLM loop closed inside the engine: hashed
    * bag-of-words features (the SAME md5 bucket as the scorer), distributed
    * logistic regression (MLlib LBFGS), coefficients quantized to integer
    * MILLI-units on return. The result plugs into [[linearQualityScore]]
    * as a constant-folded literal: train once here, then score any corpus
    * with a map-side codegen pass — no model service, no UDF in the hot
    * path.
    *
    * **Bounded-training contract** (same shape as
    * [[Similarity.trainCentroids]]): every LBFGS iteration is a full
    * treeAggregate pass over the TRAIN set, so the train set must be a
    * bounded sample, never the raw corpus — at 100 TB, `maxIter` passes
    * over the corpus is a non-starter, and a few hundred thousand labeled
    * rows saturate a `dim`-bucket linear model anyway. Training input is
    * therefore capped at `maxTrainRows`, selected DETERMINISTICALLY as the
    * lowest `xxhash64(doc_id)` rows (a seedless uniform sample,
    * reproducible across runs/cluster sizes; per-partition top-k + merge,
    * no full sort). Pass a larger `maxTrainRows` consciously if the label
    * set is genuinely bigger. Scoring cost is unaffected — the deploy side
    * is the plan-pinned map-side literal path.
    *
    * `documents` must carry (doc_id, text) plus a 0/1 `label` column (weak
    * labels from [[gopherFilter]].`keep`, an upstream LM judge, or human
    * annotation — the classifier distills whatever gate produced them).
    * Featurization counts per-bucket token occurrences; the sparse vector
    * assembly runs in a typed map on the train path only (bounded by
    * `dim`, never in the scoring path). Returns (weightsMilli, biasMilli)
    * sized for the scorer. Regularization keeps quantized weights small;
    * standardization is off so coefficients stay in the scorer's raw
    * count space. */
  def trainQualityWeights(
      documents: DataFrame,
      dim: Int = 256,
      regParam: Double = 1e-3,
      maxIter: Int = 100,
      maxTrainRows: Int = 200000): (Seq[Long], Long) = {
    require(maxTrainRows > 0, s"maxTrainRows must be positive, got $maxTrainRows")
    import documents.sparkSession.implicits._
    val bounded = documents
      .orderBy(xxhash64(col("doc_id"))).limit(maxTrainRows)
    val counts = bounded
      .select(col("doc_id"), col("label").cast("double").as("label"),
        explode(Funcs.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("label"), featureBucket(col("tok"), dim).as("b"))
      .groupBy("doc_id", "label", "b").agg(count(lit(1)).cast("double").as("c"))
      .groupBy("doc_id", "label")
      .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
    val data = counts.select(col("label"), col("bc"))
      .as[(Double, Seq[(Int, Double)])]
      // tuple row, not a nested case class: an object-nested private case
      // class can't be constructed by the encoder's generated code (janino
      // falls back to interpreter mode on the whole projection)
      .map { case (label, bc) =>
        val sorted = bc.sortBy(_._1)
        (label, org.apache.spark.ml.linalg.Vectors.sparse(
          dim, sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      .fit(data.toDF("label", "features"))
    (model.coefficients.toArray.toSeq.map(w => math.round(w * 1000.0)),
      math.round(model.intercept * 1000.0))
  }

  /** TF-IDF document scoring: mean and max inverse document frequency over
    * a document's token occurrences — low mean-IDF flags boilerplate made
    * of corpus-ubiquitous words; high max-IDF flags rare-term content.
    * idf(w) = ln((N+1)/(df(w)+1)) (smoothed, non-negative).
    *
    * Scale shape: df(w) is one token-keyed groupBy with map-side partial
    * aggregation (distinct (doc,word) pairs, then counts — vocab-sized
    * output, zipfian but bounded); the occurrence⋈idf join is a plain
    * equi-join on the token — the vocab side is NOT broadcast by hint
    * because a 100 TB vocab tail is unbounded; AQE converts it to
    * broadcast at runtime iff the built side is actually small. The final
    * per-doc mean is another partial-aggregated groupBy. Scores are
    * rounded to 6 decimals: summation order across partitions is
    * nondeterministic in the last ulp. */
  def tfidfScore(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(Funcs.tokens(col("text"))).as("word"))
    val df = tok.distinct().groupBy("word")
      .agg(count(lit(1)).cast("bigint").as("df"))
    val nDocs = documents.agg(count(lit(1)).cast("bigint").as("n_docs"))
    val idf = log((col("n_docs").cast("double") + 1.0d) / (col("df").cast("double") + 1.0d))
    tok.join(df, Seq("word")).crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(round(avg(idf), 6).as("mean_idf"),
        round(max(idf), 6).as("max_idf"))
  }

  /** Corpus-trained unigram surprisal per document (the CCNet-style
    * language-model quality signal, Wenzek et al. LREC'20, at its
    * simplest useful order): p(w) = corpus count / corpus tokens;
    * `mean_nll` = mean −ln p over the doc's tokens (low = in-distribution
    * prose, high = rare-token soup), `max_nll` = the rarest token's
    * surprisal. Two partial-aggregated shuffles (unigram counts, per-doc
    * mean) + one equi-join the optimizer sizes itself — the same
    * join-the-vocab shape as [[tfidfScore]], deliberately un-hinted.
    * 6-decimal round on both engines (mean-of-doubles association). */
  def unigramSurprisal(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(Funcs.tokens(col("text"))).as("word"))
    val counts = tok.groupBy("word").agg(count(lit(1)).cast("bigint").as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("bigint").as("total"))
    val nll = -log(col("cnt").cast("double") / col("total").cast("double"))
    tok.join(counts, Seq("word")).crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(round(avg(nll), 6).as("mean_nll"),
        round(max(nll), 6).as("max_nll"))
  }

  /** Corpus bigram surprisal — one rung up the CCNet ladder from
    * [[unigramSurprisal]]: per document, the mean/max negative log of the
    * corpus conditional bigram probability P(wᵢ | wᵢ₋₁) =
    * cnt(wᵢ₋₁ wᵢ) / cnt(wᵢ₋₁ ·). High mean-NLL = improbable token
    * TRANSITIONS (garbled or shuffled text that unigram frequencies miss);
    * no smoothing needed because scored docs are corpus members, so every
    * bigram has count ≥ 1. Documents with < 2 tokens have no bigrams and
    * drop (inner semantics, like any n-gram op at n=2).
    *
    * Scale shape: bigrams ride the shuffle as 8-byte xxhash64 keys (pair
    * key and prefix key), never as string pairs — the same fingerprint
    * stance as decontaminate/duplicatedSpans (collision ~2⁻⁶⁴; the
    * string-keyed DuckDB oracle pins the equality). Two partial-agg'd
    * groupBys + two equi-joins back; AQE broadcasts the count relations
    * while the vocabulary is small. */
  def bigramSurprisal(documents: DataFrame): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val big = documents
      .select(col("doc_id"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("prev"), b.as("word")))).as("bg"))
      .select(col("doc_id"),
        xxhash64(col("bg.prev"), col("bg.word")).as("bk"),
        xxhash64(col("bg.prev")).as("pk"))
    val pair = big.groupBy("bk").agg(count(lit(1)).cast("bigint").as("cnt"))
    val prefix = big.groupBy("pk").agg(count(lit(1)).cast("bigint").as("pcnt"))
    val nll = -log(col("cnt").cast("double") / col("pcnt").cast("double"))
    big.join(pair, Seq("bk")).join(prefix, Seq("pk"))
      .groupBy("doc_id")
      .agg(round(avg(nll), 6).as("mean_nll"),
        round(max(nll), 6).as("max_nll"),
        count(lit(1)).cast("bigint").as("n_bigrams"))
  }

  /** Stupid Backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" §4 — THE web-scale n-gram score: no
    * discounting, no normalization, just relative frequencies with a
    * fixed backoff penalty, chosen because it distributes where
    * Kneser–Ney does not): every document is scored against an LM
    * trained on the `lmPredicate` slice of the corpus,
    *
    *   S(w₃|w₁w₂) = c₃/c₂(w₁w₂)          if the trigram is in the LM
    *              = α · c₂(w₂w₃)/c₁(w₂)  else if the bigram is
    *              = α² · c₁(w₃)/N        else if the unigram is
    *              = OOV (excluded, counted) otherwise,
    *
    * and the document score is the mean log10 S over its scored
    * positions — the cross-slice fluency signal (score a crawl against a
    * trusted slice; in-LM documents take the direct path, novel text
    * exercises the backoff chain).
    *
    * Scale shape: grams ride every shuffle as 8-byte xxhash64 keys
    * (trigram, both bigrams, both unigrams), never strings; the three
    * count relations are partial-agg'd groupBys. On a vocab-bounded
    * corpus AQE broadcasts the counts and scoring is map-side; at
    * open-web scale (trillions of distinct grams — the paper's regime)
    * the five lookups degrade gracefully to fp-keyed shuffle equi-joins
    * of an 8-byte-key position relation, the Brants batch-lookup shape.
    * Documents with < 3 tokens have no trigram positions and drop (inner
    * semantics, like any n-gram op at n = 3). */
  def stupidBackoffScore(documents: DataFrame, lmPredicate: Column,
      alpha: Double = 0.4): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    val lm = documents.filter(lmPredicate)
    // fused native hashing everywhere: no gram string ever materializes —
    // Native.ShingleHashes is xxhash64 of the space-joined gram, so the
    // fp keys are bit-identical to hashing the declarative shingles. The
    // ≥ n filters keep the short-doc whole-doc rule out of the LM counts.
    val tri = lm.filter(size(toks) >= 3)
      .select(explode(Native.shingleHashes(toks, 3, sortedDistinct = false)).as("tk"))
      .groupBy("tk").agg(count(lit(1)).cast("bigint").as("c3"))
    val bi = lm.filter(size(toks) >= 2)
      .select(explode(Native.shingleHashes(toks, 2, sortedDistinct = false)).as("bk"))
      .groupBy("bk").agg(count(lit(1)).cast("bigint").as("c2"))
    val uni = lm
      .select(explode(Native.shingleHashes(toks, 1, sortedDistinct = false)).as("uk"))
      .groupBy("uk").agg(count(lit(1)).cast("bigint").as("c1"))
    val nTotal = lm.agg(sum(size(toks)).cast("bigint").as("n_lm"))
    // one row per trigram position, five 8-byte lookup keys: position i's
    // keys are element lookups into the per-level hash arrays, which sit
    // behind a projection boundary (each array is non-cheap and read
    // several times, so CollapseProject keeps the producer separate)
    val pos = documents
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        Native.shingleHashes(toks, 3, sortedDistinct = false).as("h3"),
        Native.shingleHashes(toks, 2, sortedDistinct = false).as("h2"),
        Native.shingleHashes(toks, 1, sortedDistinct = false).as("h1"))
      .select(col("doc_id"), col("h2"), col("h1"),
        posexplode(col("h3")).as(Seq("i", "tk")))
      .select(col("doc_id"), col("tk"),
        element_at(col("h2"), col("i") + 1).as("bpk"),
        element_at(col("h2"), col("i") + 2).as("bk"),
        element_at(col("h1"), col("i") + 2).as("upk"),
        element_at(col("h1"), col("i") + 3).as("uk"))
    val joined = pos
      .join(tri, Seq("tk"), "left")
      .join(bi.select(col("bk").as("bpk"), col("c2").as("c2p")), Seq("bpk"), "left")
      .join(bi, Seq("bk"), "left")
      .join(uni.select(col("uk").as("upk"), col("c1").as("c1p")), Seq("upk"), "left")
      .join(uni, Seq("uk"), "left")
      .crossJoin(broadcast(nTotal))
    val s =
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2p").cast("double"))
        .when(col("c2").isNotNull,
          lit(alpha) * col("c2").cast("double") / col("c1p").cast("double"))
        .when(col("c1").isNotNull,
          lit(alpha * alpha) * col("c1").cast("double") / col("n_lm").cast("double"))
    joined
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_positions"),
        sum(when(s.isNull, 1L).otherwise(0L)).cast("bigint").as("n_oov"),
        round(avg(log10(s)), 6).as("mean_log10"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    * corpus into head / middle / tail by the tertiles of the per-document
    * LM surprisal ([[unigramSurprisal]]'s mean NLL standing in for the
    * paper's KenLM perplexity — swap the score column for a real LM's
    * output at no plan change). CCNet keeps "head" (lowest perplexity =
    * most fluent) for pretraining and drops or down-weights the tail.
    *
    * Scale note on the EXACT percentile: `percentile()` materializes a
    * value→count map per partial aggregate, which is normally
    * unbounded — but the score is rounded to 6 decimals and bounded by
    * ln(corpus tokens), so the key space is ≤ a few million distinct
    * values regardless of corpus size and the exact percentile stays
    * fixed-memory at 100 TB. (With an unrounded or unbounded score, use
    * `approx_percentile` — the [[Pipeline.corpusStatsApprox]] stance.)
    * The two cut points broadcast as a single row; bucket assignment is
    * map-side codegen. */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    val scored = unigramSurprisal(documents).select(col("doc_id"), col("mean_nll"))
    val cuts = scored.agg(
      expr("percentile(mean_nll, 1.0D/3.0D)").as("c1"),
      expr("percentile(mean_nll, 2.0D/3.0D)").as("c2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("mean_nll"),
        when(col("mean_nll") <= col("c1"), "head")
          .when(col("mean_nll") <= col("c2"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per document, the mean
    * log-likelihood ratio of its tokens under a TARGET unigram LM vs the
    * full-corpus (source) LM, both add-one smoothed over the shared corpus
    * vocabulary — score(d) = avgᵥ[ln p̂ₜ(w) − ln p̂ₛ(w)], p̂(w) =
    * (c(w)+1)/(N+V). Positive = looks more like the target domain;
    * selection on the weight is importance resampling (deterministic
    * top-k variant: [[importanceTopK]]).
    *
    * Scale shape mirrors the paper's hashed features: tokens ride every
    * shuffle as 8-byte xxhash64 fingerprints, never strings (same stance
    * as [[bigramSurprisal]]; the string-keyed DuckDB oracle pins the
    * equality). BOTH LMs come out of ONE partial-agg'd groupBy — the
    * target count is a conditional sum riding the corpus count's shuffle,
    * so adding the second LM costs zero extra passes. The single-row
    * totals relation broadcasts; the counts join-back is left to AQE
    * (vocabulary-sized, like [[tfidf]]'s df relation). */
  def importanceWeight(documents: DataFrame, isTarget: Column): DataFrame = {
    val tok = documents
      .select(col("doc_id"), isTarget.cast("boolean").as("tgt"),
        explode(Funcs.tokens(col("text"))).as("word"))
      .select(col("doc_id"), col("tgt"), xxhash64(col("word")).as("fp"))
    val counts = tok.groupBy("fp").agg(
      count(lit(1)).cast("bigint").as("c_s"),
      sum(when(col("tgt"), 1L).otherwise(0L)).cast("bigint").as("c_t"))
    val totals = counts.agg(
      sum(col("c_s")).cast("bigint").as("n_s"),
      sum(col("c_t")).cast("bigint").as("n_t"),
      count(lit(1)).cast("bigint").as("v"))
    val ratio =
      log((col("c_t") + 1).cast("double") / (col("n_t") + col("v")).cast("double")) -
        log((col("c_s") + 1).cast("double") / (col("n_s") + col("v")).cast("double"))
    tok.join(counts, Seq("fp")).crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(round(avg(ratio), 6).as("mean_logratio"),
        count(lit(1)).cast("bigint").as("n_tokens"))
  }

  /** Deterministic DSIR selection: the `k` highest-importance documents
    * by [[importanceWeight]], ties broken by doc_id (the weight is
    * 6-decimal rounded first, so the tie-break is engine-portable).
    * orderBy+limit compiles to TakeOrderedAndProject — per-partition
    * top-k, then a k-row merge — never a global sort (the same plan
    * stance as the exact top-k vocabulary). The paper samples with
    * Gumbel noise; a seeded variant would add hash-derived noise to the
    * weight with an identical plan shape. */
  def importanceTopK(documents: DataFrame, isTarget: Column, k: Int): DataFrame =
    importanceWeight(documents, isTarget)
      .orderBy(col("mean_logratio").desc, col("doc_id").asc)
      .limit(k)

  /** C4-style line + document cleaning heuristics (Raffel et al. 2020
    * §2.2, the rules behind the C4 corpus), parameterized so a pipeline
    * can re-tune per corpus:
    *  - a LINE survives iff it has ≥ `minWordsPerLine` words, ends in a
    *    terminal punctuation mark (`.` `!` `?` `"`) when
    *    `requireTerminalPunct`, and contains no `lineBlocklist` term
    *    (case-insensitive substring — C4's "javascript" rule);
    *  - the DOCUMENT survives (`keep` = 1) iff ≥ `minLines` lines remain
    *    and no `docBlocklist` term appears anywhere in the raw text
    *    (C4 drops pages containing `{` — code leakage — or the
    *    "lorem ipsum" filler).
    *
    * Every rule is doc-local array logic, so unlike the corpus-global
    * [[Dedup.lineDedup]] this is map-side only: scan → project, one
    * codegen span, no shuffle at any scale. Emits
    * (doc_id, n_lines, n_kept, keep, text_clean) — `text_clean` keeps
    * surviving lines in order; the caller filters on `keep` (emitted as
    * a flag, not pre-applied, so rejection reasons stay auditable — the
    * [[gopherFilter]] stance). */
  def c4LineFilter(
      documents: DataFrame,
      minWordsPerLine: Int = 3,
      requireTerminalPunct: Boolean = true,
      lineBlocklist: Seq[String] = Seq("javascript"),
      minLines: Int = 3,
      docBlocklist: Seq[String] = Seq("{", "lorem ipsum")): DataFrame = {
    val lines = split(col("text"), "\n")
    def keepLine(l: Column): Column = {
      val words = size(split(l, " ")) >= minWordsPerLine
      val punct = if (requireTerminalPunct) l.rlike("[.!?\"]$") else lit(true)
      val unblocked = lineBlocklist
        .map(t => !lower(l).contains(lit(t.toLowerCase)))
        .reduceOption(_ && _).getOrElse(lit(true))
      words && punct && unblocked
    }
    val kept = filter(lines, keepLine _)
    val docUnblocked = docBlocklist
      .map(t => !lower(col("text")).contains(lit(t.toLowerCase)))
      .reduceOption(_ && _).getOrElse(lit(true))
    documents.select(
      col("doc_id"),
      size(lines).cast("bigint").as("n_lines"),
      size(kept).cast("bigint").as("n_kept"),
      (size(kept) >= minLines && docUnblocked).cast("bigint").as("keep"),
      concat_ws("\n", kept).as("text_clean"))
  }

  /** C4's word-blocklist document gate (Raffel et al. 2020 §2.2: "any
    * page that contained any word on the 'List of Dirty, Naughty …'" is
    * removed) — the companion of [[c4LineFilter]]'s LINE heuristics,
    * matching whole alphabetic TOKENS rather than substrings (the
    * doc-blocklist in c4LineFilter is a substring check; "class" must
    * not trip a blocklisted "ass"). Tokenization is a letters-only split
    * on the lowercased text so punctuation-attached occurrences still
    * match, mirrored verbatim by the oracle's `string_split_regex`.
    * Map-side only: one codegen span, zero shuffle at any corpus size;
    * the blocklist folds to a constant-folded IN over each token. */
  def badWordFilter(documents: DataFrame, blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "badWordFilter: empty blocklist")
    // the [^a-z]+ tokenization means an entry with any non-letter (digits,
    // hyphens, multi-word phrases — common in the real C4 list) could NEVER
    // match and would be silently inert; reject it loudly instead. Phrase
    // and punctuated entries belong in c4LineFilter's substring blocklist.
    val inert = blocklist.filterNot(_.toLowerCase.matches("[a-z]+"))
    require(inert.isEmpty,
      s"badWordFilter matches single alphabetic words only (tokenization is " +
        s"[^a-z]+); these entries can never match: ${inert.mkString(", ")} - " +
        "use c4LineFilter's substring doc-blocklist for phrases/punctuation")
    val toks = split(lower(col("text")), "[^a-z]+")
    val flagged =
      size(filter(toks, t => t.isin(blocklist.map(w => w.toLowerCase: Any): _*)))
    documents.select(
      col("doc_id"),
      flagged.cast("bigint").as("n_flagged"),
      (flagged === 0).cast("bigint").as("keep"))
  }

  /** Per-document ATTRIBUTE row — the Dolma-style audit sidecar
    * (Soldaini et al. 2024 publish exactly this shape: one row per doc
    * with every tagger's signal, decisions deferred to the consumer):
    * size stats, Gopher-definition mean word length, stopword ratio,
    * character entropy, language verdict, the composite Gopher keep, and
    * the word-blocklist hit count, in ONE pass. Filtering is explicitly
    * NOT done here — the report's value is that thresholds can be tuned
    * and audited offline without re-running the taggers.
    *
    * Scale shape: every signal is map-side (the family invariant:
    * [[qualityScore]], [[gopherFilter]], [[langId]], [[charEntropy]],
    * [[badWordFilter]] are each zero-shuffle, and composing them stays
    * ONE zero-shuffle codegen pass over the corpus — plan-pinned). The
    * marker counts sit behind the inner projection boundary so the
    * language argmax does not replicate the token scans in codegen. */
  def attributeReport(documents: DataFrame,
      badWords: Seq[String] = Seq("slow", "window")): DataFrame = {
    require(badWords.nonEmpty, "attributeReport: empty blocklist")
    val toks = Funcs.tokens(col("text"))
    // built once: each langModels() call re-runs MD5 over every marker word
    val models = langModels()
    val (fLen, fWord, fRep, fStop) = gopherFlags(30L, 90L, 3.0, 4.6, 0.12, 0.5, 2L)
    val alphaToks = split(lower(col("text")), "[^a-z]+")
    val base = documents.select(
      (Seq(
        col("doc_id"),
        col("text"),
        size(toks).cast("bigint").as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars"),
        Funcs.tokenCountIn(toks, Funcs.StopwordsEn).as("n_stop"),
        (fLen && fWord && fRep && fStop).cast("bigint").as("gopher_keep"),
        size(filter(alphaToks, t => t.isin(badWords.map(_.toLowerCase: Any): _*)))
          .cast("bigint").as("n_badwords")) ++
        LangMarkers.map { case (lang, words) =>
          Funcs.tokenCountIn(toks, words).as(s"c_$lang")
        } :+
        // trained-model logit bank alongside the marker counts (same inner
        // projection boundary; ONE native pass for the whole bank)
        Native.bankLogits(toks, models.map { case (_, w, b) => (w, b) })
          .as("l_bank")): _*)
    base.select(
      col("doc_id"), col("n_tokens"), col("n_chars"),
      round((col("n_chars").cast("double") - (col("n_tokens").cast("double") - 1.0)) /
        col("n_tokens").cast("double"), 6).as("mean_word_len"),
      round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6)
        .as("stopword_ratio"),
      (round(Native.charEntropy(col("text")), 6) + lit(0.0)).as("entropy"),
      langVerdict(lang => col(s"c_$lang")).as("pred_lang"),
      // the model bank's verdict NEXT TO the marker heuristic's, so the
      // sidecar exposes both signals for offline threshold tuning
      langBankVerdict(models.map(_._1),
        l => element_at(col("l_bank"),
          models.map(_._1).indexOf(l) + 1)).as("pred_lang_model"),
      col("gopher_keep"), col("n_badwords"))
  }

  /** URL filtering (the RefinedWeb §3.1 / C4-style crawl-side gate — the
    * FIRST filter a web pipeline runs, before any text is even fetched):
    * a registered-domain blocklist (the adult/fraud/malware list) plus a
    * URL-substring word flag (the "soft" signal RefinedWeb scores —
    * emitted here as an auditable any-hit flag). Host extraction is one
    * byte-class regex — scheme and `www.` stripped, cut at the first
    * `/ : ? #` — and the registered domain is the host's last two labels
    * (the eTLD+1 approximation; a real deployment swaps in the public
    * suffix list, which changes only the regex constant). Blocklists ship
    * as constant-folded literals, so at 100 TB this is a pure map-side
    * gate: scan → project, one codegen span, no join, no shuffle — a
    * million-entry production blocklist would move to a broadcast join on
    * `domain`, which still never shuffles the corpus side.
    *
    * Emits per-rule flags, not a pre-applied filter (the [[gopherFilter]]
    * auditability stance): (doc_id, host, domain, flag_domain, flag_word,
    * keep). */
  def urlFilter(
      documents: DataFrame,
      blockedDomains: Seq[String],
      blockedWords: Seq[String]): DataFrame = {
    val u = lower(col("url"))
    // userinfo ('user:pass@') is stripped BEFORE the host capture — an
    // '@' would otherwise ride into the host ('foo@blocked.com' ≠
    // 'blocked.com') or a ':' cut it at the password, both trivially
    // bypassing the domain blocklist; trailing dots (valid FQDN spelling
    // 'blocked.com.') are stripped so the domain anchor still matches
    val host = regexp_replace(
      regexp_extract(u,
        "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@?#]*@)?(?:www\\.)?([^/:?#]+)", 1),
      "\\.+$", "")
    val domain = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val flagDomain = blockedDomains.map(b => domain === lit(b.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    val flagWord = blockedWords.map(w => u.contains(lit(w.toLowerCase)))
      .reduceOption(_ || _).getOrElse(lit(false))
    documents.select(
      col("doc_id"),
      host.as("host"),
      domain.as("domain"),
      flagDomain.cast("bigint").as("flag_domain"),
      flagWord.cast("bigint").as("flag_word"),
      (!flagDomain && !flagWord).cast("bigint").as("keep"))
  }

  /** Canonical URL form — the URL-level dedup key every crawl pipeline
    * (CCNet §2, RefinedWeb §3.2) derives before its first content pass,
    * because re-crawls of one page arrive under dozens of URL spellings.
    * Rules, applied in order (each one a single anchored byte-class regex
    * or list op, so the whole chain is one map-side codegen span):
    * lowercase; strip the scheme; strip the fragment; strip userinfo;
    * strip a leading `www.`; strip an explicit default port (`:80`/`:443`);
    * split path from query at the first `?`; drop tracking parameters
    * (`utm_*`, `fbclid`, `gclid`, `ref`) and empty params, SORT the
    * survivors (param order never distinguishes pages); strip trailing
    * slashes from the path. Non-default ports and meaningful params
    * survive. Pure expression — composes into [[Dedup.urlDedup]]'s
    * grouping without materializing anything. */
  def canonicalUrl(url: Column): Column = {
    val noScheme = regexp_replace(lower(trim(url)), "^[a-z][a-z0-9+.-]*://", "")
    // fragment BEFORE userinfo: an '@' inside the fragment must not be
    // mistaken for an authority delimiter (the [^/?#] class already
    // guards the path/query cases)
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val noUser = regexp_replace(noFrag, "^[^/?#]*@", "")
    val noWww = regexp_replace(noUser, "^www\\.", "")
    val noPort = regexp_replace(noWww, "^([^/:?#]+):(?:80|443)([/?]|$)", "$1$2")
    val parts = split(noPort, "\\?", 2)
    val path = regexp_replace(element_at(parts, 1), "/+$", "")
    val params = when(size(parts) > 1,
      array_sort(filter(split(element_at(parts, 2), "&"),
        p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))))
      .otherwise(typedLit(Seq.empty[String]))
    concat(path,
      when(size(params) > 0, concat(lit("?"), concat_ws("&", params)))
        .otherwise(lit("")))
  }

  /** HTML → text extraction (the raw-crawl ingestion step every web
    * corpus runs before any quality/dedup pass — the trafilatura-lite
    * tier): drop `<script>`/`<style>` blocks wholesale, strip remaining
    * tags, decode the six common entities (`&amp;` LAST, so
    * double-encoded text degrades gracefully instead of double-decoding),
    * collapse whitespace. Byte-class regexes only (RE2-compatible — the
    * identical patterns run under Java regex here and RE2 in the DuckDB
    * oracle). Map-side: scan → project, one codegen span, no shuffle at
    * any scale. Emits (doc_id, text_plain, n_chars_plain). */
  def stripHtml(documents: DataFrame): DataFrame = {
    // one pattern per block tag, each with a word-boundary-safe opener
    // and a NAME-MATCHED closer (RE2 has no backreferences, so a single
    // alternation would let '<styled>…</style>' swallow legitimate text
    // and '<script>…</style>' close a script block early, leaking code)
    val noScript = regexp_replace(col("text"),
      "(?s)<script(\\s[^>]*)?>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?s)<style(\\s[^>]*)?>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val collapsed = trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
    documents.select(col("doc_id"), collapsed.as("text_plain"),
      length(collapsed).cast("bigint").as("n_chars_plain"))
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

  /** Train a BPE merge table (Sennrich et al. 2016): the classic loop —
    * count adjacent symbol pairs over the word-frequency table, merge
    * the most frequent pair, repeat `numMerges` times. Deterministic:
    * ties break to the lexicographically smallest pair, and the
    * frequency table is an exact top-`maxWords` by (count desc, word) —
    * TakeOrderedAndProject, never a global sort.
    *
    * Driver-side BY DESIGN (the [[Similarity.trainCentroids]] contract):
    * tokenizers train on a bounded word-frequency table — `maxWords`
    * rows × word length, not the corpus — while the corpus gets ENCODED
    * cluster-side ([[bpeEncode]]). At 100 TB the frequency table is the
    * output of one partial-agg'd groupBy; its tail beyond `maxWords`
    * cannot dominate pair counts. */
  def trainBpeMerges(
      documents: DataFrame,
      numMerges: Int,
      maxWords: Int = 4096): Seq[(String, String)] = {
    val words: Seq[(String, Long)] = documents
      .select(explode(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab: Seq[(Vector[String], Long)] = words.map { case (w, c) =>
      val syms = Vector.newBuilder[String]
      var ci = 0
      while (ci < w.length) {
        val n = Character.charCount(w.codePointAt(ci))
        syms += w.substring(ci, ci + n)
        ci += n
      }
      syms.result() -> c
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val mergedSym = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += mergedSym; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
        it += 1
      }
    }
    merges.toSeq
  }

  /** Real BPE encoding — the acting sibling of [[bpeTokenCount]]'s
    * pre-token estimate: GPT-2 pre-tokenization ([[BpeIshPattern]]) then
    * greedy lowest-rank merging of each pre-token against the trained
    * merge table ([[Native.BpeEncode]], one native loop per row —
    * map-side, no shuffle at any scale; the merge table rides as a
    * broadcast literal, the fastText-weights stance). Lossless:
    * concatenating `pieces` reproduces the document byte-for-byte
    * (property-pinned). Emits (doc_id, pieces ARRAY<STRING>,
    * n_pieces). */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents.select(col("doc_id"),
      Native.bpe(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0)), merges)
        .as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("bigint"))

  /** Token-distribution audit under a trained tokenizer — the standard
    * pre-training sanity pass (vocabulary coverage, fertility, dead
    * merges): encode the corpus with [[bpeEncode]] and histogram the
    * emitted pieces, with both collection frequency (`n_tokens`) and
    * document frequency (`n_docs`) per piece.
    *
    * Scale shape: the encode is map-side (one native loop per row, merge
    * table as a broadcast literal); the histogram is a partial-agg'd
    * groupBy whose FINAL relation is at most vocab-sized (≤ alphabet +
    * merges rows), so the reduce side is trivially small at any corpus
    * size. The exact `n_docs` rides as a (piece, doc_id) distinct
    * expansion — bounded by corpus tokens; a 100 TB run that only needs
    * approximate document frequency swaps in approx_count_distinct and
    * drops that expansion. */
  def bpeVocabHist(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    bpeEncode(documents, merges)
      .select(col("doc_id"), explode(col("pieces")).as("piece"))
      .groupBy("piece")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))

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

  /** Winnow SELECTION audit — the positions (k-gram indices) the winnow
    * picks, exploded to (doc_id, pos) rows. Same fused gram hashing and
    * the same deque/tie rule as [[winnowFingerprints]]
    * ([[Native.WinnowPositions]] shares the loop shape with
    * [[Native.WinnowMins]]); `WinnowMins ≡ first-seen-distinct of
    * hashes[pos]` is property-pinned. The positional form is what makes
    * the SELECTION rule SQL-oracle-able: on a single-repeated-token doc
    * every gram hash is equal, so the rightmost-min tie rule alone
    * determines the picks — positions w−1…g−1 (g grams), or g−1 when the
    * doc has fewer than w grams — with no hash arithmetic in the oracle. */
  def winnowPositions(documents: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    documents.select(
      col("doc_id"),
      explode(Native.winnowPos(
        Native.shingleHashes(Funcs.tokens(col("text")), k, sortedDistinct = false), w))
        .as("p"))
      .select(col("doc_id"), col("p").cast("bigint").as("pos"))

  /** Canonical text normalization — the cheap pass every downstream
    * text operator (dedup shingles, token stats, fingerprints) assumes ran
    * first on raw crawl data: lowercase, control characters → space,
    * runs of spaces collapsed, ends trimmed. Patterns are byte-class only
    * (no Unicode property classes), so the identical regex runs under
    * Java regex here and RE2 in the DuckDB oracle. Map-side, one codegen
    * span, no shuffle at any scale. */
  def normalizeText(documents: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[\\x00-\\x1f\\x7f]", " "),
      " +", " "))
    documents.select(
      col("doc_id"),
      norm.as("text_norm"),
      length(norm).cast("bigint").as("n_chars_norm"))
  }

  /** The real word count T1's name promises (WordCountApp.java:62-64 only
    * uppercases): explode tokens → count per word. One shuffle on the word;
    * partial map-side combine keeps it linear. */
  def wordCount(documents: DataFrame): DataFrame =
    documents
      .select(explode(Funcs.tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Corpus-wide heavy hitters: the `k` most frequent word n-grams with
    * collection frequency (every occurrence) and document frequency — the
    * boilerplate/contamination radar that tells you WHICH spans [[graft.operators.Dedup.lineDedup]]
    * and span removal should worry about. Docs shorter than `n` tokens
    * contribute nothing. One shuffle with map-side partial aggregation
    * (gram strings reduce per-partition before moving), then the global
    * top-k compiles to TakeOrderedAndProject — only k rows ever reach the
    * driver, no global sort. Ties break on the gram string so top-k is
    * deterministic. */
  def heavyHitters(documents: DataFrame, n: Int = 3, k: Int = 50): DataFrame = {
    val toks = Funcs.tokens(col("text"))
    // the ≥ n filter keeps the shingle loop on its all-n-grams branch
    // (the short-doc whole-doc rule is NOT wanted here: a 2-token doc is
    // no 3-gram heavy hitter). Counting runs over 8-byte fps only — at
    // 100 TB the count shuffle carries no gram text at all; strings
    // materialize ONCE PER WINNER below, never per occurrence.
    val positions = documents
      .filter(size(toks) >= n)
      .select(col("doc_id"),
        posexplode(Native.shingleHashes(toks, n, sortedDistinct = false))
          .as(Seq("pos", "fp")))
    val counts = positions
      .groupBy("fp").agg(count(lit(1)).cast("bigint").as("cnt"),
        count_distinct(col("doc_id")).cast("bigint").as("df"))
      .transform(Caches.persisted)
    // candidate set = every fp tied with or above the kth count, so the
    // final (cnt DESC, gram ASC) cutoff sees ALL boundary ties and the
    // gram-ascending tiebreak stays exact
    val kth = counts.orderBy(col("cnt").desc).limit(k).agg(min(col("cnt")).as("c_min"))
    val cand = counts.crossJoin(broadcast(kth)).filter(col("cnt") >= col("c_min"))
    // recover each candidate's STRING from its first occurrence: one
    // (doc, pos) pointer per winner joins back to the doc row and slices
    // the gram out of the token array
    val firstOcc = positions
      .join(cand.select(col("fp")), Seq("fp"), "left_semi")
      .groupBy("fp").agg(min(struct(col("doc_id"), col("pos"))).as("o"))
    val grams = firstOcc
      .select(col("fp"), col("o.doc_id").as("doc_id"), col("o.pos").as("pos"))
      .join(documents.select(col("doc_id"), toks.as("tk")), Seq("doc_id"))
      .select(col("fp"),
        concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(n))).as("gram"))
    cand.join(grams, Seq("fp"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
      .select(col("gram"), col("cnt"), col("df"))
  }

  /** Per-document n-gram novelty — [[heavyHitters]]'s complement and the
    * dedup family's coverage diagnostic: for each doc, the fraction of
    * its DISTINCT n-grams that appear in no other document. A corpus
    * whose mass sits at low novelty is boilerplate-heavy (route it to
    * [[graft.operators.Dedup.lineDedup]]/span removal); a doc at novelty
    * ~1 is unique content. The same statistic is the standard "how much
    * would substring dedup remove" estimator (Lee et al. 2022 §4 report
    * corpus-level versions of it).
    *
    * Scale shape: grams never materialize as strings — each doc's
    * distinct gram set comes out of ONE [[Native.ShingleHashes]] pass as
    * a sorted 8-byte-fp array (bit-identical to xxhash64 over the
    * declarative wordShingles, short-doc rule included), so n_grams is a
    * map-side `size()` with no distinct shuffle. The only corpus-sized
    * exchange is the fp doc-frequency rollup; a df = 1 gram belongs to
    * exactly ONE document (`min(doc_id)` IS that document), so the
    * novel-gram counts come straight off that rollup and the final join
    * is doc-sized on both sides — the gram relation never joins back. */
  def novelGramShare(documents: DataFrame, n: Int = 3): DataFrame = {
    val grams = documents
      .select(col("doc_id"),
        Native.shingleHashes(Funcs.tokens(col("text")), n, sortedDistinct = true).as("fps"))
      .transform(Caches.persisted)
    val perDoc = grams.select(col("doc_id"), size(col("fps")).cast("bigint").as("n_grams"))
    val novel = grams.select(col("doc_id"), explode(col("fps")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1)
      .groupBy("doc_id").agg(count(lit(1)).cast("bigint").as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_grams").cast("double"), 6).as("novel_frac"))
  }

  /** BM25 retrieval scoring (Robertson & Spärck Jones; the Lucene/Okapi
    * `k1`/`b` form with the non-negative `ln(1 + …)` idf): rank the corpus
    * against a fixed bag-of-words query — the retrieval tier a data
    * pipeline uses for targeted selection ("find docs about X to
    * upsample") and for decontamination triage against benchmark prompts.
    *
    *   score(D) = Σ_{q∈Q} ln(1 + (N − df(q) + 0.5)/(df(q) + 0.5))
    *              · tf(q,D)·(k1+1) / (tf(q,D) + k1·(1 − b + b·|D|/avgdl))
    *
    * Scale shape: tokens are FILTERED to the query terms before anything
    * moves, so the only data-sized shuffle carries the query-term postings
    * (∝ matches, not corpus); `df` is a ≤|Q|-row relation and `N`/`avgdl`
    * single-row aggregates, all broadcast back; the final top-k compiles
    * to TakeOrderedAndProject — no global sort, only `k` rows reach the
    * driver. Scores are rounded to 6 decimals on both engines and ties
    * break on doc_id, so the cutoff is deterministic. */
  def bm25TopK(
      documents: DataFrame,
      queryTerms: Seq[String],
      k: Int = 50,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val toks = Funcs.tokens(col("text"))
    val docs = documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("dl"),
      toks.as("toks"))
    // global stats ride as one broadcast row (N, avgdl)
    val stats = docs.agg(
      count(lit(1)).cast("bigint").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    // postings restricted to the query vocabulary BEFORE the shuffle
    val matched = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("word"))
      .where(col("word").isin(queryTerms: _*))
    val tf = matched.groupBy("doc_id", "word")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val df = matched.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    tf.join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(idf * norm), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Multi-query BM25 — [[bm25TopK]] generalized to a QUERY TABLE
    * `(query_id, terms ARRAY<STRING>)`: the retrieval-triage shape a
    * pipeline runs against a whole benchmark suite at once (per-prompt
    * nearest documents for decontamination review, or per-topic targeted
    * selection). Emits `(query_id, doc_id, bm25, rank)`, the `k` best
    * documents per query, rank 1-based, ties to the lower doc_id.
    *
    * Scale shape: the query table is tiny and broadcasts everywhere it
    * appears — the corpus-sized flows are (1) one postings shuffle
    * restricted to the UNION of all query vocabularies (a broadcast
    * semi-join prunes tokens before anything moves) and (2) the per-query
    * top-k window, partitioned by query_id over only the matching
    * candidates (bounded by the postings of that query's terms — the
    * corpus itself is never windowed). tf/df are computed ONCE across
    * queries and fanned out by the broadcast term list, so adding queries
    * adds broadcast rows, not corpus passes. */
  def bm25PerQuery(
      documents: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(col("terms")).as("word")).distinct()
    val vocab = qterms.select("word").distinct()
    val toks = Funcs.tokens(col("text"))
    val docs = documents.select(
      col("doc_id"),
      size(toks).cast("bigint").as("dl"),
      toks.as("toks"))
    val stats = docs.agg(
      count(lit(1)).cast("bigint").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val matched = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("word"))
      .join(broadcast(vocab), Seq("word"), "left_semi")
    val tf = matched.groupBy("doc_id", "word")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val df = matched.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf.join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("word"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(idf * norm), 6).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** Retrieval-based decontamination — the composition [[bm25PerQuery]]
    * exists for: treat each benchmark prompt as a query, drop every
    * document that lands in ANY prompt's top-`k` retrieval neighborhood
    * (the review-then-remove loop, automated — a lexical complement to
    * n-gram `decontaminate`, catching paraphrase-adjacent overlap exact
    * grams miss). Emits the surviving documents with ALL their columns
    * (composable mid-pipeline).
    *
    * Scale shape: [[bm25PerQuery]]'s shapes, then one LEFT ANTI join of
    * the corpus against the ≤ #queries·k hit ids — a relation small
    * enough to broadcast, so the corpus is never shuffled for the
    * removal. */
  def decontaminateByRetrieval(
      documents: DataFrame,
      queries: DataFrame,
      k: Int = 20): DataFrame = {
    val hits = bm25PerQuery(documents, queries, k)
      .select("doc_id").distinct()
    documents.join(broadcast(hits), Seq("doc_id"), "left_anti")
  }

  /** Per-domain quality rollup — the aggregation that PRODUCES the domain
    * blocklists/allowlists [[urlFilter]] consumes (the RefinedWeb/CCNet
    * curation loop: score documents, roll up by registered domain, gate
    * whole domains whose corpus-wide signal is bad). Per canonical domain:
    * page count, mean [[qualityScore]] stopword ratio, mean char length,
    * [[gopherFilter]] keep-rate, and a `flagged` verdict (keep-rate below
    * `minKeepRate` over at least `minDocs` pages — small domains carry too
    * little evidence to condemn).
    *
    * Scale shape: the quality/gate signals are map-side projections
    * (one codegen span over the scan); the rollup is ONE partial-agg'd
    * shuffle on the domain whose final relation is domain-count-sized —
    * at 100 TB that is millions of rows, not corpus-sized. Domain =
    * hostname of [[canonicalUrl]] (scheme/userinfo/www/port already
    * stripped there), so crawl spelling variants roll up together. */
  def domainQuality(
      urlDocuments: DataFrame,
      minKeepRate: Double = 0.5,
      minDocs: Long = 3L): DataFrame = {
    val domain = regexp_replace(canonicalUrl(col("url")), "[/?].*$", "")
    val (fLen, fWordLen, fRep, fStop) =
      gopherFlags(30L, 90L, 3.0, 4.6, 0.12, 0.5, 2L)
    urlDocuments
      .select(
        domain.as("domain"),
        length(col("text")).cast("double").as("n_chars_d"),
        (Funcs.tokenCountIn(Funcs.tokens(col("text")), Funcs.StopwordsEn).cast("double") /
          size(Funcs.tokens(col("text"))).cast("double")).as("stop_ratio"),
        (fLen && fWordLen && fRep && fStop).cast("double").as("keep_d"))
      .groupBy("domain")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        round(avg(col("n_chars_d")), 6).as("mean_chars"),
        round(avg(col("stop_ratio")), 6).as("mean_stopword_ratio"),
        round(avg(col("keep_d")), 6).as("keep_rate"))
      .withColumn("flagged",
        (col("keep_rate") < minKeepRate && col("n_docs") >= minDocs).cast("bigint"))
  }

  /** Character-level Shannon entropy per document (bits/char) — the
    * degenerate-text detector: keyboard mash, repeated-char padding, and
    * base64 blobs all sit far from natural-language entropy (~4.1 bits
    * for English). One native pass per row ([[Native.CharEntropy]]),
    * map-side, zero shuffle at any scale. The `+ 0.0` normalizes IEEE
    * negative zero (single-distinct-char docs) to match the oracle. */
  def charEntropy(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      (round(Native.charEntropy(col("text")), 6) + lit(0.0)).as("entropy"))

  /** Compressibility quality signal — RedPajama-V2's
    * `ccnet_compression_ratio` ([[graft.functions.Native.DeflateRatio]]):
    * zlib size over raw size per document. Catches LONG-RANGE repetition
    * (repeated paragraphs, templated pages) that unigram stats and
    * [[charEntropy]] miss — the deflate window sees 32 KB back, the
    * other signals one token/character at a time. Zero shuffle; the
    * exact value is zlib-impl detail, so the harness surface is
    * rows-only and the signal is pinned by wide-margin property tests
    * (degenerate ≪ prose ≪ random; doubling a text lowers its ratio). */
  def compressionRatio(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      round(Native.deflateRatio(col("text")), 6).as("deflate_ratio"))
}
