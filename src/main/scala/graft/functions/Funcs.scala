package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the operators.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * built-ins so the whole pipeline stays inside whole-stage codegen —
  * no Scala UDFs anywhere in the hot path (SURVEY §4: Catalyst built-ins
  * strictly dominate the reference's record-at-a-time execution).
  */
object Funcs {

  // ---------------------------------------------------------------------
  // Event time (≙ reference TimestampExtractor, OrderTimestampStreamApp.java:136-208)
  // ---------------------------------------------------------------------

  /** Multi-format event-time parse chain with fallback:
    * ISO-8601 instant → ISO local date (start-of-day UTC) → epoch millis →
    * `fallback` (the source/broker timestamp). Mirrors the reference's
    * try/catch chain as a single `coalesce` — branch-free, codegen'd,
    * and total (never throws on malformed input, unlike the reference).
    */
  def eventTimeChain(raw: Column, fallback: Column): Column = coalesce(
    try_to_timestamp(raw),                                   // ISO instant / timestamp
    try_to_timestamp(raw, lit("yyyy-MM-dd")),                // date → start of day (UTC session)
    // epoch millis — try_cast, not cast: a digit string longer than
    // BIGINT's range passes the regex but would THROW under ANSI
    // (property-test finding); try_cast nulls it into the fallback
    timestamp_millis(when(raw.rlike("^-?[0-9]+$"), raw).try_cast("bigint")),
    fallback
  )

  /** JSON field extraction with the reference's "UNKNOWN" fallback on
    * malformed payloads (StreamsOrderCount.java:103-105). */
  def jsonKeyOrUnknown(value: Column, path: String): Column =
    coalesce(get_json_object(value, path), lit("UNKNOWN"))

  // ---------------------------------------------------------------------
  // Embedding similarity (north-star; over `embeddings.embedding ARRAY<FLOAT>`)
  // ---------------------------------------------------------------------

  /** Dot product of two float-array columns, accumulated in DOUBLE for
    * cross-engine determinism. Pure higher-order functions → no UDF,
    * distributes trivially, no shuffle. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm (double). */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in double precision; sequential left-to-right
    * accumulation matches the DuckDB oracle on DOUBLE[] closely enough
    * that integer-only projections (ranks, ids) are bit-stable. */
  def cosineD(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  // ---------------------------------------------------------------------
  // Text analysis (north-star; over `documents.text`)
  // ---------------------------------------------------------------------

  /** Whitespace tokenizer. Single-space split to match the corpus shape and
    * the DuckDB oracle's string_split exactly. */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic document fingerprint: md5 of the raw text — identical
    * output in Spark (`md5`) and the DuckDB oracle (`md5`). At 100 TB the
    * 128-bit digest is collision-safe and makes a compact shuffle key for
    * exact dedup (hash the digest, not the document). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** English-ish stopword set used by quality scoring + language ID.
    * Fixed small list → constant-folded IN expression. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Count of tokens belonging to `words` (higher-order filter; no UDF). */
  def tokenCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  // ---------------------------------------------------------------------
  // MinHash / SimHash sketches (north-star dedup)
  // ---------------------------------------------------------------------

  /** Word n-gram shingles: n consecutive tokens joined by a space.
    * Map-side only; the array is collapsed by the min-aggregation below
    * before anything shuffles. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Default MinHash signature length (shared with [[Native]] registry). */
  val DefaultMinHashK = 16

  /** Fixed 64-bit mixing constants for the MinHash family (xorshift64 from
    * the golden-ratio seed). Shared by the declarative and native
    * implementations so their signatures are bit-identical. */
  def mixConstantsFor(k: Int): Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(k) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
  }
  private def mixConstants(k: Int): Array[Long] = mixConstantsFor(k)

  /** One xxhash64 per shingle — materialize this as its own column BEFORE
    * calling [[minhashesFromHashes]], so the hash runs once, not once per
    * family member (CollapseProject keeps non-cheap projections separate). */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => xxhash64(s))

  /** k MinHash signature values from pre-hashed shingles. Family member i
    * is min over shingles of (hash XOR mᵢ) — 16× cheaper than re-hashing
    * per seed, ANSI-safe (no multiply overflow), and well-mixed because
    * xxhash64 output already is. Deterministic, entirely map-side. */
  def minhashesFromHashes(hashArr: Column, k: Int): Column =
    array(mixConstants(k).map(m =>
      array_min(transform(hashArr, h => h.bitwiseXOR(lit(m))))): _*)

  /** LSH band keys from a MinHash signature: split k values into `bands`
    * groups of `rowsPerBand` and hash each group. Two docs sharing any band
    * key become a candidate pair via an equi-join on (band, key) — the
    * classic banding scheme, shuffle-keyed on the band hash so candidate
    * generation scales linearly with corpus size, never O(n²). */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")))

  /** Bit masks 2^0 .. 2^63 as a literal array (bit 63 = sign bit). */
  private val BitMasks: Column = lit((0 until 64).map(j => 1L << j).toArray)

  /** 64-bit SimHash over tokens: per bit j, the sign of Σ_tokens ±1 where
    * the sign is bit j of xxhash64(token). Fold over per-token hashes with
    * a 64-counter array; declarative, map-side only. */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, BitMasks, (c, m) =>
          c + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(counts, BitMasks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit SimHash values. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming distance between two multi-word signatures (ARRAY<LONG>,
    * equal length — [[Native.simhashWide]]): per-word popcount of the
    * xor, summed. */
  def hammingWide(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L),
      (acc, v) => acc + v)

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03) over
    * pre-hashed k-grams: slide a window of `w` hashes, keep each window's
    * minimum, emit the distinct minima in first-seen order. Guarantees at
    * least one fingerprint per w consecutive k-grams, so any shared
    * substring of ≥ w+k−1 tokens yields a shared fingerprint — the
    * rolling-hash document fingerprint of the training-pipeline brief.
    * Declarative O(n·w) form; [[Native.winnow]] is the one-pass O(n)
    * deque version pinned equal by the tests. */
  def winnowFingerprint(hashArr: Column, w: Int): Column =
    // empty-input guard keeps this identical to Native.WinnowMins (which
    // emits [], not [null], when there are no hashes)
    when(size(hashArr) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), greatest(size(hashArr) - w, lit(0))),
        i => array_min(slice(hashArr, i + 1, lit(w))))))
}
