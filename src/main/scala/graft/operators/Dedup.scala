package graft.operators

import graft.functions.{Funcs, Native}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star scope).
  *
  * Scale design: every variant avoids O(n²) comparisons. Exact dedup
  * shuffles on a 128-bit digest (bytes, not documents). MinHash-LSH and
  * SimHash generate candidates via equi-joins on sketch keys — shuffle
  * volume is O(n · bands), verification touches only candidate pairs.
  * Embedding near-dup blocks on a partition key before comparing.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest doc_id
    * (deterministic, unlike dropDuplicates' arbitrary pick). The shuffle key
    * is the md5 digest, so 100 TB of text shuffles only (digest, id) pairs
    * once the map-side projection prunes the text column. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(Funcs.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → k-minhash signature (map-side) → explode band keys →
    * self-equi-join on (band, key) → distinct pairs → verify Jaccard on
    * shingle sets ≥ threshold. The only shuffles are the band-key join and
    * the final distinct; no cross join anywhere.
    */
  def minhashLsh(
      documents: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    val rowsPerBand = numHashes / bands // LSH S-curve knee ≈ (1/b)^(1/r) ≈ 0.71
    val sketched = documents.select(
      col("doc_id"),
      array_distinct(Funcs.wordShingles(Funcs.tokens(col("text")), shingleLen)).as("sh"))

    // Candidate generation on (band, bandkey, id) ONLY — the shuffle moves
    // 3 longs per (doc, band), never the shingle arrays. Shingles re-join
    // by id afterwards, touching only the deduped candidate pairs.
    val banded = sketched
      .withColumn("sig", Native.minhashSig(col("sh"), numHashes))
      .select(col("doc_id"),
        posexplode(Funcs.lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band", "bkey")))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(sketched.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sketched.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit signature per doc; candidate pairs share one
    * of four 16-bit signature quadrants (pigeonhole: Hamming ≤ 3 ⇒ some
    * quadrant equal), then exact Hamming ≤ maxHamming verification.
    * Same equi-join-on-sketch-key scaling as MinHash-LSH. */
  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = documents.select(
      col("doc_id"),
      Native.simhash(Funcs.tokens(col("text"))).as("sig"))
    // four 16-bit quadrants as candidate keys
    val quads = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array(
        col("sig").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("sig"), 16).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("sig"), 32).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("sig"), 48).bitwiseAND(lit(0xFFFFL)))).as(Seq("q", "qkey")))
    val a = quads.select(col("q"), col("qkey"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = quads.select(col("q"), col("qkey"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("q", "qkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", Funcs.hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs, blocked on `label` so the join is an
    * equi-join on the block key + similarity filter, not a full cross join.
    * (In a real pipeline the block key is an LSH bucket / IVF centroid —
    * see [[Similarity.ivfTopK]]; `label` stands in as the partitioner.) */
  def embeddingNearDup(embeddings: DataFrame, minCosine: Double): DataFrame = {
    // Norms are computed once per vector on the map side (n rows), not once
    // per pair (n²/blocks rows) — cosine inside the join is a single dot.
    def side(ida: String, emb: String, nrm: String) = embeddings.select(
      col("label"), col("vec_id").as(ida), col("embedding").as(emb),
      Native.normF(col("embedding")).as(nrm))
    side("id_a", "emb_a", "norm_a").join(side("id_b", "emb_b", "norm_b"), Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .filter(Native.dotF(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")) > minCosine)
      .select(col("id_a"), col("id_b"))
  }

  /** N-gram Jaccard similarity for explicit pairs (verification primitive
    * shared by tests; the LSH path above inlines the same expression). */
  def jaccardNgram(pairs: DataFrame, textA: String, textB: String, n: Int): DataFrame = {
    val shA = array_distinct(Funcs.wordShingles(Funcs.tokens(col(textA)), n))
    val shB = array_distinct(Funcs.wordShingles(Funcs.tokens(col(textB)), n))
    pairs.withColumn("jaccard",
      size(array_intersect(shA, shB)).cast("double") /
        size(array_union(shA, shB)).cast("double"))
  }
}
