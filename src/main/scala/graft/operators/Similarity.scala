package graft.operators

import graft.functions.Native
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star scope; `embeddings.embedding ARRAY<FLOAT>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is broadcast (it's small by construction), so the
  *    corpus is scanned exactly once with no shuffle until the final
  *    per-query top-k, which reduces to k rows per query.
  *  - [[ivfTopK]]: IVF-bucketed search — corpus assigned to the nearest of
  *    C k-means centroids, queries probe only `nprobe` buckets.
  *
  * Scale design: centroids are tiny (C × d floats) so they live on the
  * driver and are inlined as LITERAL arrays into the assignment
  * expression — bucket assignment is pure map-side codegen'd arithmetic
  * with zero shuffle (vs. the naive corpus×centroids join + window-rank,
  * which shuffles n×C rows). At 100 TB the corpus would additionally be
  * written partitioned/bucketed by centroid id so a probe prunes
  * partitions instead of filtering a full scan.
  */
object Similarity {

  /** Exact brute-force cosine top-k.
    *
    * @param queries (query_id, q_embedding) — small; broadcast.
    * @param corpus  (vec_id, embedding) — arbitrarily large.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms once per row map-side; the per-pair work is a single codegen'd
    // dot product (Native.FloatDotProduct).
    val q = broadcast(queries.withColumn("q_norm", Native.normF(col("q_embedding"))))
    val c = corpus.withColumn("c_norm", Native.normF(col("embedding")))
    val scored = c.join(q)
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"), col("vec_id"),
        (Native.dotF(col("q_embedding"), col("embedding")) / (col("q_norm") * col("c_norm"))).as("sim"))
    topK(scored, k)
  }

  // ---------------------------------------------------------------------
  // K-means centroid training (IVF coarse quantizer)
  // ---------------------------------------------------------------------

  /** Train C centroids with Lloyd iterations, entirely in DataFrame ops.
    *
    * Init: the C rows with the smallest xxhash64(id) — a deterministic
    * pseudo-random sample (TakeOrderedAndProject, no full sort). Each
    * iteration assigns every vector map-side against LITERAL centroids
    * (no shuffle), then recomputes the element-wise mean per cluster via
    * posexplode + partial-aggregated groupBy — the shuffle carries only
    * C × d partial sums per map task regardless of corpus size. Only
    * centroid-sized results (C × d doubles) ever reach the driver.
    * Empty clusters keep their previous centroid.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numCentroids: Int,
      iters: Int = 3): Array[Array[Float]] = {
    // training touches the corpus iters+1 times — persist the two-column
    // projection for the duration and release it before returning
    val proj = corpus.select(col(idCol), col(embCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Float]] = proj
        .select(col(embCol), xxhash64(col(idCol)).as("h"))
        .orderBy(col("h"))
        .limit(numCentroids)
        .collect()
        .map(_.getSeq[Float](0).toArray)
      var it = 0
      while (it < iters) {
        val means = proj
          .select(nearestBucket(col(embCol), cents).as("cid"),
            posexplode(col(embCol)).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(avg(col("v")).as("m"))
          .collect()
        val next = Array.tabulate(cents.length)(i => cents(i).clone())
        means.foreach { r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat }
        cents = next
        it += 1
      }
      cents
    } finally { proj.unpersist(); () }
  }

  /** Cosine-against-each-centroid columns: one codegen'd dot product per
    * literal centroid, divided by the centroid's (driver-computed) norm.
    * The row's own norm is constant across centroids so it cannot change
    * the ranking and is omitted. */
  private def centroidSims(emb: Column, cents: Array[Array[Float]]): Seq[Column] =
    cents.toSeq.map { ct =>
      val n = math.sqrt(ct.map(x => x.toDouble * x).sum)
      Native.dotF(emb, typedLit(ct)) / lit(if (n == 0.0) 1.0 else n)
    }

  /** Nearest-centroid id (0-based INT) as a pure map-side expression.
    * Ties break to the lowest id (array_position returns the first match,
    * and the max value is taken from the same array, so the equality is
    * bit-exact). */
  def nearestBucket(emb: Column, cents: Array[Array[Float]]): Column = {
    val sims = array(centroidSims(emb, cents): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** The `nprobe` nearest centroid ids as an ARRAY<INT>, map-side only:
    * sort (−sim, cid) structs (struct ordering = sim desc, cid asc
    * tie-break), take the first nprobe cids. */
  def probeBuckets(emb: Column, cents: Array[Array[Float]], nprobe: Int): Column = {
    val entries = centroidSims(emb, cents).zipWithIndex.map { case (s, i) =>
      struct((-s).as("neg"), lit(i).as("cid"))
    }
    slice(transform(array_sort(array(entries: _*)), e => e.getField("cid")), 1, nprobe)
  }

  /** IVF ANN: k-means centroids (deterministic init + `kmeansIters` Lloyd
    * refinements), corpus assigned to its `corpusAssign` nearest buckets
    * map-side (multi-assignment redundancy — index grows ×corpusAssign,
    * recall rises sharply on diffuse data), queries probe their `nprobe`
    * nearest buckets. The probe join broadcasts the (small) exploded query
    * side, so the corpus is never shuffled; at 100 TB, storing the corpus
    * partitioned by bucket turns the probe into partition pruning.
    * Recall/cost dials: nprobe, corpusAssign, numCentroids.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numCentroids: Int,
      nprobe: Int,
      kmeansIters: Int = 3,
      corpusAssign: Int = 3): DataFrame = {
    val cents = trainCentroids(corpus, "vec_id", "embedding", numCentroids, kmeansIters)
    val corpusB = corpus.select(
      col("vec_id"), col("embedding"),
      Native.normF(col("embedding")).as("c_norm"),
      explode(probeBuckets(col("embedding"), cents, corpusAssign)).as("bucket"))
    val queryB = broadcast(queries.select(
      col("query_id"), col("q_embedding"),
      Native.normF(col("q_embedding")).as("q_norm"),
      explode(probeBuckets(col("q_embedding"), cents, nprobe)).as("bucket")))
    val scored = queryB.join(corpusB, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (Native.dotF(col("q_embedding"), col("embedding")) / (col("q_norm") * col("c_norm"))).as("sim"))
      // a (query, vec) pair can meet in several shared buckets — dedup
      // before ranking so multi-assignment never double-counts a neighbor
      .dropDuplicates("query_id", "vec_id")
    topK(scored, k)
  }

  /** Per-query top-k with deterministic tie-break (sim desc, vec_id asc);
    * integer-only output so the result is bit-stable across engines. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("bigint").as("rank"))
  }
}
