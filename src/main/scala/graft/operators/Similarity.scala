package graft.operators

import graft.functions.{Funcs, Native}
import org.apache.spark.sql.DataFrame
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
  *  - [[ivfTopK]]: IVF-style bucketed search — corpus assigned to the
  *    nearest of C centroids at write time, queries probe only `nprobe`
  *    buckets. At 100 TB this turns a full scan into a partition-pruned
  *    read of ~nprobe/C of the data.
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

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (one broadcast pass), then search each query only within its own
    * `nprobe` nearest centroid buckets. Centroids are sampled corpus
    * vectors (deterministic: lowest vec_ids) — a k-means refinement drops
    * in without changing the dataflow.
    *
    * Recall/cost dial: nprobe/numCentroids. The bucket join is an equi-join
    * on centroid id — shuffle scales with corpus size, not corpus².
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, numCentroids: Int, nprobe: Int): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy(col("vec_id")).limit(numCentroids)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_embedding"),
          Native.normF(col("embedding")).as("cent_norm")))

    /** Nearest `n` centroid ids per row of `df` (id column `idCol`,
      * embedding column `embCol`), emitted as one (idCol, embCol, bucket)
      * row per probe. Broadcast nested-loop against C centroids + per-id
      * top-n. Ranking uses dot/|centroid| — the row's own norm is constant
      * across centroids, so dividing by it cannot change the ranking. */
    def assign(df: DataFrame, idCol: String, embCol: String, n: Int): DataFrame =
      df.join(centroids)
        .select(col(idCol), col(embCol),
          col("centroid_id").as("bucket"),
          (Native.dotF(col(embCol), col("c_embedding")) / col("cent_norm")).as("c_sim"))
        .withColumn("c_rank",
          row_number().over(Window.partitionBy(col(idCol)).orderBy(col("c_sim").desc, col("bucket"))))
        .filter(col("c_rank") <= n)
        .select(col(idCol), col(embCol), col("bucket"))

    val corpusB = assign(corpus.select(col("vec_id"), col("embedding")), "vec_id", "embedding", 1)
      .withColumn("c_norm", Native.normF(col("embedding")))
    val queryB = assign(queries.select(col("query_id"), col("q_embedding")), "query_id", "q_embedding", nprobe)
      .withColumn("q_norm", Native.normF(col("q_embedding")))

    val scored = queryB.join(corpusB, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (Native.dotF(col("q_embedding"), col("embedding")) / (col("q_norm") * col("c_norm"))).as("sim"))
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
