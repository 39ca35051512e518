package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) table storage — the co-located
  * join path for repeated large⋈large joins.
  *
  * The shuffle a big equi-join pays is determined at WRITE time: a table
  * bucketed by the join key hash-partitions its files once, so every
  * later join (or aggregation) on that key reads buckets already
  * partitioned the way SortMergeJoin requires — Catalyst's
  * EnsureRequirements sees the scan's outputPartitioning satisfy the
  * join's distribution and inserts NO Exchange; `sortBy` additionally
  * satisfies the sort order so no per-task Sort runs either
  * (plan-asserted in BucketedSpec).
  *
  * The 100 TB shape: a fact table joined every run against the same
  * dimension key amortizes its one write-side shuffle across all
  * subsequent reads — the recurring cost drops from "shuffle 100 TB per
  * join" to "read co-located buckets". Bucket count is fixed at write
  * time, so size it to the target: total size / bucket ≈ a few hundred
  * MB keeps one bucket per task with room for growth. Both sides must
  * agree on the bucket count (or be multiples, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `bucketCol`: the write pays one hash-distribution so every later
    * key-join/key-agg on `bucketCol` skips both Exchange and Sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join two tables bucketed on the same key(s) with the same
    * bucket count — resolves through the catalog so the scans carry
    * their bucket spec and the join plans shuffle-free. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
