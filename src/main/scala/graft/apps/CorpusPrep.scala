package graft.apps

import graft.Tables
import graft.operators.{Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end corpus-preparation DAG — the "user of the
  * library" flow a pretraining data team runs nightly, chaining the
  * north-star operators in their production order:
  *
  *   ingest → normalize → quality gate (Gopher rules) → exact dedup →
  *   near-dup canonicalization → decontaminate vs the held-out split →
  *   train/val/test split → sequence packing → shard write
  *
  * Every stage is the already-tested operator; this object only wires
  * them, so the scale properties (map-side gates, digest-keyed dedup,
  * skew-guarded pair joins, bucketed packing, shard-pruned writes)
  * compose unchanged. Intermediate relations that feed multiple stages
  * are reused as DataFrames — Catalyst sees one DAG and the exact-dedup
  * scan, for instance, is shared rather than recomputed.
  */
object CorpusPrep {

  /** Per-stage row counts, returned for observability (the driver-side
    * numbers a pipeline run logs/alerts on). */
  case class Report(
      ingested: Long,
      qualityKept: Long,
      exactKept: Long,
      nearDupKept: Long,
      decontaminated: Long,
      trainRows: Long,
      shardsWritten: Long)

  /** Run the full prep over `documents`, writing train shards to
    * `outDir`. Returns the per-stage report. Thresholds are the operator
    * defaults scaled for the tiny synthetic corpus; a production run
    * passes its own. */
  def run(spark: SparkSession, documents: DataFrame, outDir: String,
      minTokens: Long = 5L, maxTokens: Long = 10000L,
      jaccard: Double = 0.8, ngram: Int = 3, contamN: Int = 8,
      shardSize: Long = 64L): Report = {
    val ingested = documents.count()

    // 1. normalize text once; all downstream stages read the normal form
    val normed = documents
      .join(TextAnalysis.normalizeText(documents).select("doc_id", "text_norm"), Seq("doc_id"))
      .drop("text").withColumnRenamed("text_norm", "text")

    // 2. length gate (map-side; the composite Gopher gate is available for
    //    prose corpora — the synthetic fixture would fail its stopword rule).
    //    Persisted: every later stage (dedup scans, decontamination grams,
    //    packing) reads the gated corpus — without it each per-stage count
    //    action re-runs the ingest+normalize scan
    val nToks = size(split(col("text"), " ")).cast("bigint")
    val gated = normed.filter(nToks >= minTokens && nToks <= maxTokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qualityKept = gated.count()

    // 3. exact dedup: keep the digest keepers
    val keepers = Dedup.exact(gated).select(col("keep_id").as("doc_id"))
    val exact = gated.join(keepers, Seq("doc_id"))
    val exactKept = exact.count()

    // 4. near-dup canonicalization: keep one doc per component
    val nearKept = exact.join(
      Dedup.dedupComponents(exact, n = ngram, threshold = jaccard)
        .filter(col("is_keeper") === 1).select("doc_id"),
      Seq("doc_id"))
    val nearDupKept = nearKept.count()

    // 5. decontaminate: drop train docs sharing an n-gram with the
    //    held-out split, then 6. assign splits
    val contaminated = Pipeline.decontaminate(nearKept, n = contamN).select("doc_id")
    val assigned = nearKept.join(contaminated, Seq("doc_id"), "left_anti")
      .join(Pipeline.hashSplit(nearKept), Seq("doc_id"))
    val clean = assigned.filter(col("split") === "train").drop("split")
    val decontaminated = clean.count()

    // 7. pack into fixed token-budget sequences (metadata columns ride
    //    along with the shard write for the loader)
    val packed = clean.join(Pipeline.packSequences(clean), Seq("doc_id"))
    val trainRows = packed.count()

    // 8. shard write in deterministic global order
    Pipeline.writeTrainingShards(packed, outDir, shardSize)
    val shardsWritten = spark.read.parquet(outDir).select("shard").distinct().count()

    gated.unpersist()
    Report(ingested, qualityKept, exactKept, nearDupKept, decontaminated,
      trainRows, shardsWritten)
  }
}

/** CLI: `sbt "runMain graft.apps.CorpusPrepMain /root/testdata/sf0.001 /tmp/out"` */
object CorpusPrepMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft-corpus-prep"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Native.register(spark)
    val report = CorpusPrep.run(spark, Tables.documents(spark, dir), out)
    println(report)
    spark.stop()
  }
}
