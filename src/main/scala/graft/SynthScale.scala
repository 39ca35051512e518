package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthesize an sf1-EQUIVALENT corpus — the fourth decade of scale
  * evidence (SURVEY §8): K replicas of sf0.1 with re-keyed ids and
  * replica-perturbed content, so every cardinality the operators stress
  * — exact-dup groups, near-dup pair counts, LSH bucket sizes, line and
  * span structure, vocabulary, join keys — grows ×K HONESTLY instead of
  * colliding into one giant duplicate family:
  *
  *  - documents: replica r > 0 appends `~r` to every space token, so
  *    cross-replica shingles/fingerprints/lines never match while the
  *    WITHIN-replica duplicate structure replicates exactly — pair
  *    counts, components, and span families scale linearly, the way a
  *    real 10× crawl's do. Replica 0 is the original corpus verbatim.
  *  - embeddings: replica vectors get a deterministic per-(id, replica,
  *    dim) jitter of ±0.005 — distinct vectors with the same
  *    distribution, so centroid training, LSH bucketing, and ANN probe
  *    shapes scale rather than degenerate into exact copies.
  *  - orders / events: ids re-stride by replica (more customers, more
  *    users — grouping cardinalities scale with the data, matching how
  *    TPC-H itself scales).
  *
  * Deterministic end-to-end (no RNG, no wall clock): the committed code
  * IS the reproducibility of the scaling curve. Output lands under the
  * repo (`synthdata/sf1` by default, gitignored) because /root/testdata
  * is read-only; [[ScalingCurve]] picks the directory up automatically
  * when present and extends its log-log fit to four points.
  */
object SynthScale {

  /** Replica id stride: far above every natural id and every fixture
    * re-key offset (+100000 / +200000) used by the planted queries. */
  private val Stride = 10000000L

  private[graft] def replicate(base: DataFrame, k: Int)(
      perReplica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(r => perReplica(base, r)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.1"
    val out = args.headOption.getOrElse("synthdata/sf1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val docs = replicate(Tables.documents(spark, base), k) { (df, r) =>
      val text =
        if (r == 0) col("text")
        else concat_ws(" ",
          transform(split(col("text"), " "), t => concat(t, lit(s"~$r"))))
      df.select(
        (col("doc_id") + lit(r * Stride)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("bigint").as("n_chars"))
    }
    docs.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = replicate(Tables.embeddings(spark, base), k) { (df, r) =>
      val jittered =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), lit(r), i), lit(1000L)) - lit(500L))
            .cast("double") / lit(100000.0)).cast("float"))
      df.select(
        (col("vec_id") + lit(r * Stride)).as("vec_id"),
        jittered.as("embedding"),
        col("label"))
    }
    emb.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val orders = replicate(Tables.orders(spark, base), k) { (df, r) =>
      df.select(
        (col("o_orderkey") + lit(r * Stride)).as("o_orderkey"),
        (col("o_custkey") + lit(r * Stride)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }
    orders.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val events = replicate(Tables.events(spark, base), k) { (df, r) =>
      df.select(
        (col("event_id") + lit(r * Stride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r * Stride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    events.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    Seq("documents", "embeddings", "orders", "events").foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      System.err.println(s"[synth] $t: $n rows")
    }
    spark.stop()
  }
}
