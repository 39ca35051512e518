package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session recipe every harness main shares (Verify, Bench,
  * TimeQuery, the app runners). Hand-rolled copies drifted — one main ran
  * AQE, another didn't — and the next fixture-vintage flag would have to
  * be added N times; session config is load-bearing here (`nanosAsLong`
  * decides how `events.parquet` parses, the UTC pin is what makes the
  * TIMESTAMP_NTZ normalization instant-preserving), so it lives in one
  * place.
  */
object Sessions {
  /** local[cpus] session with the harness invariants: shuffle parallelism
    * = cpus (not the 200 default), AQE on, UTC session timezone, legacy
    * nanos-as-long parquet reads, native functions registered. */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet has shipped as TIMESTAMP(NANOS): read as raw long,
      // normalized in Tables.normalizeEventTime
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r17: constraint propagation OFF. Inner equi-joins on DERIVED keys
      // (the dedup tier joins on sha2(decode(encode(spine))) digests) make
      // InferFiltersFromConstraints synthesize `isnotnull(<derived key>)`
      // and push the WHOLE codec chain below the exchange into the scan
      // stage — every payload decodes TWICE, once of them serialized in
      // the single-split scan task (measured: dedup_audio_mp3 ×3.5, the
      // optimization guide's §4.4 duplicate-evaluation pathology with
      // native expressions in the UDF role). What the inference buys in
      // exchange — early isnotnull pruning on join keys — is ~nothing
      // here (fixture keys are never null) and marginal at table scale
      // (null join keys drop in the join anyway); what it costs scales
      // with payload bytes. Optimizer-only toggle: join semantics and
      // every query result are unchanged.
      .config("spark.sql.constraintPropagation.enabled", "false")
      // r17: size-based AQE coalescing. The default parallelismFirst=true
      // keeps every post-shuffle stage at `cpus` partitions however tiny
      // the data, so a multi-stage sketch query pays 32 near-empty tasks
      // of pure scheduling overhead per exchange (measured: 0.2-0.4 s per
      // stage at sf0.1). Size-first coalescing folds those to the
      // advisory partition size — the optimization guide's §2.2 stance
      // ("size partitions 100 MB-1 GB … let AQE coalesce") — while
      // user-specified repartitions (the codec-tier spreads, the shard
      // writes) keep their explicit widths. At cluster scale the same
      // setting is what sizes reduce partitions by bytes instead of by a
      // core count they outgrew.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // r17: v2 file-output commit — task outputs promote to the final
      // directory at TASK commit (parallel) instead of one serial
      // driver-side rename sweep at job commit; the store tier's shard
      // writes commit ~80 dynamic partition directories per batch, where
      // the v1 sweep is pure serial wall time. Job-commit atomicity is
      // not load-bearing anywhere in the engine: the batch-store protocol
      // has its own atomicity above the filesystem (content-hashed batch
      // directory + `_COMMIT` marker written last, partial directories
      // invisible to readers and overwritten by retry), and bench/verify
      // writes are whole-directory overwrites.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // r17: the default 100-entry whole-stage-codegen class cache thrashes
      // under a 180+-query harness — by the time a query's timed reps run,
      // its generated classes (some compiled from multi-thousand-node
      // fixture expression trees at 0.5-1.5 s of Janino each) have been
      // evicted by the other queries' warm-ups, so every rep recompiles
      // what the warm-up pass deliberately paid for once. Sized to hold
      // the whole harness's classes; cost is classloader metadata, not
      // heap at this scale. Static conf — must be set at session build.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.Native.register(s)
    s
  }
}
