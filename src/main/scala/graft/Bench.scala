package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The `noop` sink fully materializes every output
  * column (a bare .count() would let Catalyst prune the projections we're
  * trying to measure). One warm-up pass of the flagship query pays the
  * session/codegen startup cost outside the timings.
  *
  * The bench is self-defending against machine load (round-5 lesson: a
  * transient load spike turned a 1.2 s query into a recorded 22 s median
  * and contaminated the round's headline number):
  *   - 1-minute /proc/loadavg is sampled before each query's reps and
  *     emitted per-query in the JSON, so a reader can tell regression
  *     from noise without re-running anything;
  *   - after the pass, any query whose median exceeded `spreadCap` (3×)
  *     its own fastest rep is automatically re-measured once and the
  *     cleaner (lower-median) result kept, flagged in the `rerun` list;
  *   - the external-load gate keys on the AMBIENT loadavg sampled before
  *     Spark starts (`ambient_load` in the JSON): if the machine was
  *     already busy past `loadCap` (4.0), every query re-measures. Mid-run
  *     samples are deliberately NOT gated on — a 32-thread bench drives
  *     the 1-min loadavg past any fixed cap by itself, and gating on its
  *     own work flagged 83/91 queries on an idle box;
  *   - TWO fixed-cost canary queries bracket the timed pass — a CPU-bound
  *     one (round-7 lesson: ambient 3.9 passed the 4.0 gate yet every
  *     query carried a ~+1.25 s contention floor) and a memory/shuffle-
  *     bandwidth one (round-8 lesson: bandwidth contention inflated
  *     shared queries ~1.16× while the CPU canary stayed clean). Each
  *     canary's idle cost is committed; either exceeding 3× its floor
  *     stamps `contaminated: true` in the JSON no matter what the
  *     loadavg said.
  */
object Bench {

  /** 1-minute load average, or -1 if unreadable (non-Linux). */
  private def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Canary: a fixed-size, SF-independent query — 2²⁴ xxhash64'd longs over
    * 32 partitions, summed. It exercises exactly what external load
    * contaminates (task scheduling across all cores + a codegen'd scan) and
    * nothing that varies with the data (no I/O, no shuffle). Its idle-box
    * cost is a committed constant, so a contaminated run is detectable from
    * the JSON alone — the round-7 lesson: the ambient-loadavg gate (4.0)
    * passed a run taken at ambient 3.9 that carried a uniform ~+1.25 s
    * per-query floor, turning a 0.72× engine into an apparent 4.8×. */
  private[graft] def canaryQuery(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0L, 1L << 24, 1L, 32)
      .selectExpr("xxhash64(id) AS h")
      // bit_xor, not sum: 2^24 xxhash64 longs overflow an ANSI BIGINT sum
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.col("h")).as("s"))

  /** BANDWIDTH canary: the round-8 lesson — two same-day full runs read
    * ~1.16× a same-code checkpoint on shared queries with per-query
    * attribution that disagreed between them, while the CPU-bound canary
    * above stayed comfortably under its floor: external MEMORY/shuffle
    * bandwidth contention is invisible to a scan that never leaves
    * registers. This probe is dominated by exactly that traffic: ~270 MB
    * of wide rows through one round-robin shuffle (write + fetch + an
    * explode over the fetched arrays), fixed-size and SF-independent like
    * its CPU twin. Both canaries gate `contaminated` — either exceeding
    * 3× its committed idle floor stamps the run. */
  private[graft] def bandwidthCanaryQuery(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0L, 1L << 20, 1L, 32)
      // 31 repeats, deliberately ODD: bit_xor over an even count of equal
      // values is identically 0, which would make the determinism pin (and
      // any sanity check on the result) vacuous
      .selectExpr("id", "array_repeat(xxhash64(id), 31) AS a")
      .repartition(32, org.apache.spark.sql.functions.col("id"))
      .selectExpr("explode(a) AS v")
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.col("v")).as("s"))

  /** Idle-box canary floor (seconds): the canary's median on this box with
    * ambient load < 1, measured at calibration time and COMMITTED — the
    * reference point that makes `contaminated` decidable offline. */
  private[graft] val CanaryFloorSec: Double = 0.11

  /** Idle-box floor for [[bandwidthCanaryQuery]] (same calibration
    * protocol; shuffle I/O is noisier than the CPU canary, so the floor
    * is set from the high side of the idle spread). */
  private[graft] val BandwidthCanaryFloorSec: Double = 0.65

  /** A canary median this far above its committed idle floor marks the
    * whole run contaminated, regardless of what ambient loadavg claimed. */
  private[graft] val CanaryContaminationFactor: Double = 3.0

  /** Ambient 1-min loadavg (sampled BEFORE Spark exists) above this cap
    * stamps the run contaminated even when both canaries pass — the
    * round-12 blind spot: a run at ambient 2.99 carried a uniform 1.355×
    * inflation across the shared cohort while both canaries sat under
    * their floors. The canaries are narrow single-query probes that never
    * compete for all 32 slots the way the 32-thread workload does, so
    * moderate multi-core ambient load is invisible to them but not to the
    * workload. 2.0 is deliberately conservative: record benches are taken
    * at ambient < 0.5 (the committed convention), so a clean run has an
    * order of magnitude of headroom, while the observed 2.99 failure mode
    * stamps. An unreadable loadavg (-1, non-Linux) never stamps —
    * misconfiguration must not invalidate runs, [[isContaminated]]'s
    * stance. */
  private[graft] val AmbientLoadCap: Double = 2.0

  /** The RUN-level contamination decision, pure so the spec can pin it:
    * contaminated iff the CPU canary, the bandwidth canary, OR the ambient
    * pre-launch loadavg says so. Three probes because three distinct
    * failure modes were each observed slipping past the other two: CPU
    * contention (round 7), memory-bandwidth contention (round 8), and
    * moderate multi-core ambient load below both canary floors (round 12,
    * the `ambientLoad` term's reason to exist). */
  private[graft] def isRunContaminated(
      cpuCanarySec: Double,
      bwCanarySec: Double,
      ambientLoad: Double,
      cpuFloor: Double = CanaryFloorSec,
      bwFloor: Double = BandwidthCanaryFloorSec,
      ambientCap: Double = AmbientLoadCap,
      factor: Double = CanaryContaminationFactor): Boolean =
    isContaminated(cpuCanarySec, cpuFloor, factor) ||
      isContaminated(bwCanarySec, bwFloor, factor) ||
      (ambientCap > 0 && ambientLoad > ambientCap)

  /** MICRO canaries: 1/8-size twins of the bracketing canaries, cheap
    * enough to interleave every [[main]]`.checkpointEvery` queries. The
    * round-8 blind spot: the bracketing canaries stamp a run
    * contaminated but cannot say WHEN the contamination arrived, so two
    * same-day runs disagreed on per-query attribution with both
    * brackets clean. Checkpoints timestamp contention WITHIN the run:
    * the windowed rule ([[contaminatedWindows]]) flags only the query
    * windows whose bracketing checkpoints ran hot, so the rest of the
    * run stays usable evidence instead of the whole pass dying with the
    * stamp. One rep each (a checkpoint must cost milliseconds, not a
    * 3-rep measurement) — their floors are committed from the high side
    * of the idle spread to absorb single-rep noise. */
  private[graft] def microCanaryQuery(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0L, 1L << 21, 1L, 32)
      .selectExpr("xxhash64(id) AS h")
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.col("h")).as("s"))

  /** 1/8-size [[bandwidthCanaryQuery]] (2¹⁷ wide rows through the same
    * round-robin shuffle + explode). */
  private[graft] def microBandwidthCanaryQuery(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0L, 1L << 17, 1L, 32)
      .selectExpr("id", "array_repeat(xxhash64(id), 31) AS a")
      .repartition(32, org.apache.spark.sql.functions.col("id"))
      .selectExpr("explode(a) AS v")
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.col("v")).as("s"))

  /** Idle-box single-rep floors for the micro canaries (same calibration
    * protocol as [[CanaryFloorSec]]; single-rep + small size ⇒ overhead-
    * dominated, so the floors sit well above the linear 1/8 scaling —
    * calibrated steady-state medians 0.09 / 0.27 s on the idle reference
    * box, floors from the high side to absorb single-rep noise). */
  private[graft] val MicroCanaryFloorSec: Double = 0.12
  private[graft] val MicroBandwidthCanaryFloorSec: Double = 0.35

  /** The WINDOWED flagging rule, pure so the spec can pin it: checkpoint
    * samples c₀..cₘ bracket m query windows (window j ran between
    * checkpoints j and j+1). A window is contaminated iff EITHER of its
    * bracketing checkpoints exceeds factor × its committed floor for
    * EITHER canary kind — contention present at entry or exit taints
    * everything measured in between (it cannot be localized finer than a
    * window), while windows bracketed by two clean checkpoints keep
    * their evidential value. Returns one flag per window; fewer than two
    * checkpoints bracket no windows. Broken floors (≤ 0) never flag,
    * [[isContaminated]]'s stance. */
  private[graft] def contaminatedWindows(
      cpu: Seq[Double], bw: Seq[Double],
      cpuFloor: Double = MicroCanaryFloorSec,
      bwFloor: Double = MicroBandwidthCanaryFloorSec,
      factor: Double = CanaryContaminationFactor): Seq[Boolean] = {
    require(cpu.length == bw.length, "one cpu and one bw sample per checkpoint")
    val hot = cpu.zip(bw).map { case (c, b) =>
      isContaminated(c, cpuFloor, factor) || isContaminated(b, bwFloor, factor)
    }
    if (hot.length < 2) Seq.empty
    else hot.sliding(2).map(p => p.head || p.last).toSeq
  }

  /** The flagging rule, pure so the spec can pin it: contaminated iff the
    * worst canary median observed around the timed pass exceeds
    * factor × committed idle floor. A non-positive floor (calibration
    * failure) never flags — the canary must not be able to invalidate runs
    * by misconfiguration. */
  private[graft] def isContaminated(
      canaryMedianSec: Double,
      floorSec: Double = CanaryFloorSec,
      factor: Double = CanaryContaminationFactor): Boolean =
    floorSec > 0 && canaryMedianSec > factor * floorSec

  /** median, min, and load sampled immediately before the reps ran. */
  private final case class Sample(median: Double, min: Double, load: Double)

  // ---- uniform machine-state drift (r15): the signature the ambient/
  // canary gates twice let through (r13 run-B, r14 finaltree-a) is the
  // WHOLE shared cohort reading ~1.2x a committed clean record — dozens
  // of queries whose code did not change do not all slow together for a
  // code reason. The stamp compares per-query medians against the
  // committed pace reference (bench_logs/pace_reference.json, refreshed
  // each round from the latest clean pair) and fires on the shared-
  // cohort MEDIAN ratio: a moved median means half the cohort moved,
  // which IS the uniform signature (calibration on r12–r15 records:
  // every clean run ≤ 1.06, both contaminated finaltree records ≥ 1.22).
  val UniformDriftFactor = 1.15
  val MinSharedForDrift = 30

  /** Extract the flat `"queries":{...}` dict of a bench record (keys
    * have no escapes, values are plain numbers — the format fullJson
    * itself writes). Empty map when absent/malformed. */
  def parseQueries(json: String): Map[String, Double] = {
    val tag = "\"queries\":{"
    val i = json.indexOf(tag)
    if (i < 0) return Map.empty
    val start = i + tag.length
    val end = json.indexOf('}', start)
    if (end < 0) return Map.empty
    json.substring(start, end).split(",").iterator.flatMap { kv =>
      val c = kv.lastIndexOf(':')
      if (c <= 0) None
      else {
        val k = kv.substring(0, c).trim.stripPrefix("\"").stripSuffix("\"")
        try Some(k -> kv.substring(c + 1).trim.toDouble)
        catch { case _: NumberFormatException => None }
      }
    }.toMap
  }

  /** (drift?, shared-cohort median ratio); ratio −1 when the cohorts
    * share fewer than [[MinSharedForDrift]] queries. */
  def uniformDrift(current: Map[String, Double],
      reference: Map[String, Double]): (Boolean, Double) = {
    val shared = (current.keySet & reference.keySet).toSeq
      .filter(k => reference(k) > 0)
    if (shared.size < MinSharedForDrift) return (false, -1.0)
    val ratios = shared.map(k => current(k) / reference(k)).sorted
    val med = ratios(ratios.length / 2)
    (med > UniformDriftFactor, med)
  }

  // ---- per-query outlier guard (r17): the r16 driver record carried
  // multimodal_decode_wav_profiles at 8.12 s vs 2.59 s clean — ×3.1 on
  // unchanged code — with rerun_count 0, because the spread rule keys on
  // WITHIN-run spread and a sustained interference window covering all
  // reps of one query passes it. The committed pace reference supplies
  // the missing cross-run evidence: when the run's overall pace is sane
  // (under [[OutlierPaceCeiling]] — a machine-wide slowdown is the
  // uniform-drift stamp's job), any query over
  // [[OutlierVsReferenceFactor]] × its reference time re-measures once.
  val OutlierVsReferenceFactor = 2.5
  val OutlierPaceCeiling = 1.3

  /** Pure so BenchGateSpec can pin it: names whose current median exceeds
    * factor × the pace reference's per-query time, gated on a sane run
    * pace (paceRatio in (0, paceCeiling]); a negative/absent pace ratio
    * (no reference, subset cohort) or a paced-out run returns nothing. */
  def referenceOutliers(
      current: Map[String, Double],
      reference: Map[String, Double],
      paceRatio: Double,
      factor: Double = OutlierVsReferenceFactor,
      paceCeiling: Double = OutlierPaceCeiling): Set[String] =
    if (paceRatio <= 0 || paceRatio > paceCeiling) Set.empty
    else current.collect {
      case (k, v) if reference.get(k).exists(r => r > 0 && v > factor * r) => k
    }.toSet

  /** Cap on rerun names inlined in the compact stdout line. The r15 driver
    * run launched at ambient 4.19 (residue of its own correctness pass), so
    * ALL 174 queries re-measured and all 174 names landed in the compact
    * line's `rerun` array — blowing the one-line JSON past the driver's
    * bounded tail window (`parsed: null`). The compact line now carries
    * `rerun_count` (the true total) plus at most this many names; the full
    * list stays in BENCH.json. */
  private[graft] val RerunInlineCap = 5

  /** The ONE stdout line. Every field is bounded regardless of suite size:
    * `queries` holds at most 15 entries (top by median, stated via
    * `queries_included`/`queries_total`), `rerun` at most [[RerunInlineCap]]
    * names with `rerun_count` carrying the true total, and everything else
    * is scalar — so a full-suite rerun (the r15 failure) emits the same
    * ≤2 KB shape as a clean run. BenchGateSpec pins the worst-case length. */
  private[graft] def compactLine(
      total: Double,
      topQueries: Seq[(String, Double)],
      queriesTotal: Int,
      sfDir: String,
      contaminated: Boolean,
      uniformDrift: Boolean,
      paceRatio: Double,
      rerunNames: Seq[String],
      reps: Int,
      subset: Boolean,
      failed: Int,
      settleSec: Double,
      outlierCount: Int = 0): String = {
    def fmt(d: Double) = f"$d%.4f"
    val qsTop = topQueries.map { case (k, s) => "\"" + k + "\":" + fmt(s) }
      .mkString("{", ",", "}")
    val rerunInline = rerunNames.take(RerunInlineCap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsTop,"queries_included":${topQueries.size},"queries_total":$queriesTotal,"sf":"$sfDir","contaminated":$contaminated,"uniform_drift":$uniformDrift,"pace_vs_reference":${fmt(paceRatio)},"rerun_count":${rerunNames.size},"rerun":$rerunInline,"outlier_count":$outlierCount,"reps":$reps,"subset":$subset,"failed":$failed,"settle_sec":${fmt(settleSec)},"full":"BENCH.json"}"""
  }

  /** Bounded pre-bench settle: poll the 1-min loadavg until it drops under
    * the contamination cap or `maxSec` elapses, and return (finalAmbient,
    * waitedSec). The driver launches the bench immediately after its
    * correctness run, so the loadavg it inherits is residue of work that
    * already FINISHED — every r13–r15 driver record self-stamped
    * `contaminated` on that residue alone while both canaries read clean.
    * Waiting out the decay (loadavg halves ~every minute once idle) turns
    * those launches into formally-clean records; the wait is recorded as
    * `settle_sec` so the report shows it happened. */
  private[graft] def settleAmbient(
      cap: Double,
      maxSec: Double,
      sample: () => Double = loadavg1,
      sleepMs: Long = 5000): (Double, Double) = {
    val start = System.nanoTime()
    var ambient = sample()
    def waited = (System.nanoTime() - start) / 1e9
    while (ambient > cap && waited < maxSec) {
      System.err.println(
        f"[bench] settling: ambient loadavg $ambient%.2f > cap $cap%.1f — waiting (${waited}%.0f s / ${maxSec}%.0f s max)")
      Thread.sleep(sleepMs)
      ambient = sample()
    }
    (ambient, waited)
  }

  def main(args: Array[String]): Unit = {
    // r12 delivery escalation (six rounds of `parsed: null` driver
    // artifacts despite a complete sub-2KB line in the tail): make the
    // compact JSON the FIRST line of stdout as well as the last, by
    // making it the ONLY line — everything any library writes to
    // System.out during the run is diverted to stderr, and the real
    // stdout is written exactly once, at the end, after spark.stop().
    // A driver parser that takes the first line, the last line, the
    // first `{`, or the whole stream now reads the same one object.
    val realOut = System.out
    System.setOut(new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.err), true))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // AMBIENT load, sampled before Spark exists: the external-load gate
    // keys on this, not on mid-run samples — a 32-thread bench drives the
    // 1-min loadavg well past any fixed cap all by itself, so a mid-run
    // sample cannot distinguish "machine was busy" from "bench was
    // working" and would flag nearly every query (observed: 83/91 flagged
    // on an idle box). Per-query samples stay in the JSON for post-hoc
    // reads; the per-query contamination signal is the rep SPREAD, which
    // is internal evidence and immune to self-load.
    //
    // r16: settle first — the driver launches this main right after its
    // correctness run, and the inherited loadavg residue stamped every
    // r13–r15 driver record `contaminated` despite clean canaries. Bounded
    // wait, default 180 s, SPARK_GRAFT_BENCH_SETTLE_MAX=0 disables.
    val settleMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MAX", "180").toDouble
    val (ambient, settleSec) = settleAmbient(AmbientLoadCap, settleMax)
    // builder-side fast iteration: a comma-separated subset of query names
    // (the driver never sets this, so its per-round bench stays complete)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    // fail loudly on unknown names: a typo would otherwise run a silent
    // partial (or empty) bench that exits 0 looking like a fast full one
    only.foreach { names =>
      val unknown = names.filterNot(SparkEntry.queries.contains)
      if (unknown.nonEmpty) {
        System.err.println(s"[bench] unknown SPARK_GRAFT_BENCH_ONLY names: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(1)
      }
    }
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // warm-up: one untimed pass of EVERY query so the timed pass measures
    // steady-state execution (codegen compiled, file/page caches hot, JIT
    // warmed) instead of first-touch noise — the numbers the 2×-of-baseline
    // gate should see. Failures here are ignored; the timed pass reports.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drop relations the warm-up .persist()ed: the CacheManager would
    // otherwise substitute them into the timed pass by plan equality and
    // the sketch queries would measure cache scans instead of their own
    // compute (JVM/codegen/page-cache warmth is retained, which is the
    // warm-up's actual purpose)
    spark.catalog.clearCache()

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spreadCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_CAP", "3.0").toDouble
    val loadCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_CAP", "4.0").toDouble

    // Cache is cleared before every pass so a query-internal .persist()
    // from pass N can't turn pass N+1 into a cache scan (plan-equality
    // substitution by the CacheManager).
    def measure(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Sample = {
      val load = loadavg1()
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      Sample(times(times.length / 2), times.head, load)
    }

    // Canary bracketing: one measurement BEFORE the timed pass and one
    // AFTER, worst median kept — load arriving mid-run is caught by the
    // closing sample. The canary runs through the same `measure` path
    // (reps, medians, cache clears) as a real query.
    def canary(): Double =
      try measure((s, _) => canaryQuery(s)).median catch { case _: Throwable => -1.0 }
    def bwCanary(): Double =
      try measure((s, _) => bandwidthCanaryQuery(s)).median catch { case _: Throwable => -1.0 }
    val canaryBefore = canary()
    val bwCanaryBefore = bwCanary()

    // Micro-canary checkpoints: one single-rep (cpu, bw) sample before
    // the pass, after every `checkpointEvery` queries, and after the last
    // — the intra-run timestamps the bracketing canaries can't provide
    // (round-8 blind spot). Window j = the queries measured between
    // checkpoints j and j+1.
    val checkpointEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CHECKPOINT_EVERY", "15").toInt
    require(checkpointEvery > 0,
      s"SPARK_GRAFT_BENCH_CHECKPOINT_EVERY must be positive, got $checkpointEvery " +
        "(0 divides the window index; negatives corrupt window attribution)")
    def microCheckpoint(): (Double, Double) = {
      def t(q: SparkSession => org.apache.spark.sql.DataFrame): Double =
        try {
          val t0 = System.nanoTime()
          q(spark).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      // MIN of two back-to-back samples per canary: a checkpoint fires
      // right after a real query, so a single sample can absorb that
      // query's trailing GC pause and read as contention (observed: one
      // 0.39 s cpu sample mid-run flagged 30 queries on an idle box
      // while every neighboring checkpoint sat at ~0.08 s). Sustained
      // external load inflates BOTH samples; a one-off pause inflates
      // one — min keeps the floor semantics and filters the pause.
      def min2(q: SparkSession => org.apache.spark.sql.DataFrame): Double = {
        val a = t(q); val b = t(q)
        if (a < 0 || b < 0) math.max(a, b) else math.min(a, b)
      }
      (min2(microCanaryQuery), min2(microBandwidthCanaryQuery))
    }
    val checkpoints = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    // the micro plans are NOT in the warm-up pass above (they are not
    // SparkEntry queries), so pay their codegen/JIT cost once untimed —
    // a cold first checkpoint read ~2.4× its steady state and would flag
    // window 0 on an idle box
    microCheckpoint()
    checkpoints += microCheckpoint()

    // Fail loudly: a failed query gets NO timing entry, and any failure
    // makes the whole bench exit non-zero — a broken build must never look
    // like a fast one (round-1 lesson). Each query reports the MEDIAN of
    // `reps` passes: single-pass timings swung the round-3 total 1.8× on
    // byte-identical code.
    var failures = List.empty[String]
    val sortedQueries = selected.toSeq.sortBy(_._1)
    val firstPass = sortedQueries.zipWithIndex.flatMap { case ((name, fn), i) =>
      val r =
        try Some((name, fn, measure(fn), i / checkpointEvery))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures ::= name
          None
        }
      if ((i + 1) % checkpointEvery == 0) checkpoints += microCheckpoint()
      r
    }
    if (sortedQueries.length % checkpointEvery != 0) checkpoints += microCheckpoint()

    // Committed pace reference (uniform-drift stamp + the r17 per-query
    // outlier guard both read it)
    val paceRef: Map[String, Double] = {
      val refPath = sys.env.getOrElse("SPARK_GRAFT_PACE_REF", "bench_logs/pace_reference.json")
      val f = new java.io.File(refPath)
      if (!f.isFile) Map.empty
      else try parseQueries(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      catch { case _: Throwable => Map.empty }
    }
    // r17 outlier guard: the within-run spread rule misses a sustained
    // interference window covering all reps of one query (the r16
    // wav_profiles miss); compare each first-pass median against the
    // committed reference when the run's own pace is sane
    val firstMedians = firstPass.map { case (name, _, s, _) => name -> s.median }.toMap
    val firstPace = uniformDrift(firstMedians, paceRef)._2
    val outliers = referenceOutliers(firstMedians, paceRef, firstPace)
    if (outliers.nonEmpty)
      System.err.println(
        f"[bench] reference outliers at sane pace ($firstPace%.3fx): " +
          s"${outliers.toSeq.sorted.mkString(", ")} — re-measuring")

    // Defense pass: a median 3× above the same query's fastest rep, or a
    // high loadavg at measurement time, is the signature of external load,
    // not a plan property — as is a median far above the committed pace
    // reference while the rest of the run paces clean (outlier guard).
    // Re-measure once; keep whichever run has the lower median, and flag
    // the query so the report is honest about it.
    val results = firstPass.map { case (name, fn, s0, window) =>
      val suspicious = (s0.min > 0 && s0.median > spreadCap * s0.min) ||
        ambient > loadCap || outliers(name)
      if (!suspicious) (name, s0, false, window)
      else {
        System.err.println(
          f"[bench] $name suspicious (median ${s0.median}%.2fs, min ${s0.min}%.2fs, load ${s0.load}%.2f) — re-measuring")
        val s1 = try measure(fn) catch { case _: Throwable => s0 }
        // if the RERUN timing is kept, it ran after the last checkpoint, so
        // the first-pass window no longer brackets it — mark the window
        // unknown (-1) instead of misattributing contamination
        if (s1.median < s0.median) (name, s1, true, -1)
        else (name, s0, true, window)
      }
    }

    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map { case (k, s, _, _) => "\"" + k + "\":" + fmt(s.median) }
      .mkString("{", ",", "}")
    val loads = results.map { case (k, s, _, _) => "\"" + k + "\":" + fmt(s.load) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, s, _, _) => "\"" + k + "\":" + fmt(s.min) }
      .mkString("{", ",", "}")
    val reruns = results.collect { case (k, _, true, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2.median).sum
    // windowed contamination: which query windows ran between hot
    // checkpoints (the per-window localization the run-level stamp lacks)
    val windowFlags = contaminatedWindows(
      checkpoints.toSeq.map(_._1), checkpoints.toSeq.map(_._2))
    val contaminatedQueries = results.collect {
      case (k, _, _, w) if windowFlags.lift(w).getOrElse(false) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val cpCpu = checkpoints.map(c => fmt(c._1)).mkString("[", ",", "]")
    val cpBw = checkpoints.map(c => fmt(c._2)).mkString("[", ",", "]")
    if (windowFlags.exists(identity))
      System.err.println(
        s"[bench] windowed contamination: ${windowFlags.count(identity)}/${windowFlags.length} " +
          "windows bracketed by hot micro-checkpoints — see contaminated_queries")
    val canaryAfter = canary()
    val bwCanaryAfter = bwCanary()
    val canarySec = math.max(canaryBefore, canaryAfter)
    val bwCanarySec = math.max(bwCanaryBefore, bwCanaryAfter)
    // any of the three probes stamps the run: CPU contention, memory-
    // bandwidth contention, and moderate multi-core ambient load each
    // contaminate differently and each slipped past the other two once
    val contaminated = isRunContaminated(canarySec, bwCanarySec, ambient)
    if (contaminated)
      System.err.println(
        f"[bench] CONTAMINATED: canary ${canarySec}%.3fs (floor ${CanaryFloorSec}%.3fs), " +
          f"bandwidth canary ${bwCanarySec}%.3fs (floor ${BandwidthCanaryFloorSec}%.3fs) " +
          f"(cap ${CanaryContaminationFactor}%.1fx), ambient load ${ambient}%.2f " +
          f"(cap ${AmbientLoadCap}%.1f) — per-query timings in this run are not evidence")
    // uniform machine-state drift vs the committed pace reference (only
    // meaningful on full runs — a subset's shared cohort is biased)
    val (uniformDriftStamp, paceRatio) =
      if (only.isDefined || paceRef.isEmpty) (false, -1.0)
      else uniformDrift(results.map { case (k, s, _, _) => k -> s.median }.toMap, paceRef)
    if (uniformDriftStamp)
      System.err.println(
        f"[bench] UNIFORM DRIFT: shared-cohort median ${paceRatio}%.3fx the committed " +
          f"pace reference (cap ${UniformDriftFactor}%.2fx) — the whole cohort moved " +
          "together, the machine-state signature; treat per-query timings as suspect")
    val fullJson = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"min":$mins,"load":$loads,"ambient_load":${fmt(ambient)},"ambient_load_cap":${fmt(AmbientLoadCap)},"canary_sec":${fmt(canarySec)},"canary_floor":${fmt(CanaryFloorSec)},"canary_bw_sec":${fmt(bwCanarySec)},"canary_bw_floor":${fmt(BandwidthCanaryFloorSec)},"contaminated":$contaminated,"uniform_drift":$uniformDriftStamp,"pace_vs_reference":${fmt(paceRatio)},"checkpoint_every":$checkpointEvery,"checkpoints_cpu":$cpCpu,"checkpoints_bw":$cpBw,"micro_floor_cpu":${fmt(MicroCanaryFloorSec)},"micro_floor_bw":${fmt(MicroBandwidthCanaryFloorSec)},"contaminated_queries":$contaminatedQueries,"rerun":$reruns,"outliers":${outliers.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"reps":$reps,"sf":"$sfDir","subset":${only.isDefined},"failed":${failures.size},"settle_sec":${fmt(settleSec)}}"""
    // Parse-proof delivery (ten rounds of `parsed: null` driver artifacts):
    // the full record goes to a FILE the driver/judge can always read, and
    // stdout gets EXACTLY ONE JSON line — the compact one, printed AFTER
    // spark.stop() so no shutdown logging can interleave mid-line. r10
    // printed the ~5 KB full line first and the compact line last; the
    // driver's tail window caught the full line's truncated back half, so
    // r11 drops the full line from stdout entirely — whatever the driver's
    // parser grabs (last line, first `{`, whole tail) it can only find the
    // one complete ≤2 KB object. The compact line's queries dict is
    // explicitly partial — the `queries_total` vs `queries_included` pair
    // and the `full` pointer say so (no silent caps); `value` is still the
    // ALL-queries total.
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "BENCH.json"))
      java.nio.file.Files.write(p, (fullJson + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] BENCH.json write failed: ${e.getMessage}") }
    val topQ = results.sortBy { case (_, s, _, _) => -s.median }.take(15)
    val compactJson = compactLine(
      total = total,
      topQueries = topQ.map { case (k, s, _, _) => k -> s.median },
      queriesTotal = results.size,
      sfDir = sfDir,
      contaminated = contaminated,
      uniformDrift = uniformDriftStamp,
      paceRatio = paceRatio,
      rerunNames = results.collect { case (k, _, true, _) => k },
      reps = reps,
      subset = only.isDefined,
      failed = failures.size,
      settleSec = settleSec,
      outlierCount = outliers.size)
    spark.stop()
    realOut.println(compactJson)
    realOut.flush()
    if (failures.nonEmpty) {
      System.err.println(s"[bench] ${failures.size} queries failed: ${failures.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
