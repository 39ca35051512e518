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
  *     own work flagged 83/91 queries on an idle box.
  */
object Bench {

  /** 1-minute load average, or -1 if unreadable (non-Linux). */
  private def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** median, min, and load sampled immediately before the reps ran. */
  private final case class Sample(median: Double, min: Double, load: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // AMBIENT load, sampled before Spark exists: the external-load gate
    // keys on this, not on mid-run samples — a 32-thread bench drives the
    // 1-min loadavg well past any fixed cap all by itself, so a mid-run
    // sample cannot distinguish "machine was busy" from "bench was
    // working" and would flag nearly every query (observed: 83/91 flagged
    // on an idle box). Per-query samples stay in the JSON for post-hoc
    // reads; the per-query contamination signal is the rep SPREAD, which
    // is internal evidence and immune to self-load.
    val ambient = loadavg1()
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // warm-up: one untimed pass of EVERY query so the timed pass measures
    // steady-state execution (codegen compiled, file/page caches hot, JIT
    // warmed) instead of first-touch noise — the numbers the 2×-of-baseline
    // gate should see. Failures here are ignored; the timed pass reports.
    SparkEntry.queries.foreach { case (_, fn) =>
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

    // Fail loudly: a failed query gets NO timing entry, and any failure
    // makes the whole bench exit non-zero — a broken build must never look
    // like a fast one (round-1 lesson). Each query reports the MEDIAN of
    // `reps` passes: single-pass timings swung the round-3 total 1.8× on
    // byte-identical code.
    var failures = List.empty[String]
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try Some((name, fn, measure(fn)))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failures ::= name
        None
      }
    }

    // Defense pass: a median 3× above the same query's fastest rep, or a
    // high loadavg at measurement time, is the signature of external load,
    // not a plan property. Re-measure once; keep whichever run has the
    // lower median, and flag the query so the report is honest about it.
    val results = firstPass.map { case (name, fn, s0) =>
      val suspicious = (s0.min > 0 && s0.median > spreadCap * s0.min) || ambient > loadCap
      if (!suspicious) (name, s0, false)
      else {
        System.err.println(
          f"[bench] $name suspicious (median ${s0.median}%.2fs, min ${s0.min}%.2fs, load ${s0.load}%.2f) — re-measuring")
        val s1 = try measure(fn) catch { case _: Throwable => s0 }
        (name, if (s1.median < s0.median) s1 else s0, true)
      }
    }

    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map { case (k, s, _) => "\"" + k + "\":" + fmt(s.median) }
      .mkString("{", ",", "}")
    val loads = results.map { case (k, s, _) => "\"" + k + "\":" + fmt(s.load) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, s, _) => "\"" + k + "\":" + fmt(s.min) }
      .mkString("{", ",", "}")
    val reruns = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2.median).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"min":$mins,"load":$loads,"ambient_load":${fmt(ambient)},"rerun":$reruns,"reps":$reps,"sf":"$sfDir","failed":${failures.size}}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[bench] ${failures.size} queries failed: ${failures.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
