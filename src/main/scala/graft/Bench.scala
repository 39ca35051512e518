package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The `noop` sink fully materializes every output
  * column (a bare .count() would let Catalyst prune the projections we're
  * trying to measure). One warm-up pass of the flagship query pays the
  * session/codegen startup cost outside the timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) — read as long, convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    // Fail loudly: a failed query gets NO timing entry, and any failure
    // makes the whole bench exit non-zero — a broken build must never look
    // like a fast one (round-1 lesson).
    //
    // Each query is timed over `reps` passes and reports the MEDIAN:
    // single-pass timings swung the round-3 total 1.8× on byte-identical
    // code, eating the whole 2×-of-baseline gate headroom with pure
    // machine-load noise. Cache is cleared before every pass so a
    // query-internal .persist() from pass N can't turn pass N+1 into a
    // cache scan (plan-equality substitution by the CacheManager).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    var failures = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Some(name -> times(times.length / 2))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failures ::= name
        None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failures.size}}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[bench] ${failures.size} queries failed: ${failures.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
