package graft


/** Dev harness: time one named query (default 3 reps, cache cleared
  * between reps — [[Bench]]'s measurement discipline without the full
  * sweep). `runMain graft.TimeQuery <query> [reps]`; sf dir from
  * SPARK_GRAFT_SF_DIR. For single-query plan iteration; the recorded
  * numbers of note stay [[Bench]]'s. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: TimeQuery <queryName> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // dev-only conf overrides for A/B plan experiments:
    //   SPARK_GRAFT_SET="key=value;key=value"
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    // opt-in per-job timing (same knob as ProfileRetract): job wall time,
    // stage names and task counts, so a slow query decomposes from the log
    if (sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            j.stageInfos.map(s => s.name.takeWhile(_ != '(') + "x" + s.numTasks)
              .mkString("+")))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = starts.remove(j.jobId)
          if (v != null) println(
            f"[job] ${j.jobId}%4d ${(System.nanoTime() - v._1) / 1e9}%7.3f s  ${v._2}")
        }
      })
    }
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
