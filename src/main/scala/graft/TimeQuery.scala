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
