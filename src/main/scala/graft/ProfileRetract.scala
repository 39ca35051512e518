package graft

import org.apache.spark.sql.functions._

/** Temporary phase profiler for the store_retract cycle (VERDICT r15 #4). */
object ProfileRetract {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // per-job attribution: callsite + duration for every Spark job, so the
    // phase totals below decompose to the actions that spend them
    if (sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString("+") + ":" +
              j.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = starts.remove(j.jobId)
          if (v != null) println(
            f"[job] ${j.jobId}%4d ${(System.nanoTime() - v._1) / 1e9}%7.3f s  ${v._2}")
        }
      })
      s.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = {
          val top = qe.optimizedPlan.getClass.getSimpleName
          println(f"[exec] ${ns / 1e9}%7.3f s  $fn  $top")
        }
        override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val text = concat_ws(" ", (0 until 5).map(i =>
      md5(concat(col("doc_id").cast("string"), lit(s"-st$i")).cast("binary"))): _*)
    val docs = Tables.documents(s, d).select(col("doc_id"), text.as("text"))
    docs.write.format("noop").mode("overwrite").save() // warm
    for (rep <- 1 to 3) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-prof-retr"
      time("delete")(graft.sources.BatchStore.delete(s, Seq(path)))
      time("ingest-even")(graft.apps.CorpusPrep.runIncremental(s,
        docs.filter(col("doc_id") % 2 === 0), path, minTokens = 1))
      time("ingest-odd")(graft.apps.CorpusPrep.runIncremental(s,
        docs.filter(col("doc_id") % 2 === 1), path, minTokens = 1))
      time("retract")(graft.apps.CorpusPrep.retract(s, path,
        docs.filter(col("doc_id") % 5 === 2).select("doc_id")))
      val before = time("read+checkpoint")(
        graft.apps.CorpusPrep.readShards(s, path)
          .select(col("doc_id"), col("text")).withColumn("phase", lit(1))
          .localCheckpoint(true))
      time("compact")(graft.apps.CorpusPrep.compactStore(s, path))
      val after = graft.apps.CorpusPrep.readShards(s, path)
        .select(col("doc_id"), col("text")).withColumn("phase", lit(2))
      time("materialize")(
        before.union(after).select(col("phase"), col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save())
      println(s"[profile] --- rep $rep done ---")
    }
    s.stop()
  }
}
