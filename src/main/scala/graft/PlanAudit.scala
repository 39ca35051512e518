package graft


/** Plan-audit main: dumps `explain("formatted")` for every SparkEntry query
  * (or the subset named in args) so scan pushdown, join strategies, and
  * exchange placement can be reviewed per change — the "is this the plan
  * I'd want at 100 TB" loop. Usage:
  *   sbt "runMain graft.PlanAudit [queryName ...]"
  * Reads SPARK_GRAFT_SF_DIR (default sf0.01 — plans don't need volume).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    wanted.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[audit] unknown query: $name")
        case Some(fn) =>
          println(s"\n========== $name ==========")
          fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
