package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset (builder-side fast
    // iteration; the driver always passes exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // Fail loudly: collect failures and exit non-zero after the dump — a
    // broken query must fail the gate, not silently skip its parquet. Each
    // failure also leaves `<outDir>/<name>/_FAILED` with the message, so
    // the correctness JSON can carry an explicit err row for the key
    // instead of omitting it (an absent key reads as progress in a diff).
    var failures = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        val failDir = Paths.get(outDir, name)
        // an analysis-time failure throws BEFORE overwrite clears prior
        // output — scrub the dir so stale parquet from an earlier run
        // can't sit next to the marker and read as current results
        if (Files.exists(failDir)) {
          import scala.jdk.CollectionConverters._
          Files.walk(failDir).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => Files.deleteIfExists(p))
        }
        Files.createDirectories(failDir)
        Files.writeString(failDir.resolve("_FAILED"),
          s"${e.getClass.getName}: ${e.getMessage}")
        failures ::= name
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries failed: ${failures.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
