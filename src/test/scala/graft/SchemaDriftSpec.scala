package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the event-time load boundary against fixture regeneration.
  *
  * Round 6 lesson: the driver regenerated `events.parquet` and the physical
  * `ts` type silently flipped from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * with no timezone — Spark read TIMESTAMP_NTZ, `unix_micros` in
  * `t7_sliding_count` threw DATATYPE_MISMATCH, and `withWatermark` in the
  * T4/T5/T6 topologies threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE, all
  * while every other query stayed green. This suite writes the events
  * fixture in all three vintages the driver has ever shipped and asserts
  * every `Tables.events` consumer analyzes AND runs over each — so the
  * next re-gen breaks HERE, loudly, not in the round's correctness gate.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events rows shared by all vintages (µs-precision instants, UTC). */
  private def baseEvents = {
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    (1L to 400L).map { i =>
      (i, java.sql.Timestamp.from(base.plusMillis(i * 750)), i % 7,
       // include purchase+click so the asof consumer has facts AND dims
       if (i % 3 == 0) "click" else if (i % 3 == 1) "purchase" else "view",
       (i % 50) / 10.0, s"""{"k":$i}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Build a full sf-dir whose events.parquet has the given ts vintage;
    * other tables are symlinked from the real sf0.001 fixtures so joins
    * (asof_attribution needs orders) still resolve. */
  private def vintageDir(name: String)(writeEvents: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-drift-$name")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(TestSpark.Sf0001, s"$t.parquet"))
    }
    // Spark writes a directory; the loaders read `$dir/events.parquet`
    // as a path glob, so a directory of part-files works the same.
    writeEvents(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private lazy val vintages: Map[String, String] = Map(
    // today's fixtures: parquet µs, no timezone → Spark reads TIMESTAMP_NTZ
    "ntz" -> vintageDir("ntz") { path =>
      baseEvents.withColumn("ts", col("ts").cast(TimestampNTZType))
        .write.mode("overwrite").parquet(path)
    },
    // rounds 1-5 fixtures: TIMESTAMP(NANOS), read as raw Long under
    // spark.sql.legacy.parquet.nanosAsLong — model it as a LongType col
    "nanos-long" -> vintageDir("nanos") { path =>
      baseEvents.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        .write.mode("overwrite").parquet(path)
    },
    // the type everything downstream expects: plain TIMESTAMP (ltz)
    "ltz" -> vintageDir("ltz") { path =>
      baseEvents.write.mode("overwrite").parquet(path)
    })

  test("normalizeEventTime yields TIMESTAMP for every vintage, same instants") {
    val instants = vintages.map { case (v, dir) =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"vintage $v: expected TimestampType, got ${ev.schema("ts").dataType}")
      v -> ev.orderBy("event_id").select(unix_micros(col("ts")))
        .as[Long].collect().toSeq
    }
    // all three vintages decode to the identical µs instants
    assert(instants.values.toSet.size == 1,
      "vintages disagree on decoded instants")
  }

  // every batch consumer of Tables.events must analyze and run per vintage
  private val eventConsumers = Seq(
    "t4_tumbling_count_user", "t5_tumbling_count_type", "t6_windowed_fraud",
    "t7_sliding_count", "ts_parse_chain", "asof_attribution")

  for (v <- Seq("ntz", "nanos-long", "ltz"); q <- eventConsumers)
    test(s"$q runs over $v events fixture") {
      val rows = SparkEntry.queries(q)(spark, vintages(v)).count()
      assert(rows > 0, s"$q returned no rows on $v fixture")
    }

  for (v <- Seq("ntz", "nanos-long", "ltz"); t <- Seq("t4", "t5", "t6"))
    test(s"topology $t watermark analyzes over $v events fixture") {
      // building the topology resolves withWatermark against the stream's
      // eventTime column — the exact analysis that failed in round 6
      val (out, _) = graft.apps.Topologies.build(t, spark, vintages(v))
      assert(out.isStreaming)
      assert(out.queryExecution.analyzed != null)
    }

  test("documents drift: int32 doc ids — okey-packing operators agree with the int64 run") {
    // the other plausible re-gen drift (pandas downcasting ids to int32):
    // shiftleft on an INT column masks the shift count to 5 bits, so
    // shiftleft(intCol, 32) is the IDENTITY and packed (doc_id, pos) keys
    // silently collide — the third-review fix casts to LONG first; this
    // pins the whole id-width class across the packing-keyed operators
    val rows = Seq(
      (1, "alpha beta\nshared line\ngamma"),
      (2, "shared line\ndelta"),
      (3, "delta\nshared line"))
    val ints = rows.toDF("doc_id", "text")
    val longs = rows.map { case (i, t) => (i.toLong, t) }.toDF("doc_id", "text")
    def lineRun(df: org.apache.spark.sql.DataFrame) =
      operators.Dedup.lineDedup(df)
        .select(col("doc_id").cast("long"), col("n_lines"), col("n_kept"), col("text_clean"))
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(lineRun(ints) == lineRun(longs))
    def spanRun(df: org.apache.spark.sql.DataFrame) =
      operators.Dedup.removeDuplicatedSpans(df.withColumn("text",
          regexp_replace(col("text"), "\n", " ")), n = 2)
        .select(col("doc_id").cast("long"), col("n_kept"), col("text_clean"))
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(spanRun(ints) == spanRun(longs))
    operators.Dedup.releaseCaches(spark)
  }
}
