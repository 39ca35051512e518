package graft.apps

import graft.Tables
import graft.codec.JsonCodec
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Runnable streaming topologies T1–T10 ≙ the reference's ten `main()`
  * apps (SURVEY §0 inventory) — each wires source → transforms → output
  * as ONE streaming pipeline over the record envelope.
  *
  * Source: a parquet *file stream* over the testdata tables stands in for
  * the topic subscription (same envelope [[graft.sources.Sources]]
  * produces from Kafka; swap `recordsFrom*` for `Sources.kafkaStream`
  * + a broker and nothing downstream changes). [[AppMain]] attaches the
  * console sink (≙ the reference's `foreach(println)`) and drains.
  */
object Topologies {

  /** All topology names, in reference order. */
  val names: Seq[String] =
    Seq("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8", "t9", "t10")

  /** Build topology `name` over the testdata at `dir`: returns the
    * streaming output DataFrame and the output mode its sink needs. */
  def build(name: String, spark: SparkSession, dir: String): (DataFrame, OutputMode) = {
    import spark.implicits._
    name match {
      // T1 ≙ basics/WordCountApp.java:62-64 — uppercase every value
      case "t1" =>
        (eventRecords(spark, dir).withColumn("value", upper(col("value"))),
          OutputMode.Append())

      // T2 ≙ consumers/OrderStreamConsumer.java:33-45 — typed JSON scan
      case "t2" =>
        (orderRecords(spark, dir)
          .withColumn("v", JsonCodec.parseOrder(col("value")))
          .select(col("key"), col("v.*"), col("eventTime")),
          OutputMode.Append())

      // T3 ≙ state_store/ProductCountApp.java:92-140 — re-key by customer,
      // drop null keys, running count (update-mode changelog)
      case "t3" =>
        (StreamOps.runningCount(orderRecords(spark, dir)), OutputMode.Update())

      // T4/T5 ≙ windows/tumbling/{OrderCountTumblingWindow,StreamsOrderCount}
      // — 1-minute tumbling counts (T4 keys by user, T5 by event type)
      case "t4" =>
        (StreamOps.tumblingCount(eventRecords(spark, dir), "1 minute"), OutputMode.Update())
      case "t5" =>
        (StreamOps.tumblingCount(
          eventRecords(spark, dir).withColumn("key", col("event_type")), "1 minute"),
          OutputMode.Update())

      // T6 ≙ windows/tumbling/FraudDetectionApp.java:38-57 — threshold alert
      case "t6" =>
        (StreamOps.windowedFraudAlerts(eventRecords(spark, dir), "1 minute", threshold = 3L),
          OutputMode.Update())

      // T7 ≙ windows/sliding_windows/CreditCardTransactions.java:117-141 —
      // Kafka-semantics sliding-window count (custom stateful operator)
      case "t7" =>
        implicit val s: SparkSession = spark
        (StreamOps.slidingCount(
          eventRecords(spark, dir).select($"key", $"eventTime").as[StreamOps.SlidingEvent],
          5 * 60 * 1000L).toDF(), OutputMode.Update())

      // T8 ≙ joins/stream_stream/StreamStreamJoinExample.java:107-123 —
      // windowed stream-stream inner join orders ⋈ lineitems (±5 days of
      // testdata time stand in for the reference's ±5 minutes)
      case "t8" =>
        val orders = orderRecords(spark, dir)
          .select(col("key"), col("value"), col("eventTime"))
        val items = streamTable(spark, dir, "lineitem")
          .select(col("l_orderkey").cast("string").as("key"),
            col("l_extendedprice").cast("string").as("value"),
            // NTZ→LTZ (session TZ = UTC): watermarks require TIMESTAMP
            col("l_shipdate").cast("timestamp").as("eventTime"))
        (StreamOps.streamStreamJoin(orders, items, withinMinutes = 5 * 24 * 60),
          OutputMode.Append())

      // T9 ≙ joins/stream_ktable/StreamTableJoinExample.java:50-172 —
      // enrichment join + nested EnrichedOrder JSON back out
      case "t9" =>
        val orders = orderRecords(spark, dir)
          .withColumn("customer_key", col("key"))
        val dim = Tables.customer(spark, dir)
          .select(col("c_custkey").cast("string").as("customer_key"),
            col("c_name"), col("c_mktsegment"))
        (StreamOps.streamTableJoin(orders, dim, "customer_key")
          .select(col("customer_key").as("key"),
            JsonCodec.enrichedOrderJson(
              JsonCodec.parseOrder(col("value")),
              struct(col("customer_key").as("customerId"), col("c_name").as("name"),
                col("c_mktsegment").as("email"))).as("value")),
          OutputMode.Append())

      // T10 ≙ processor/FraudDetectionApp.java + FraudProcessor.java —
      // custom stateful fraud detector over the typed order stream
      case "t10" =>
        implicit val s: SparkSession = spark
        (StreamOps.fraudDetector(
          streamTable(spark, dir, "orders").select(
            col("o_custkey").cast("string").as("key"),
            col("o_orderkey").as("orderKey"),
            col("o_totalprice").cast("string").as("totalAmount"),
            col("o_orderdate").as("eventTime")).as[StreamOps.FraudInput],
          minAmount = 500.0, countThreshold = 3L).toDF(), OutputMode.Append())

      case other =>
        throw new IllegalArgumentException(
          s"unknown topology '$other' (expected one of ${names.mkString(", ")})")
    }
  }

  /** Parquet file stream over a testdata table (schema from a batch peek;
    * at scale this is a partitioned lake directory and new files stream in
    * as they land). The file source requires a DIRECTORY; testdata ships
    * single files, so each is exposed through a per-table temp directory
    * holding a symlink — a deployment streams the real partitioned dir. */
  private def streamTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    // absolute target (a relative sfDir would dangle the symlink, which
    // resolves against the link's directory); temp dir keyed by the
    // sanitized path PLUS an md5 of the exact path — sanitization alone is
    // many-to-one ("/a/b+c" and "/a/b_c" would collide and alias datasets)
    val target = java.nio.file.Paths.get(s"$dir/$table.parquet").toAbsolutePath.normalize()
    val parent = target.getParent.toString
    val key = parent.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      java.security.MessageDigest.getInstance("MD5").digest(parent.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-streams", key, table)
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve(s"$table.parquet")
    // recreate rather than reuse: Files.exists follows symlinks, so a
    // dangling link from a deleted dataset would otherwise crash creation
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(link, target)
    graft.sources.Sources.parquetStream(spark, streamDir.toString,
      spark.read.parquet(target.toString).schema)
  }

  /** Record envelope over `events`: key = user, value = props JSON,
    * eventTime = ts (with the TIMESTAMP(NANOS)→µs conversion
    * [[graft.Tables.events]] documents). */
  private def eventRecords(spark: SparkSession, dir: String): DataFrame = {
    val withTs = Tables.nanosLongToMicros(streamTable(spark, dir, "events"), "ts")
    withTs.select(
      col("user_id").cast("string").as("key"),
      col("props").as("value"),
      col("ts").as("eventTime"),
      col("event_type"))
  }

  /** Record envelope over `orders`: key = customer, value = Order JSON
    * (built with the codec's Order shape), eventTime = order date. */
  private def orderRecords(spark: SparkSession, dir: String): DataFrame =
    streamTable(spark, dir, "orders").select(
      col("o_custkey").cast("string").as("key"),
      to_json(struct(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice").cast("string").as("total_amount"))).as("value"),
      // NTZ→LTZ (session TZ = UTC): watermarks require TIMESTAMP
      col("o_orderdate").cast("timestamp").as("eventTime"))
}

/** Runnable entry point: `runMain graft.apps.AppMain t9 [sfDir]` builds
  * the topology, attaches the console sink (≙ `foreach(println)`), drains
  * all currently-available input, and stops — the sandbox analog of
  * `streams.start()` + shutdown hook. */
object AppMain {
  def main(args: Array[String]): Unit = {
    val topology = args.headOption.getOrElse("t1")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local()
    val (out, mode) = Topologies.build(topology, spark, sfDir)
    val q = out.writeStream.outputMode(mode)
      .format("console").option("numRows", 20).option("truncate", true)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }
}
