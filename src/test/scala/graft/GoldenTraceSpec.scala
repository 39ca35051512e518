package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming tests pinned to the golden traces embedded in the
  * reference's comments (FIXTURES.md §A.3) — the only executable examples
  * the reference ships. Each runs a real Structured Streaming query over a
  * MemoryStream and asserts FINAL state (never emission cadence, SURVEY
  * §2.7).
  */
class GoldenTraceSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** transformWithState needs the RocksDB provider (multi-column-family
    * state) — set for the block, restore after. */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Run a streaming DF to a memory sink until input is drained; return the
    * final table. */
  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("T4/T5 golden: tumbling 1-min counts (StreamsOrderCount.java:16-31)") {
    // events for key 101 @10:00:05, 10:00:25, 10:01:15 → [10:00,10:01)=2, [10:01,10:02)=1
    val in = MemoryStream[(String, java.sql.Timestamp)]
    in.addData(
      ("101", ts("2025-01-01 10:00:05")),
      ("101", ts("2025-01-01 10:00:25")),
      ("101", ts("2025-01-01 10:01:15")))
    val stream = in.toDF().toDF("key", "eventTime")
    val got = runToMemory(
      StreamOps.tumblingCount(stream, "1 minute"), "golden_tumbling", OutputMode.Update())
      .select($"window_start".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(got == Map(
      "2025-01-01 10:00:00" -> 2L,
      "2025-01-01 10:01:00" -> 1L))
  }

  test("tumbling count in APPEND mode ≙ Kafka Streams suppress(untilWindowCloses): final counts only, only after the watermark closes the window") {
    // Update mode (the T4/T5 golden) is the eager KTable changelog; the
    // SAME topology in Append mode is the suppress() surface — nothing
    // emits while a window can still grow, and the one emitted row per
    // window carries the FINAL count. Beyond reference scope (no
    // suppress in the repo) but part of the Kafka Streams windowed DSL.
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamOps.tumblingCount(in.toDF().toDF("key", "eventTime"), "1 minute")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("golden_suppress").start()
    in.addData(
      ("101", ts("2025-01-01 10:00:05")),
      ("101", ts("2025-01-01 10:00:25")))
    q.processAllAvailable()
    // watermark (grace 0) sits at 10:00:25 — the [10:00,10:01) window is
    // still open, so suppress semantics demand silence
    assert(spark.table("golden_suppress").isEmpty)
    in.addData(("101", ts("2025-01-01 10:01:15")))
    q.processAllAvailable() // watermark → 10:01:15 closes [10:00,10:01)
    val afterClose = spark.table("golden_suppress")
      .select($"window_start".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(afterClose == Map("2025-01-01 10:00:00" -> 2L))
    q.stop()
  }

  test("attributeReport composes onto a stream unchanged — the Dolma tagger family is stateless") {
    // every signal in the sidecar is a zero-shuffle projection, so the
    // SAME operator runs in a streaming query with no watermark, no
    // state, append mode — the online ingest-tagging shape
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "the cat sat on the mat and the dog sat too."),
      (2L, "zz zz zz"))
    val got = runToMemory(
      graft.operators.TextAnalysis.attributeReport(in.toDF().toDF("doc_id", "text")),
      "golden_attr", OutputMode.Append())
      .select($"doc_id", $"pred_lang", $"n_badwords").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> (("en", 0L)), 2L -> (("und", 0L))))
  }

  test("gopherRepetitionFilter composes onto a stream unchanged — the repetition gate is stateless") {
    // one native projection per doc, no state: the 13-signal gate runs
    // as an online ingest filter in append mode, like the Dolma sidecar
    val in = MemoryStream[(Long, String)]
    in.addData(
      // long enough that no single gram's characters clear the 16-20%
      // fractions (the thresholds presume web-document lengths — a short
      // clean sentence legitimately fails top_2_gram_char_frac)
      (1L, (1 to 40).map(i => s"word$i").mkString(" ")),
      (2L, "spam ham spam ham spam ham spam ham spam ham spam ham")) // top-2-gram saturated
    val got = runToMemory(
      graft.operators.TextAnalysis.gopherRepetitionFilter(in.toDF().toDF("doc_id", "text")),
      "golden_gopher_rep", OutputMode.Append())
      .select($"doc_id", $"keep").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 0L))
  }

  test("T6 golden: 1-minute tumbling fraud threshold alerts exactly on windows with count > 3 (windows/tumbling/FraudDetectionApp.java:38-57)") {
    val in = MemoryStream[(String, java.sql.Timestamp)]
    // card 9: 4 txns inside [10:00,10:01) → alert; 2 txns in [10:01,10:02) → none
    // card 5: 3 txns inside [10:00,10:01) → exactly at threshold, no alert
    in.addData(
      ("9", ts("2025-01-01 10:00:05")), ("9", ts("2025-01-01 10:00:15")),
      ("9", ts("2025-01-01 10:00:35")), ("9", ts("2025-01-01 10:00:55")),
      ("9", ts("2025-01-01 10:01:10")), ("9", ts("2025-01-01 10:01:20")),
      ("5", ts("2025-01-01 10:00:10")), ("5", ts("2025-01-01 10:00:20")),
      ("5", ts("2025-01-01 10:00:30")))
    val alerts = StreamOps.windowedFraudAlerts(
      in.toDF().toDF("key", "eventTime"), "1 minute", threshold = 3L)
    val got = runToMemory(alerts, "golden_t6", OutputMode.Update())
      .groupBy($"window_start".cast("string").as("w"), $"key")
      .agg(max($"cnt").as("cnt")) // final state per (window, key)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("2025-01-01 10:00:00", "9", 4L)))
  }

  test("T3 golden: running count in update mode, final state per key (ProductCountApp.java:150-152)") {
    val in = MemoryStream[(String, String)]
    val stream = in.toDF().toDF("key", "value")
      .withColumn("eventTime", lit(ts("2025-01-01 00:00:00")))
    val q = StreamOps.runningCount(stream)
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("golden_running").start()
    in.addData(("3", "o1"), ("3", "o2"), ("7", "o3"))
    q.processAllAvailable()
    in.addData(("3", "o4")) // second batch updates key 3
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each changed row; final state = last per key
    val got = spark.table("golden_running")
      .groupBy($"key").agg(max($"cnt").as("cnt"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("3" -> 3L, "7" -> 1L))
  }

  test("domain rollup as a live KTable: flagged flips once streamed evidence crosses the doc threshold") {
    // domainQuality is a plain unwindowed aggregate, so it runs unchanged
    // as an update-mode streaming rollup (the KTable changelog shape) —
    // the crawl-monitoring deployment: verdicts sharpen as batches land
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDF().toDF("doc_id", "url", "text")
    val q = graft.operators.TextAnalysis.domainQuality(stream)
      .writeStream.outputMode(OutputMode.Update()).format("memory")
      .queryName("golden_domain").start()
    try {
      // two gate-failing pages: too little evidence to flag (n_docs < 3)
      in.addData((1L, "https://aaa.example.com/x", "a b"),
        (2L, "https://www.aaa.example.com/y", "a b"))
      q.processAllAvailable()
      val mid = spark.table("golden_domain")
        .groupBy($"domain").agg(max($"n_docs").as("n"), max($"flagged").as("f"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap.apply("aaa.example.com")
      assert(mid == ((2L, 0L)))
      // the third failing page crosses minDocs — the update flips the flag
      in.addData((3L, "HTTP://aaa.example.com:443/z", "a b"))
      q.processAllAvailable()
      val fin = spark.table("golden_domain")
        .groupBy($"domain").agg(max($"n_docs").as("n"), max($"flagged").as("f"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap.apply("aaa.example.com")
      assert(fin == ((3L, 1L)))
    } finally q.stop()
  }

  test("T7 golden: Kafka-semantics sliding window counts (CreditCardTransactions.java:13-59)") {
    // E1@12:01 E2@12:03 E3@12:05 E4@12:07, size 5 min →
    // [12:01,12:06)={E1,E2,E3}=3, [12:03,12:08)={E2,E3,E4}=3, [12:05,12:10)=2, [12:07,12:12)=1
    val in = MemoryStream[StreamOps.SlidingEvent]
    in.addData(
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:01:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:03:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:05:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:07:00")))
    val got = runToMemory(
      StreamOps.slidingCount(in.toDS(), 5 * 60 * 1000L).toDF(), "golden_sliding", OutputMode.Update())
      .groupBy($"windowStart").agg(max($"cnt").as("cnt")) // final state per anchor
      .select($"windowStart".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(got == Map(
      "2025-01-01 12:01:00" -> 3L,
      "2025-01-01 12:03:00" -> 3L,
      "2025-01-01 12:05:00" -> 2L,
      "2025-01-01 12:07:00" -> 1L))
  }

  test("T7 incremental: late-batch event updates earlier anchors") {
    val in = MemoryStream[StreamOps.SlidingEvent]
    val q = StreamOps.slidingCount(in.toDS(), 5 * 60 * 1000L).toDF()
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("golden_sliding2").start()
    in.addData(StreamOps.SlidingEvent("c", ts("2025-01-01 12:01:00")))
    q.processAllAvailable()
    in.addData(StreamOps.SlidingEvent("c", ts("2025-01-01 12:04:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("golden_sliding2")
      .groupBy($"windowStart").agg(max($"cnt").as("cnt"))
      .select($"windowStart".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    // the 12:04 arrival must bump the 12:01 anchor to 2
    assert(got == Map("2025-01-01 12:01:00" -> 2L, "2025-01-01 12:04:00" -> 1L))
  }

  test("T7 late events older than the eviction horizon are dropped, not undercounted") {
    val in = MemoryStream[StreamOps.SlidingEvent]
    val q = StreamOps.slidingCount(in.toDS(), 5 * 60 * 1000L).toDF()
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("golden_sliding3").start()
    in.addData(
      StreamOps.SlidingEvent("c", ts("2025-01-01 12:10:00")),
      StreamOps.SlidingEvent("c", ts("2025-01-01 12:16:00"))) // horizon → 12:11; 12:10 evicted
    q.processAllAvailable()
    in.addData(StreamOps.SlidingEvent("c", ts("2025-01-01 12:08:00"))) // late: before horizon
    q.processAllAvailable()
    q.stop()
    val got = spark.table("golden_sliding3")
      .select($"windowStart".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    // the late 12:08 anchor must NOT appear (counting it against the pruned
    // buffer would claim cnt=1 when the true window held the evicted 12:10)
    assert(!got.contains("2025-01-01 12:08:00"))
    assert(got == Map("2025-01-01 12:10:00" -> 1L, "2025-01-01 12:16:00" -> 1L))
  }

  test("T7 via transformWithState on RocksDB: same golden counts incl. late-batch update") { withRocksDb {
    val in = MemoryStream[StreamOps.SlidingEvent]
    val q = StreamOps.slidingCountTws(in.toDS(), 5 * 60 * 1000L).toDF()
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("golden_sliding_tws").start()
    in.addData(
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:01:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:03:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:05:00")),
      StreamOps.SlidingEvent("card1", ts("2025-01-01 12:07:00")))
    q.processAllAvailable()
    // second batch: the 12:04 arrival must bump the earlier anchors
    in.addData(StreamOps.SlidingEvent("card1", ts("2025-01-01 12:04:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("golden_sliding_tws")
      .groupBy($"windowStart").agg(max($"cnt").as("cnt"))
      .select($"windowStart".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    assert(got == Map( // same trace as the flatMapGroupsWithState goldens
      "2025-01-01 12:01:00" -> 3L, // batch 1; evicted (horizon 12:02) before the 12:04 arrival
      "2025-01-01 12:03:00" -> 4L, // bumped by 12:04: {12:03,12:04,12:05,12:07}
      "2025-01-01 12:04:00" -> 3L, // {12:04,12:05,12:07}
      "2025-01-01 12:05:00" -> 2L, // {12:05,12:07}, not dirty in batch 2
      "2025-01-01 12:07:00" -> 1L))
  }}

  test("T7 dense key: 20k events inside one window span process in linear time with exact counts") {
    // all events share one key and fit inside a single 5-min window span
    // (20k × 10 ms = 200 s), so every anchor is dirty every batch — the
    // adversarial shape for the old O(dirty × buffer) recount (~8×10⁸
    // comparisons here); the monotone-pointer sweep does one linear pass
    val in = MemoryStream[StreamOps.SlidingEvent]
    val base = ts("2025-01-01 12:00:00").getTime
    val q = StreamOps.slidingCount(in.toDS(), 5 * 60 * 1000L).toDF()
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("golden_dense").start()
    q.processAllAvailable() // pay query-start cost outside the timing
    in.addData((0 until 20000).map(i =>
      StreamOps.SlidingEvent("hot", new java.sql.Timestamp(base + i * 10L))): _*)
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val got = spark.table("golden_dense")
      .select($"windowStart", $"cnt").as[(java.sql.Timestamp, Long)].collect().toMap
    // anchor i's window [t_i, t_i+5min) covers every later event: cnt = 20000 − i
    assert(got.size == 20000)
    (0 until 20000 by 997).foreach { i =>
      assert(got(new java.sql.Timestamp(base + i * 10L)) == (20000 - i).toLong)
    }
    assert(secs < 5.0, f"dense-key batch took $secs%.1f s — the recount has gone quadratic again")
  }

  test("T8 golden: stream-stream join matches within ±5 min, drops unmatched (StreamStreamJoinExample.java:48-78,163-168)") {
    val orders = MemoryStream[(String, String, java.sql.Timestamp)]
    val payments = MemoryStream[(String, String, java.sql.Timestamp)]
    // order 120 has a payment 2 min later; order 100 never gets a payment
    orders.addData(
      ("120", """{"orderId":120,"customerId":1}""", ts("2025-01-01 10:00:00")),
      ("100", """{"orderId":100,"customerId":2}""", ts("2025-01-01 10:00:00")))
    payments.addData(("120", """{"orderId":120,"amount":100.0}""", ts("2025-01-01 10:02:00")))
    val joined = StreamOps.streamStreamJoin(
      orders.toDF().toDF("key", "value", "eventTime"),
      payments.toDF().toDF("key", "value", "eventTime"),
      withinMinutes = 5)
    val got = runToMemory(joined, "golden_ssj", OutputMode.Append())
      .select($"key").as[String].collect().toSeq
    assert(got == Seq("120")) // no output row for key 100, ever
  }

  test("T8 left-outer golden: unmatched order emits null-padded only after the watermark closes its window (KStream#leftJoin grace semantics)") {
    val orders = MemoryStream[(String, String, java.sql.Timestamp)]
    val payments = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = StreamOps.streamStreamJoin(
      orders.toDF().toDF("key", "value", "eventTime"),
      payments.toDF().toDF("key", "value", "eventTime"),
      withinMinutes = 5, joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("golden_ssj_left").start()
    try {
      orders.addData(
        ("120", """{"orderId":120,"customerId":1}""", ts("2025-01-01 10:00:00")),
        ("100", """{"orderId":100,"customerId":2}""", ts("2025-01-01 10:00:00")))
      payments.addData(("120", """{"orderId":120,"amount":100.0}""", ts("2025-01-01 10:02:00")))
      q.processAllAvailable()
      // the match emits eagerly; the null row for 100 must NOT — a payment
      // could still arrive until the watermark passes its window
      val eager = spark.table("golden_ssj_left")
        .select($"key").as[String].collect().toSeq
      assert(eager == Seq("120"), s"premature outer emission: $eager")
      // watermark riders on both streams push the global (min) watermark
      // past 10:05; the next batch flushes 100's evicted state as a null row
      orders.addData(("900", "{}", ts("2025-01-01 11:00:00")))
      payments.addData(("901", "{}", ts("2025-01-01 11:00:00")))
      q.processAllAvailable()
      val got = spark.table("golden_ssj_left")
        .select($"key", $"r_value").as[(String, String)].collect().toSet
      assert(got == Set(
        ("120", """{"orderId":120,"amount":100.0}"""),
        ("100", null)), s"got $got")
    } finally q.stop()
  }

  test("T10 golden: fraud processor alerts on every qualifying order past 3 (FraudProcessor.java:41-63)") {
    val in = MemoryStream[StreamOps.FraudInput]
    val base = ts("2025-01-01 00:00:00").getTime
    def order(k: String, i: Long, amount: String) =
      StreamOps.FraudInput(k, i, amount, new java.sql.Timestamp(base + i * 1000))
    in.addData(
      order("7", 1, "800.00"), order("7", 2, "900.00"),
      order("7", 3, "100.00"),           // below 500 → skipped entirely
      order("7", 4, "not-a-number"),     // unparseable → dropped (documented divergence)
      order("7", 5, "750.00"), order("7", 6, "600.00"),
      order("7", 7, "950.00"),           // 5th qualifying → alert (count=5)
      order("8", 8, "9999.99"))          // other customer: only 1 qualifying → no alert
    val got = runToMemory(
      StreamOps.fraudDetector(in.toDS(), minAmount = 500.0, countThreshold = 3L).toDF(),
      "golden_fraud", OutputMode.Append())
      .as[StreamOps.Alert].collect().sortBy(_.orderKey)
    assert(got.map(_.orderKey).toSeq == Seq(6L, 7L)) // 4th and 5th qualifying orders
    assert(got.head.alert == "Fraud alert! Customer 7 placed 4 high-value orders.")
    assert(got.last.runningCount == 5L)
  }

  test("T10 via transformWithState on RocksDB: same golden alerts as flatMapGroupsWithState (FraudProcessor.java:41-63)") {
    // transformWithState requires the RocksDB provider — which is also the
    // at-scale provider the reference's RocksDB stores map to (SURVEY §2.6)
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamOps.FraudInput]
      val base = ts("2025-01-01 00:00:00").getTime
      def order(k: String, i: Long, amount: String) =
        StreamOps.FraudInput(k, i, amount, new java.sql.Timestamp(base + i * 1000))
      val q = StreamOps.fraudDetectorTws(in.toDS(), minAmount = 500.0, countThreshold = 3L).toDF()
        .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("golden_tws").start()
      in.addData(
        order("7", 1, "800.00"), order("7", 2, "900.00"),
        order("7", 3, "100.00"), order("7", 4, "not-a-number"),
        order("7", 5, "750.00"), order("7", 6, "600.00"))
      q.processAllAvailable()
      in.addData(order("7", 7, "950.00"), order("8", 8, "9999.99")) // state crosses batches
      q.processAllAvailable()
      q.stop()
      val got = spark.table("golden_tws").as[StreamOps.Alert].collect().sortBy(_.orderKey)
      assert(got.map(_.orderKey).toSeq == Seq(6L, 7L))
      assert(got.head.alert == "Fraud alert! Customer 7 placed 4 high-value orders.")
      assert(got.last.runningCount == 5L)
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("session windows merge within the gap and split at it, across micro-batches") {
    // session windows emit in APPEND mode only: a session emits exactly
    // once, when the watermark passes its end
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamOps.sessionCount(in.toDF().toDF("key", "eventTime"), "30 seconds")
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("golden_session").start()
    in.addData(("u", ts("2025-01-01 10:00:00")), ("u", ts("2025-01-01 10:00:20")))
    q.processAllAvailable()
    // batch 2: 10:00:40 extends the open session (gap 20s < 30s);
    // 10:02:00 is ≥30s after 10:01:10 (session end) → a new session
    in.addData(("u", ts("2025-01-01 10:00:40")), ("u", ts("2025-01-01 10:02:00")))
    q.processAllAvailable()
    // flush: advance the watermark past both sessions' ends so they emit
    in.addData(("u", ts("2025-01-01 10:10:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("golden_session")
      .select($"session_start".cast("string"), $"session_end".cast("string"), $"cnt")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("2025-01-01 10:00:00", "2025-01-01 10:01:10", 3L), // merged across batches; end = last + gap
      ("2025-01-01 10:02:00", "2025-01-01 10:02:30", 1L)))
  }

  test("hopping-window count: aligned approximation covers each event size/slide times") {
    val in = MemoryStream[(String, java.sql.Timestamp)]
    in.addData(("c", ts("2025-01-01 12:01:30")), ("c", ts("2025-01-01 12:04:30")))
    val got = runToMemory(
      StreamOps.hoppingCount(in.toDF().toDF("key", "eventTime"), "5 minutes", "1 minute"),
      "golden_hopping", OutputMode.Update())
      .select($"window_start".cast("string"), $"cnt").as[(String, Long)].collect().toMap
    // event@12:01:30 belongs to hops starting 11:57..12:01; event@12:04:30 to 12:00..12:04
    assert(got("2025-01-01 12:00:00") == 2L)  // hops 12:00 and 12:01 see both
    assert(got("2025-01-01 12:01:00") == 2L)
    assert(got("2025-01-01 11:57:00") == 1L)  // only the first event
    assert(got("2025-01-01 12:04:00") == 1L)  // only the second
    assert(got.values.sum == 10L)             // each event in exactly 5 hops
  }

  test("T10 state persists across micro-batches") {
    val in = MemoryStream[StreamOps.FraudInput]
    val base = ts("2025-01-01 00:00:00").getTime
    def order(i: Long) = StreamOps.FraudInput("9", i, "600.00", new java.sql.Timestamp(base + i * 1000))
    val q = StreamOps.fraudDetector(in.toDS(), 500.0, 3L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("golden_fraud2").start()
    in.addData(order(1), order(2)); q.processAllAvailable()
    in.addData(order(3), order(4)); q.processAllAvailable() // 4th crosses threshold here
    q.stop()
    val got = spark.table("golden_fraud2").as[StreamOps.Alert].collect()
    assert(got.map(_.orderKey).toSeq == Seq(4L))
  }

  test("KTable golden: latestPerKey upserts to the latest value by event time (StreamTableJoinExample.java:114,137-140)") {
    val in = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = StreamOps.latestPerKey(in.toDF().toDF("key", "value", "eventTime"))
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("ktable").start()
    in.addData(("1", "alice@old.com", ts("2025-01-01 10:00:00")))
    q.processAllAvailable()
    in.addData(
      ("1", "alice@new.com", ts("2025-01-01 11:00:00")),  // later event → wins
      ("1", "alice@stale.com", ts("2025-01-01 09:00:00")), // earlier event → ignored
      ("2", "bob@x.com", ts("2025-01-01 10:30:00")))
    q.processAllAvailable()
    q.stop()
    // update-mode changelog: final state = last emission per key
    val got = spark.table("ktable")
      .groupBy($"key").agg(max_by($"value", $"eventTime").as("value"))
      .as[(String, String)].collect().toMap
    assert(got == Map("1" -> "alice@new.com", "2" -> "bob@x.com"))
  }

  test("KTable tombstone golden: a null value deletes its key; a later write resurrects it (builder.table semantics)") {
    import org.apache.spark.sql.functions.{col, lit}
    // batch form of the same aggregate (the dimension-table view): write →
    // tombstone → gone; write → tombstone → write → back; tombstone TIED
    // on event time loses to the concurrent value (deterministic)
    val rows = Seq(
      ("del", Some("v1"), ts("2025-01-01 10:00:00")),
      ("del", None, ts("2025-01-01 11:00:00")),           // latest = tombstone → key leaves
      ("back", Some("v1"), ts("2025-01-01 10:00:00")),
      ("back", None, ts("2025-01-01 11:00:00")),
      ("back", Some("v2"), ts("2025-01-01 12:00:00")),    // resurrected
      ("tie", Some("vX"), ts("2025-01-01 10:00:00")),
      ("tie", None, ts("2025-01-01 10:00:00")),           // tied tombstone loses
      ("keep", Some("v9"), ts("2025-01-01 10:00:00")))
      .map { case (k, v, t) => (k, v.orNull, t) }
      .toDF("key", "value", "eventTime")
    val table = StreamOps.latestPerKey(rows)
      .select($"key", $"value").as[(String, String)].collect().toMap
    assert(table == Map("back" -> "v2", "tie" -> "vX", "keep" -> "v9"), s"got $table")
    // the SINK form surfaces the delete row instead of hiding the key
    val changelog = StreamOps.latestPerKey(rows, dropTombstones = false)
      .select($"key", $"value").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(changelog("del").isEmpty && changelog("back").contains("v2"))
    // and the streaming update-mode view honors the same rule
    val in = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = StreamOps.latestPerKey(in.toDF().toDF("key", "value", "eventTime"))
      .writeStream.outputMode(OutputMode.Update()).format("memory")
      .queryName("ktable_tomb").start()
    in.addData(("1", "v1", ts("2025-01-01 10:00:00")))
    q.processAllAvailable()
    in.addData(("1", null, ts("2025-01-01 11:00:00"))) // tombstone: no new emission
    q.processAllAvailable()
    q.stop()
    val emissions = spark.table("ktable_tomb")
      .filter(col("key") === lit("1")).collect()
    assert(emissions.length == 1 && emissions.head.getString(1) == "v1",
      "the filtered view must not emit the deleted key again (sinks use dropTombstones = false)")
  }

  test("debug tap surfaces per-batch row counts without disturbing the stream (OrderCountTumblingWindow.java:81-82)") {
    val in = MemoryStream[(String, java.sql.Timestamp)]
    in.addData(("a", ts("2025-01-01 10:00:00")), ("b", ts("2025-01-01 10:00:01")))
    val tapped = StreamOps.tap(in.toDF().toDF("key", "eventTime"), "pre-agg")
    val q = StreamOps.runningCount(tapped)
      .writeStream.outputMode(OutputMode.Update()).format("memory").queryName("tap_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("tap_out").count() == 2) // stream itself unchanged
    val observed = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("pre-agg")))
    assert(observed.exists(_.getAs[Long]("rows") == 2L))
  }

  test("checkpoint restore: stateful aggregate resumes from checkpoint with state intact (ProductCountApp.java:34-36)") {
    // ≙ RocksDB + changelog-topic restore: stop the query, start a NEW
    // query instance over the same checkpointLocation, verify the running
    // count continues from the persisted state instead of recounting.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[(String, String)]
    val stream = in.toDF().toDF("key", "value")
      .withColumn("eventTime", lit(ts("2025-01-01 00:00:00")))
    // memory sink can't recover from a checkpoint; foreachBatch can —
    // each query instance drains its changelog into its own buffer
    def start(buf: scala.collection.mutable.Buffer[(String, Long)]) =
      StreamOps.runningCount(stream)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= batch.as[(String, Long)].collect() }; ()
        }
        .start()

    val before = scala.collection.mutable.Buffer.empty[(String, Long)]
    val q1 = start(before)
    in.addData(("3", "o1"), ("3", "o2"), ("7", "o3"))
    q1.processAllAvailable()
    q1.stop()
    assert(before.toMap == Map("3" -> 2L, "7" -> 1L))

    val after = scala.collection.mutable.Buffer.empty[(String, Long)]
    val q2 = start(after) // fresh query instance, same checkpoint
    in.addData(("3", "o4"))
    q2.processAllAvailable()
    q2.stop()
    // the post-restart batch must emit 3 for key 3 (2 restored + 1 new),
    // proving state came from the checkpoint, not a recount
    assert(after.toMap == Map("3" -> 3L))
  }

  test("T8 OrderPayment golden: join combiner emits the byte-exact OrderPayment JSON (OrderPayment.java:5-7, StreamStreamJoinExample.java:118-123,163-168)") {
    val orders = MemoryStream[(String, String, java.sql.Timestamp)]
    val payments = MemoryStream[(String, String, java.sql.Timestamp)]
    // ≙ the reference's observed output: Key: 120 Value: OrderPayment{orderId=120, customerId=1, amount=100.0}
    orders.addData(("120",
      """{"order_id":120,"customer_id":1,"order_date":"2025-08-21","total_amount":"800.00"}""",
      ts("2025-01-01 10:00:00")))
    payments.addData(("120", """{"orderId":120,"amount":100.0}""", ts("2025-01-01 10:02:00")))
    val got = runToMemory(StreamOps.orderPaymentJoin(
      orders.toDF().toDF("key", "value", "eventTime"),
      payments.toDF().toDF("key", "value", "eventTime"), withinMinutes = 5),
      "golden_orderpayment", OutputMode.Append())
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("120", """{"orderId":120,"customerId":1,"amount":100.0}""")))
  }

  test("versioned-KTable join: same-timestamp dim re-write replaces the version (KIP-914 last-write-wins)") { withRocksDb {
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"), retentionMillis = 3600000L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_rewrite").start()
    dims.addData(("k", "v-first", ts("2025-01-01 10:00:00")))
    q.processAllAvailable()
    dims.addData(("k", "v-rewrite", ts("2025-01-01 10:00:00"))) // same ts, later batch → replaces
    q.processAllAvailable()
    facts.addData(("k", "f1", ts("2025-01-01 10:00:30")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vtj_rewrite").as[StreamOps.VersionedJoined].collect().toSeq
    assert(got.map(j => (j.factValue, j.dimValue)) == Seq(("f1", "v-rewrite")))
  } }

  test("versioned-KTable join: a dim TOMBSTONE deletes the key as of its timestamp; earlier facts still join history") { withRocksDb {
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"), retentionMillis = 3600000L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_tomb").start()
    dims.addData(
      ("k", "v1", ts("2025-01-01 10:00:00")),
      ("k", null, ts("2025-01-01 10:02:00")),   // KIP-914 tombstone version
      ("k", "v2", ts("2025-01-01 10:04:00")))   // resurrection
    q.processAllAvailable()
    facts.addData( // all within the join grace of the dim watermark
      ("k", "f-v1", ts("2025-01-01 10:01:00")), // floor = v1 → joins
      ("k", "f-del", ts("2025-01-01 10:03:00")), // floor = tombstone → NOTHING (inner join)
      ("k", "f-v2", ts("2025-01-01 10:05:00"))) // floor = v2 → joins
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vtj_tomb").as[StreamOps.VersionedJoined].collect()
      .map(j => (j.factValue, j.dimValue)).toSet
    assert(got == Set(("f-v1", "v1"), ("f-v2", "v2")), s"got $got")
  } }

  test("versioned-KTable join: out-of-order fact resolves against the retained version history") { withRocksDb {
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"), retentionMillis = 3600000L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_ooo").start()
    dims.addData(
      ("k", "v1", ts("2025-01-01 10:00:00")),
      ("k", "v2", ts("2025-01-01 10:10:00")))
    q.processAllAvailable()
    facts.addData(
      ("k", "f-late", ts("2025-01-01 10:05:00")),  // arrives after v2 but predates it
      ("k", "f-at", ts("2025-01-01 10:10:00")),    // exactly at v2 → inclusive
      ("k", "f-early", ts("2025-01-01 09:00:00"))) // before any version → drops (inner)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vtj_ooo").as[StreamOps.VersionedJoined].collect()
      .map(j => j.factValue -> j.dimValue).toMap
    assert(got == Map("f-late" -> "v1", "f-at" -> "v2"))
  } }

  test("versioned-KTable join: fact past the pruned horizon joins the floor version; older facts drop") { withRocksDb {
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    // retention 1 min: after the 10:05 dim lands, horizon = 10:04 —
    // v0/v1 are both older; the NEWEST of them (v1) must survive as floor
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"), retentionMillis = 60000L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_floor").start()
    dims.addData(
      ("k", "v0", ts("2025-01-01 10:00:00")),
      ("k", "v1", ts("2025-01-01 10:00:30")),
      ("k", "v2", ts("2025-01-01 10:05:00")))
    q.processAllAvailable()
    facts.addData(
      ("k", "f-floor", ts("2025-01-01 10:02:00")),   // past horizon → floor version v1
      ("k", "f-too-old", ts("2025-01-01 10:00:10"))) // predates the floor → drops (v0 pruned)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vtj_floor").as[StreamOps.VersionedJoined].collect()
      .map(j => j.factValue -> j.dimValue).toMap
    // f-too-old producing NO row is the proof v0 was pruned: had v0 been
    // retained it would have joined v0
    assert(got == Map("f-floor" -> "v1"))
  } }

  test("versioned-KTable join: COLD key history is pruned by the watermark-driven timer, without any traffic of its own") { withRocksDb {
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    // retention 1 min, lateness (watermark delay) 1 h: key "cold" writes
    // two versions and then goes silent; key "hot" advances the watermark
    // past the cold key's prune point (v1.ts + retention − lateness), so
    // the timer fires and prunes v0, leaving v1 as the floor
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"),
      retentionMillis = 60000L, latenessMillis = 3600000L).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_cold").start()
    dims.addData(
      ("cold", "v0", ts("2025-01-01 10:00:00")),
      ("cold", "v1", ts("2025-01-01 10:01:00")))
    q.processAllAvailable()
    // hot traffic ahead: watermark → 10:30 − 1h = 09:30, past the cold
    // key's prune point (v1.ts + retention − lateness = 09:02) ⇒ the
    // timer fires; stream time = watermark + lateness = 10:30, horizon =
    // 10:29 ⇒ v0 AND v1 are both older — the floor rule keeps exactly v1.
    // The facts (10:00:30, 10:01:30) stay ABOVE the 09:30 watermark, so
    // they are admitted and probe the timer-pruned history.
    dims.addData(("hot", "hv", ts("2025-01-01 10:30:00")))
    q.processAllAvailable()
    facts.addData(
      ("cold", "f-mid", ts("2025-01-01 10:00:30")),  // would join v0 if retained → must drop
      ("cold", "f-after", ts("2025-01-01 10:01:30"))) // joins the floor v1
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vtj_cold").as[StreamOps.VersionedJoined].collect()
      .map(j => j.factValue -> j.dimValue).toMap
    // f-mid producing NO row proves the timer pruned v0 while the key was
    // cold; f-after proves the floor version still resolves
    assert(got == Map("f-after" -> "v1"))
  } }

  test("versioned-KTable join: dimAdmissionToRetention admits a dim update past the join grace (KIP-914 store rule); the default mode drops it") { withRocksDb {
    // retention 10 min, lateness 1 min. v2 arrives 4.5 min behind the max
    // event time — beyond the 1-min join grace but well within retention.
    // KIP-914's versioned store accepts that put; the single-union-
    // watermark default cannot. Run the SAME feed through both modes.
    def run(mode: Boolean, name: String): Map[String, String] = {
      val facts = MemoryStream[(String, String, java.sql.Timestamp)]
      val dims = MemoryStream[(String, String, java.sql.Timestamp)]
      val q = StreamOps.versionedTableJoin(
        facts.toDF().toDF("key", "value", "eventTime"),
        dims.toDF().toDF("key", "value", "eventTime"),
        retentionMillis = 600000L, latenessMillis = 60000L,
        dimAdmissionToRetention = mode).toDF()
        .writeStream.outputMode(OutputMode.Append()).format("memory").queryName(name).start()
      dims.addData(("k", "v1", ts("2025-01-01 10:00:00")))
      facts.addData(("k", "f1", ts("2025-01-01 10:05:00"))) // advances max event time to 10:05
      q.processAllAvailable()
      // 4.5 min behind max event time: default watermark (10:05 − 1 min =
      // 10:04) filters it; per-side watermarks (min(10:04, 10:00 − 10 min))
      // admit it — the dim side's own delay IS retention
      dims.addData(("k", "v2", ts("2025-01-01 10:00:30")))
      q.processAllAvailable()
      // floor lookup ≤ 10:04:30 → v2 if the late put was admitted, else v1
      facts.addData(("k", "f2", ts("2025-01-01 10:04:30")))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[StreamOps.VersionedJoined].collect()
        .map(j => j.factValue -> j.dimValue).toMap
    }
    assert(run(mode = true, "vtj_dimadm_on") == Map("f1" -> "v1", "f2" -> "v2"))
    assert(run(mode = false, "vtj_dimadm_off") == Map("f1" -> "v1", "f2" -> "v1"))
  } }

  test("versioned-join law: single-batch streaming replay ≡ batch as-of join on random interleavings") { withRocksDb {
    // two independent implementations of the same lookup semantics — the
    // stateful streaming replay and Relational.asofJoin's union-and-carry
    // batch plan — must agree on any interleaving (retention large enough
    // that nothing prunes, facts with unique values so rows are keyed)
    val rnd = new scala.util.Random(13)
    val base = ts("2025-01-01 10:00:00").getTime
    val keys = Seq("a", "b", "c")
    val dimRows = (0 until 30).map(i =>
      (keys(rnd.nextInt(3)), s"d$i", new java.sql.Timestamp(base + rnd.nextInt(3600) * 1000L)))
    val factRows = (0 until 100).map(i =>
      (keys(rnd.nextInt(3)), s"f$i", new java.sql.Timestamp(base + rnd.nextInt(3600) * 1000L)))
    val facts = MemoryStream[(String, String, java.sql.Timestamp)]
    val dims = MemoryStream[(String, String, java.sql.Timestamp)]
    facts.addData(factRows)
    dims.addData(dimRows)
    val q = StreamOps.versionedTableJoin(
      facts.toDF().toDF("key", "value", "eventTime"),
      dims.toDF().toDF("key", "value", "eventTime"),
      retentionMillis = 365L * 24 * 3600 * 1000).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("vtj_law").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("vtj_law").as[StreamOps.VersionedJoined].collect()
      .map(j => j.factValue -> j.dimValue).toMap
    val batch = graft.operators.Relational.asofJoin(
      factRows.toDF("k", "fval", "t"),
      dimRows.toDF("k", "dval", "t"), "k", "t")
      .select($"fval", $"dval").as[(String, String)].collect().toMap
    assert(streamed == batch,
      s"streaming vs batch diverged: only-streaming=${streamed.toSet.diff(batch.toSet)}, " +
        s"only-batch=${batch.toSet.diff(streamed.toSet)}")
  } }

  test("T9 golden: stream-table enrichment join, inner semantics (StreamTableJoinExample.java:151-163)") {
    val in = MemoryStream[(String, String)]
    in.addData(("1", "order-a"), ("1", "order-b"), ("999", "order-c")) // 999 has no customer
    val dim = Seq(("1", "Alice", "alice@example.com")).toDF("customer_id", "name", "email")
    val stream = in.toDF().toDF("customer_id", "order")
    val got = runToMemory(
      StreamOps.streamTableJoin(stream, dim, "customer_id"), "golden_stj", OutputMode.Append())
    assert(got.count() == 2)                        // order-c dropped (inner)
    assert(got.select($"name").distinct().as[String].head() == "Alice")
  }
}
