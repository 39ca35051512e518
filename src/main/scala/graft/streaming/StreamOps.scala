package graft.streaming

import graft.functions.Funcs
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming forms of the reference topologies (SURVEY §2.7,
  * §3). Batch logical shapes live in [[graft.operators.Relational]]; these
  * are the `readStream` pipelines with watermarks, update-mode aggregates,
  * and user state — the parts that are genuinely streaming-native.
  *
  * Conventions (SURVEY §1.2): a stream is a DataFrame with a `key: String`
  * column and an `eventTime: Timestamp` column; grace period 0 ⇔
  * `withWatermark(eventTime, "0 seconds")` (late rows dropped, NoGrace
  * parity). State stores checkpoint via the query's checkpointLocation;
  * at scale flip `spark.sql.streaming.stateStore.providerClass` to RocksDB.
  */
object StreamOps {

  /** T3 ≙ ProductCountApp — unwindowed running count per key in update
    * output mode: every trigger emits the changed (key, cnt) rows, exactly
    * the KTable changelog the reference prints. */
  def runningCount(stream: DataFrame): DataFrame =
    stream
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))

  /** T4/T5/T6 ≙ tumbling windowed count with grace `graceSeconds`
    * (0 = NoGrace parity: the watermark IS the grace period). */
  def tumblingCount(stream: DataFrame, windowLen: String, graceSeconds: Int = 0): DataFrame =
    stream
      .withWatermark("eventTime", s"$graceSeconds seconds")
      .groupBy(window(col("eventTime"), windowLen), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("key"), col("cnt"))

  /** Session-window count (engine roadmap op): Spark-native
    * `session_window` merges a key's events while consecutive gaps stay
    * under `gap`; state is evicted once the watermark passes a session's
    * end, so state is bounded like any windowed aggregate. */
  def sessionCount(stream: DataFrame, gap: String, graceSeconds: Int = 0): DataFrame =
    stream
      .withWatermark("eventTime", s"$graceSeconds seconds")
      .groupBy(session_window(col("eventTime"), gap), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("key"), col("cnt"))

  /** Epoch-aligned hopping-window count — the documented cheap
    * approximation of T7's Kafka sliding windows (SURVEY §7.1 step 5):
    * built-in `window(size, slide)`, overlapping but wall-clock-aligned
    * (an event lands in size/slide windows), vs. the exact event-anchored
    * [[slidingCount]]. Orders of magnitude cheaper at scale (stateless
    * window assignment + plain windowed agg vs. per-key timestamp-buffer
    * state); use when aligned approximation is acceptable. */
  def hoppingCount(stream: DataFrame, windowLen: String, slide: String,
      graceSeconds: Int = 0): DataFrame =
    stream
      .withWatermark("eventTime", s"$graceSeconds seconds")
      .groupBy(window(col("eventTime"), windowLen, slide), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("key"), col("cnt"))

  /** KTable ≙ `builder.table(topic)` (StreamTableJoinExample.java:137-140,
    * "KTable always stores the latest value per key"): the stream's
    * changelog view as an update-mode aggregate — every trigger emits the
    * changed (key, latest value) rows. Latest is by EVENT time, with ties
    * broken by the value itself (max_by on the (eventTime, value) struct),
    * so results are deterministic under shuffle even for same-timestamp
    * writes; the reference itself is last-write-wins at processing time
    * (SURVEY §7.2). Joinable as a dimension via foreachBatch upsert into a
    * keyed table.
    *
    * Kafka TOMBSTONE semantics: a NULL value DELETES its key — a key
    * whose latest record is a tombstone leaves the table view entirely
    * (`dropTombstones = true`, the `builder.table` contract; a later
    * write resurrects the key). Pass `false` to surface the (key, null)
    * row instead — the changelog form an upsert SINK needs in order to
    * issue the delete (in streaming update mode the filtered view simply
    * stops emitting for a deleted key, so a stateful sink must consume
    * the unfiltered form). A tombstone TIED on event time loses to any
    * concurrent value (struct ordering puts the null value first),
    * deterministically. */
  def latestPerKey(stream: DataFrame, dropTombstones: Boolean = true): DataFrame = {
    val latest = stream
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(max_by(col("value"), struct(col("eventTime"), col("value"))).as("value"),
        max(col("eventTime")).as("eventTime"))
    if (dropTombstones) latest.filter(col("value").isNotNull) else latest
  }

  /** Debug tap ≙ `print(Printed.toSysOut().withLabel(label))`
    * (OrderCountTumblingWindow.java:81-82) — non-terminal, zero-copy:
    * registers an observation point that surfaces per-batch row counts in
    * `StreamingQueryProgress.observedMetrics(label)` (or `Observation` for
    * batch) and passes the stream through unchanged. Unlike a forked
    * console query, this never re-reads the source. */
  def tap(df: DataFrame, label: String): DataFrame =
    df.observe(label, count(lit(1)).as("rows"))

  /** T6 ≙ windows/tumbling/FraudDetectionApp.java:38-57 — tumbling
    * 1-minute count per key with a threshold alert: emits (window, key,
    * cnt) only when cnt exceeds `threshold`. Update mode: a window's
    * alert row re-emits with the grown count as more events land (the
    * reference alerts on every update past the threshold too). */
  def windowedFraudAlerts(stream: DataFrame, windowLen: String, threshold: Long,
      graceSeconds: Int = 0): DataFrame =
    tumblingCount(stream, windowLen, graceSeconds)
      .filter(col("cnt") > threshold)

  /** T8 ≙ StreamStreamJoinExample — windowed stream-stream equi-join:
    * equal keys, |t_left − t_right| ≤ `withinMinutes`. Watermarks on both
    * sides bound the join state (Spark evicts rows older than
    * watermark + window — the reference's "unmatched rows dropped after the
    * window expires").
    *
    * `joinType` extends the surface to Kafka Streams' `leftJoin` /
    * `outerJoin` ("left_outer" / "full_outer"): an unmatched row emits
    * with null partner columns only once the watermark proves no partner
    * can still arrive (its side's state evicts) — the exact analog of
    * Kafka Streams' grace-deferred null emission, so outer results
    * trail the inner ones by the watermark delay rather than appearing
    * eagerly. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, withinMinutes: Int,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("eventTime", s"$withinMinutes minutes")
    val r = right.selectExpr("key AS r_key", "value AS r_value", "eventTime AS r_eventTime")
      .withWatermark("r_eventTime", s"$withinMinutes minutes")
    l.join(r,
      col("key") === col("r_key") &&
        col("r_eventTime") >= col("eventTime") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("r_eventTime") <= col("eventTime") + expr(s"INTERVAL $withinMinutes MINUTES"),
      joinType)
  }

  /** T8 output shape ≙ models/OrderPayment.java:5-7 via the join combiner
    * at StreamStreamJoinExample.java:118-123: parse the order (left) and
    * payment (right) JSON payloads, join within ±`withinMinutes`, and emit
    * OrderPayment{orderId, customerId, amount} as the sink JSON value,
    * keyed by order id. Struct field order matches the POJO declaration
    * order, so `to_json` emits the byte-exact Jackson shape. */
  def orderPaymentJoin(orders: DataFrame, payments: DataFrame, withinMinutes: Int): DataFrame = {
    import graft.codec.JsonCodec
    val o = JsonCodec.parseOrder(col("value"))
    val p = JsonCodec.parsePayment(col("r_value"))
    streamStreamJoin(orders, payments, withinMinutes)
      .select(col("key"),
        JsonCodec.toJsonValue(struct(
          o.getField("order_id").as("orderId"),
          o.getField("customer_id").as("customerId"),
          p.getField("amount").as("amount"))).as("value"))
  }

  /** T9 ≙ StreamTableJoinExample — stream-table enrichment join. The
    * dimension is a *static* DataFrame re-evaluated every micro-batch
    * (parquet/Delta path re-scan ⇒ "latest value per key" with per-trigger
    * staleness — SURVEY §7.2's documented KTable gap). */
  def streamTableJoin(stream: DataFrame, dim: DataFrame, joinKey: String): DataFrame =
    stream.join(dim, Seq(joinKey), "inner")

  /** Streaming exact dedup over `idCols` with watermark-bounded state
    * (SURVEY §7.1 step 7; training-pipeline north star): a record whose id
    * was already seen within the watermark delay is dropped; per-id state
    * is evicted once the watermark passes eventTime + delay, so state size
    * is bounded by the delay × arrival rate — the explicit trade-off that a
    * duplicate arriving later than the delay is re-emitted. Rows later
    * than the watermark itself are dropped outright (late-data rule). */
  def streamingDedup(stream: DataFrame, idCols: Seq[String], delay: String): DataFrame =
    stream
      .withWatermark("eventTime", delay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming NEAR-dup: [[streamingDedup]] keyed on the 64-bit SimHash
    * of the value instead of an id — exact duplicates, token
    * reorderings, and sketch-identical near-dups collapse to the first
    * arrival within the watermark, at O(1) state per distinct signature.
    * The batch LSH families recover banded multi-probe recall with
    * offline joins; an online pass deliberately trades that recall for
    * bounded per-record work — the standard online/offline dedup split
    * (run the batch pass periodically to catch what this one admits). */
  def streamingNearDup(stream: DataFrame, delay: String): DataFrame =
    streamingDedup(
      stream.withColumn("sig",
        graft.functions.Native.simhash(Funcs.tokens(col("value")))),
      Seq("sig"), delay)

  // ---------------------------------------------------------------------
  // Versioned stream-table join (KIP-914 versioned-KTable semantics)
  // ---------------------------------------------------------------------

  /** One tagged record of the merged fact/dim-changelog stream. */
  case class VersionedInput(key: String, side: String, value: String,
      eventTime: java.sql.Timestamp)

  /** Enriched fact: the dim version in effect at the fact's event time. */
  case class VersionedJoined(key: String, factValue: String, dimValue: String,
      eventTime: java.sql.Timestamp)

  /** Stream-KTable join against a LIVE dimension changelog with
    * event-time (versioned) lookup semantics — Kafka Streams' versioned
    * KTable join (KIP-914), and the fix for [[streamTableJoin]]'s
    * static-dim staleness gap (SURVEY §7.2): each fact joins the dim
    * version whose timestamp is the greatest ≤ the fact's event time,
    * regardless of arrival interleaving.
    *
    * Both inputs are merged into one keyed stream (dim updates tagged
    * "dim"), so one stateful operator holds the per-key version history:
    * within a batch, rows apply in (eventTime, dim-before-fact) order;
    * across batches the retained history answers out-of-order facts.
    * Inner semantics — a fact with no version at-or-before its time drops.
    *
    * State bound ≙ the versioned store's history retention: versions older
    * than (stream time − retentionMillis) are pruned, except the newest
    * such version, which stays as the floor lookup (exactly the versioned
    * store rule — a get(key, t) just past the horizon still resolves). A
    * fact older than the pruned horizon joins that floor version: the
    * documented trade-off of bounded history.
    *
    * Stream time is the KIP-914 clock, assembled from two sources: the
    * key's own max observed event time (immediate, exactly the versioned
    * store's behavior for keys receiving traffic) and the query WATERMARK
    * + `latenessMillis` (= the global max event time of the previous
    * batch — the partition-level stream time, one trigger stale). A COLD
    * key registers an event-time timer for the moment its oldest
    * non-floor version exits the horizon, so its history is pruned as the
    * watermark advances even when the key itself sees no rows — closing
    * the round-4 divergence (per-key-only pruning retained cold-key
    * history indefinitely).
    *
    * Admission. By default `latenessMillis` is the ADMISSION bound for
    * BOTH sides (it becomes the single union watermark delay): Spark
    * drops facts AND dim updates arriving more than that behind the
    * global max event time, before the operator. That diverges from
    * KIP-914, whose versioned STORE accepts out-of-order dim puts all
    * the way to history retention — under the default a dim version
    * arriving later than the join grace (but within retention) is lost,
    * and a subsequent fact floor-joins the previous version.
    * `dimAdmissionToRetention = true` closes that divergence: each side
    * gets its OWN watermark (facts delayed by `latenessMillis`, dims by
    * `retentionMillis`), and under Spark's default min multiple-watermark
    * policy the operator's late-row filter becomes
    * `min(maxFactTime − lateness, maxDimTime − retention)` — so dim
    * re-delivery is admitted to the full history retention, exactly the
    * versioned-store rule, and any admitted fact still finds every
    * version it could legally see (the prune horizon below never runs
    * ahead of that same watermark). The cost is KIP-914's own cost:
    * watermark-driven cold-key pruning and engine-wide state eviction
    * lag at retention rather than lateness (hot keys still prune on
    * their per-key clock, so history DEPTH stays `retentionMillis`
    * either way). Implemented on `transformWithState` (Spark 4 stateful
    * surface; requires the RocksDB state-store provider). */
  def versionedTableJoin(facts: DataFrame, dims: DataFrame, retentionMillis: Long,
      latenessMillis: Long = 3600000L, dimAdmissionToRetention: Boolean = false)(
      implicit spark: SparkSession): Dataset[VersionedJoined] = {
    import spark.implicits._
    // The retention-admission mode's wm→stream-time conversion (wmOffset =
    // retentionMillis below) is derived under Spark's DEFAULT 'min'
    // multipleWatermarkPolicy: the engine watermark is the dim side's
    // (the laggard). Under 'max' the recovered stream time would overshoot
    // by (retention − lateness), running the prune horizon AHEAD of dim
    // admission — an admitted late dim could floor-join pruned history.
    // Fail at construction, not with silently wrong joins.
    if (dimAdmissionToRetention) {
      val policy = spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy", "min")
      require(policy == "min",
        s"versionedTableJoin(dimAdmissionToRetention = true) requires " +
          s"spark.sql.streaming.multipleWatermarkPolicy = 'min' (the default); " +
          s"got '$policy' - under 'max' the prune horizon runs ahead of dim admission")
    }
    val factSide = facts
      .select(col("key"), lit("fact").as("side"), col("value"), col("eventTime"))
    val dimSide = dims
      .select(col("key"), lit("dim").as("side"), col("value"), col("eventTime"))
    val tagged =
      (if (dimAdmissionToRetention)
        factSide.withWatermark("eventTime", s"$latenessMillis milliseconds")
          .unionByName(dimSide.withWatermark("eventTime", s"$retentionMillis milliseconds"))
      else
        factSide.unionByName(dimSide)
          .withWatermark("eventTime", s"$latenessMillis milliseconds"))
        .as[VersionedInput]
    // wm→stream-time conversion: the operator watermark trails the max
    // event time by `latenessMillis` (single union watermark) or by
    // `retentionMillis` (per-side watermarks under the min policy, dims
    // being the laggard), so stream time is recovered by adding the same
    // offset back. With the retention offset the wm-driven prune horizon
    // (streamTime − retention) equals the admission watermark itself:
    // nothing still admissible can probe pruned history.
    val wmOffset = if (dimAdmissionToRetention) retentionMillis else latenessMillis
    tagged
      .groupByKey(_.key)
      .transformWithState(new VersionedJoinProcessor(retentionMillis, wmOffset),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[versionedTableJoin]]'s stateful core: per-key ascending version
    * list + a self-rearming event-time prune timer. `wmOffsetMillis` is
    * the watermark→stream-time conversion (how far the operator watermark
    * trails the max observed event time — the union watermark delay, or
    * `retentionMillis` under per-side watermarks + min policy). */
  class VersionedJoinProcessor(retentionMillis: Long, wmOffsetMillis: Long)
      extends StatefulProcessor[String, VersionedInput, VersionedJoined] {
    @transient private var versions: org.apache.spark.sql.streaming.ListState[(Long, String)] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      versions = getHandle.getListState("versions",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)
      timerAt = getHandle.getValueState("prune-timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Watermark 0 = "no watermark yet" (first batches): only the per-key
      * clock advances then. */
    private def streamTime(perKeyMax: Long, tv: TimerValues): Long = {
      val wm = tv.getCurrentWatermarkInMs()
      if (wm > 0) math.max(perKeyMax, wm + wmOffsetMillis) else perKeyMax
    }

    /** Keep in-horizon versions plus the newest at-or-before the horizon
      * (the floor lookup). */
    private def prune(vs: Seq[(Long, String)], st: Long): Seq[(Long, String)] =
      if (st == Long.MinValue) vs
      else {
        val horizon = st - retentionMillis
        val (older, recent) = vs.partition(_._1 < horizon)
        older.takeRight(1) ++ recent
      }

    /** (Re)arm the cold-key prune timer at the watermark value where the
      * oldest non-floor version becomes prunable; none needed once the
      * history is a single floor version. */
    private def rearm(vs: Seq[(Long, String)], tv: TimerValues): Unit = {
      val prev = if (timerAt.exists()) timerAt.get() else 0L
      val next =
        if (vs.size < 2) 0L
        else math.max(vs(1)._1 + retentionMillis - wmOffsetMillis + 1,
          tv.getCurrentWatermarkInMs() + 1)
      if (next != prev) {
        if (prev > 0) getHandle.deleteTimer(prev)
        if (next > 0) { getHandle.registerTimer(next); timerAt.update(next) }
        else timerAt.clear()
      }
    }

    override def handleInputRows(key: String, rows: Iterator[VersionedInput],
        tv: TimerValues): Iterator[VersionedJoined] = {
      var vs = versions.get().toSeq // ascending by maintenance invariant
      val out = scala.collection.mutable.ArrayBuffer.empty[VersionedJoined]
      // deterministic replay: event-time order, dim updates win ties
      val sorted = rows.toSeq.sortBy(r =>
        (r.eventTime.getTime, if (r.side == "dim") 0 else 1, r.value))
      sorted.foreach { r =>
        val t = r.eventTime.getTime
        if (r.side == "dim") {
          // same-timestamp re-write replaces (last write wins)
          vs = (vs.filterNot(_._1 == t) :+ (t -> r.value)).sortBy(_._1)
        } else {
          vs.takeWhile(_._1 <= t).lastOption.foreach { case (_, dv) =>
            // KIP-914 tombstone: a NULL dim version deletes the key as of
            // its timestamp — the versioned store returns null for asOf
            // lookups at/after it and the inner stream-table join invokes
            // no joiner, so the fact emits NOTHING (it still emits
            // against earlier real versions, which the tombstone does not
            // erase — that is exactly versioned-store history semantics)
            if (dv != null) out += VersionedJoined(key, r.value, dv, r.eventTime)
          }
        }
      }
      val perKeyMax = (vs.map(_._1) ++ sorted.map(_.eventTime.getTime))
        .foldLeft(Long.MinValue)(_ max _)
      vs = prune(vs, streamTime(perKeyMax, tv))
      versions.put(vs.toArray)
      rearm(vs, tv)
      out.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[VersionedJoined] = {
      val vs0 = versions.get().toSeq
      val perKeyMax = vs0.map(_._1).foldLeft(Long.MinValue)(_ max _)
      val vs = prune(vs0, streamTime(perKeyMax, tv))
      versions.put(vs.toArray)
      timerAt.clear() // the fired timer is gone; rearm for the next version
      rearm(vs, tv)
      Iterator.empty
    }
  }

  // ---------------------------------------------------------------------
  // T10 — custom stateful processor (the reference's Processor API surface)
  // ---------------------------------------------------------------------

  /** Input record for the fraud detector (≙ Order with string money). */
  case class FraudInput(key: String, orderKey: Long, totalAmount: String,
      eventTime: java.sql.Timestamp)

  /** Emitted alert ≙ FraudProcessor.java:61-82. */
  case class Alert(key: String, orderKey: Long, runningCount: Long, alert: String)

  /** ≙ processor/FraudProcessor.java:36-84 — per record: (1) skip if the
    * amount parses below `minAmount` (reference throws on non-numeric; we
    * drop — SURVEY §7 documented divergence); (2) bump the per-key count in
    * state; (3) forward an alert on EVERY record past `countThreshold`
    * (the 4th, 5th, … qualifying order each alert — FIXTURES.md golden).
    *
    * Records within a batch are processed in (eventTime, orderKey) order so
    * results are deterministic regardless of shuffle arrival order.
    */
  def fraudDetector(orders: Dataset[FraudInput], minAmount: Double, countThreshold: Long)(
      implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    orders
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Alert](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FraudInput], state: GroupState[Long]) =>
          val (alerts, count) = fraudSweep(key, rows,
            state.getOption.getOrElse(0L), minAmount, countThreshold)
          state.update(count)
          alerts
      }
  }

  private def parseAmount(s: String): Option[Double] =
    try Option(s).map(_.toDouble) catch { case _: NumberFormatException => None }

  /** The fraud-counting core shared by [[fraudDetector]] (fMGWS) and
    * [[FraudProcessorTws]] (`transformWithState`) — the [[slidingSweep]]
    * stance: ONE definition of the filter/order/threshold/alert rule, so
    * the two stateful surfaces the goldens pin as semantically identical
    * cannot drift apart. Returns (alerts in deterministic
    * (eventTime, orderKey) order, updated running count). */
  private def fraudSweep(key: String, rows: Iterator[FraudInput], count0: Long,
      minAmount: Double, countThreshold: Long): (Iterator[Alert], Long) = {
    var count = count0
    val alerts = rows.toSeq
      .filter(r => parseAmount(r.totalAmount).exists(_ >= minAmount))
      .sortBy(r => (r.eventTime.getTime, r.orderKey))
      .flatMap { r =>
        count += 1
        if (count > countThreshold)
          Some(Alert(key, r.orderKey, count,
            s"Fraud alert! Customer $key placed $count high-value orders."))
        else None
      }
    (alerts.iterator, count)
  }

  /** ≙ FraudProcessor as a Spark 4 `StatefulProcessor` — the modern
    * `transformWithState` surface (successor of flatMapGroupsWithState):
    * named typed state ([[ValueState]] "fraud-count" ≙ the reference's
    * named "fraud-store", FraudDetectionApp.java:38-45), explicit
    * init/handle lifecycle ≙ Processor.init/process. Requires the RocksDB
    * state-store provider (multi-column-family state) — the same provider
    * the reference's RocksDB stores imply at scale. */
  class FraudProcessorTws(minAmount: Double, countThreshold: Long)
      extends StatefulProcessor[String, FraudInput, Alert] {
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("fraud-count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[FraudInput],
        timerValues: TimerValues): Iterator[Alert] = {
      val (alerts, count) = fraudSweep(key, rows,
        if (countState.exists()) countState.get() else 0L, minAmount, countThreshold)
      countState.update(count)
      alerts
    }
  }

  /** T10 via `transformWithState` (same semantics as [[fraudDetector]];
    * golden tests pin both). */
  def fraudDetectorTws(orders: Dataset[FraudInput], minAmount: Double, countThreshold: Long)(
      implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    orders
      .groupByKey(_.key)
      .transformWithState(new FraudProcessorTws(minAmount, countThreshold),
        TimeMode.None(), OutputMode.Append())
  }

  // ---------------------------------------------------------------------
  // T7 — Kafka-semantics sliding windows (SURVEY §7 hard part #1)
  // ---------------------------------------------------------------------

  case class SlidingEvent(key: String, eventTime: java.sql.Timestamp)

  /** One per-(key, window-anchor) count; window = [anchor, anchor+size). */
  case class SlidingCount(key: String, windowStart: java.sql.Timestamp, cnt: Long)

  /** ≙ CreditCardTransactions.java:13-59 — sliding-window count with the
    * reference trace's semantics: each event at time t anchors a window
    * [t, t+size) and every window's count covers the same-key events inside
    * it. Spark's built-in `window(slide)` is epoch-aligned hopping — not
    * this — so this is the one operator that needs user state:
    * per key we keep the event-timestamp buffer, bump all window anchors
    * covering an arriving event, and emit the updated anchors (update-mode
    * changelog, like the reference's KTable).
    *
    * Scale: state per key is the timestamps inside the horizon; buffer
    * entries older than (max event time − size) can no longer change and
    * are evicted each batch, so state is bounded by size × event rate per
    * key — the same bound Kafka Streams' window store retention gives.
    * Events arriving LATER than that horizon are dropped (grace-0 late
    * rule; counting them against the pruned buffer would undercount).
    *
    * Per-batch work is LINEAR in the buffer (plus the sort): the dirty-
    * anchor test and the per-anchor counts are monotone-pointer sweeps
    * over the sorted buffer — anchors ascend, so "first incoming ≥ t"
    * and the [t, t+size) count bounds only ever move forward. (The first
    * cut recomputed each dirty window with an O(buffer) count — O(dirty
    * × buffer) per key per trigger, a quadratic a dense hot key pays for
    * no reason; a dense-key golden pins the fixed cost.)
    */
  def slidingCount(events: Dataset[SlidingEvent], sizeMillis: Long)(
      implicit spark: SparkSession): Dataset[SlidingCount] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seq[Long], SlidingCount](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SlidingEvent], state: GroupState[Seq[Long]]) =>
          val (kept, out) = slidingSweep(key,
            state.getOption.getOrElse(Seq.empty), rows.map(_.eventTime.getTime), sizeMillis)
          state.update(kept.toSeq)
          out
      }
  }

  /** Shared per-batch core of [[slidingCount]] and [[slidingCountTws]]:
    * admit the batch's events against the grace-0 eviction horizon
    * (late-data rule: an event older than it would be counted against an
    * already-pruned buffer and emit UNDERCOUNTED windows — drop it, as
    * the watermark drops late rows in the built-in ops), merge into the
    * sorted buffer, then emit every dirty anchor's count in ONE ascending
    * pass: ip = first incoming ≥ t (anchor dirty iff that event lands in
    * [t, t+size)), lo/hi = the buffer indices bounding [t, t+size) — all
    * three pointers are monotone, so the emit pass is O(n) (plus the
    * sort), never O(dirty × buffer). Returns (new buffer, emissions). */
  private def slidingSweep(key: String, old: Seq[Long], rawIncoming: Iterator[Long],
      sizeMillis: Long): (Array[Long], Iterator[SlidingCount]) = {
    val horizon0 = if (old.isEmpty) Long.MinValue else old.max - sizeMillis
    val incoming = rawIncoming.filter(_ >= horizon0).toArray
    java.util.Arrays.sort(incoming)
    val all = new Array[Long](old.length + incoming.length)
    old.copyToArray(all)
    System.arraycopy(incoming, 0, all, old.length, incoming.length)
    java.util.Arrays.sort(all)
    val out = Seq.newBuilder[SlidingCount]
    var ip = 0
    var lo = 0
    var hi = 0
    var i = 0
    while (i < all.length) {
      val t = all(i)
      if (i == 0 || t != all(i - 1)) {
        while (ip < incoming.length && incoming(ip) < t) ip += 1
        if (ip < incoming.length && incoming(ip) < t + sizeMillis) {
          while (lo < all.length && all(lo) < t) lo += 1
          while (hi < all.length && all(hi) < t + sizeMillis) hi += 1
          out += SlidingCount(key, new java.sql.Timestamp(t), (hi - lo).toLong)
        }
      }
      i += 1
    }
    // evict timestamps that can no longer fall into a future window
    val kept =
      if (all.nonEmpty) all.dropWhile(_ < all(all.length - 1) - sizeMillis)
      else all
    (kept, out.result().iterator)
  }

  /** [[slidingCount]] on the Spark-4 `transformWithState` surface —
    * identical semantics (the same goldens pin both), with the per-key
    * timestamp buffer in a named `ListState("window-buffer")` on the
    * RocksDB provider. `TimeMode.None`: the operator implements its own
    * grace-0 eviction horizon from the per-key max; `TimeMode.EventTime`
    * would have the WATERMARK drop late rows before the processor sees
    * them (verified Spark-4 behavior), silently changing the late-data
    * rule from per-key horizon to global watermark. */
  def slidingCountTws(events: Dataset[SlidingEvent], sizeMillis: Long)(
      implicit spark: SparkSession): Dataset[SlidingCount] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new SlidingCountProcessor(sizeMillis),
        TimeMode.None(), OutputMode.Update())
  }

  /** [[slidingCountTws]]'s stateful core: sorted-buffer maintenance via
    * the shared [[slidingSweep]]. */
  class SlidingCountProcessor(sizeMillis: Long)
      extends StatefulProcessor[String, SlidingEvent, SlidingCount] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState("window-buffer", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SlidingEvent],
        tv: TimerValues): Iterator[SlidingCount] = {
      val old = buf.get().toSeq
      val (kept, out) = slidingSweep(key, old, rows.map(_.eventTime.getTime), sizeMillis)
      buf.put(kept)
      out
    }
  }
}
