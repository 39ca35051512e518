package graft.sinks

import java.sql.Timestamp
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink definitions ≙ the reference's outputs (SURVEY §2.2) plus the
  * interactive-query surface (SURVEY §2.7, `OrderCountTumblingWindow
  * .java:126-145`).
  */
object Sinks {

  /** Kafka sink ≙ `to(topic, Produced.with(...))`
    * (`StreamTableJoinExample.java:172`, `processor/FraudDetectionApp
    * .java:104`). Expects the record envelope (`key`, `value` string
    * columns); requires the public `spark-sql-kafka-0-10` connector and a
    * broker at runtime (absent in the build sandbox — plan-construction
    * only here, the envelope contract is pinned by MemoryStream tests). */
  def toKafka(records: DataFrame, bootstrapServers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[Row] =
    records
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)

  /** Console sink ≙ `foreach(println)` / `print(Printed.toSysOut())`
    * (`WordCountApp.java:64`, `OrderCountTumblingWindow.java:81-82`). */
  def console(df: DataFrame, mode: OutputMode = OutputMode.Update()): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(mode)

  /** Memory sink for tests/interactive reads: materializes the stream into
    * an in-memory table named `name` queryable via `spark.table(name)`. */
  def memoryTable(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(mode)

  // ---------------------------------------------------------------------
  // Interactive query surface ≙ OrderCountTumblingWindow.java:126-145
  // ---------------------------------------------------------------------

  /** A continuously-upserted window store with point-in-time range reads —
    * the analog of Kafka Streams' `ReadOnlyWindowStore.fetch(key, from,
    * to)` over a live aggregation (`OrderCountTumblingWindow.java:132-144`).
    *
    * The update-mode aggregate's per-trigger delta (exactly the KTable
    * changelog) is upserted keyed by (key, window_start); readers fetch
    * concurrently while the query runs. Here the store is a driver-side
    * map — the same locality as the reference's per-instance RocksDB
    * store. At 100 TB the identical `foreachBatch` contract upserts into
    * a keyed external table (Delta MERGE / key-value store) and `fetch`
    * becomes a range scan on (key, window_start); nothing upstream
    * changes.
    */
  final class WindowCountStore {
    private val store = TrieMap.empty[(String, Long), Long]

    /** Upsert one micro-batch delta: rows of
      * (window_start TIMESTAMP, key STRING, cnt BIGINT). The delta is
      * per-trigger-small (changed keys only), so the collect moves only
      * the changelog, never the full state. */
    def upsert(batch: DataFrame): Unit =
      batch.select(col("key"), col("window_start"), col("cnt")).collect().foreach { r =>
        store.put((r.getString(0), r.getTimestamp(1).getTime), r.getLong(2))
      }

    /** ≙ `windowStore.fetch(key, from, to)` — counts for `key` whose
      * window start lies in [from, to], sorted by window start. */
    def fetch(key: String, from: Timestamp, to: Timestamp): Seq[(Timestamp, Long)] =
      store.iterator
        .collect { case ((k, ws), cnt) if k == key && ws >= from.getTime && ws <= to.getTime =>
          (new Timestamp(ws), cnt)
        }
        .toSeq.sortBy(_._1.getTime)

    /** All materialized (key, window_start, cnt) triples (test surface). */
    def snapshot(): Seq[(String, Timestamp, Long)] =
      store.iterator.map { case ((k, ws), c) => (k, new Timestamp(ws), c) }.toSeq
  }

  /** Attach a [[WindowCountStore]] to an update-mode windowed aggregate
    * (columns `window_start`, `key`, `cnt`): every trigger's changelog is
    * upserted into the store while the query runs. Returns the started
    * query; callers own its lifecycle. */
  def interactiveWindowCounts(aggregated: DataFrame, store: WindowCountStore,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    aggregated.writeStream
      .outputMode(OutputMode.Update())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => store.upsert(batch) }
      .start()
}
