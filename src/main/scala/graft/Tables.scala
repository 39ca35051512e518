package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply end-to-end: every query below projects and filters
  * *through* these loaders, and `.explain` shows `PushedFilters` reaching
  * the `FileScan parquet`. At cluster scale the same loaders work over a
  * partitioned table root — nothing here assumes a single file.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (read as raw Long
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, see
    * [[graft.Sessions]]) and as TIMESTAMP(MICROS) without timezone (read as
    * TIMESTAMP_NTZ). Both are normalized to a plain µs TIMESTAMP here so
    * every downstream consumer — `unix_micros`, `withWatermark`, window
    * frames — sees one canonical type regardless of fixture vintage. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTime(load(spark, dir, "events"), "ts")

  /** The single home of the event-time normalization rule; used by both the
    * batch loader above and the streaming topologies:
    *  - raw nanos (LongType under `nanosAsLong`): truncate to µs timestamp,
    *    matching DuckDB's ns→µs conversion on the oracle side;
    *  - TIMESTAMP_NTZ (parquet µs with no tz): cast to TIMESTAMP — the
    *    session timezone is pinned to UTC (see [[graft.Sessions]]), so the
    *    instant is unchanged and `unix_micros`/`withWatermark` accept it;
    *  - already TIMESTAMP: pass through. */
  def normalizeEventTime(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(colName,
          org.apache.spark.sql.functions.expr(s"timestamp_micros($colName DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(colName,
          df(colName).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Pre-r7 name, kept so older call sites and specs keep compiling. */
  def nanosLongToMicros(df: DataFrame, colName: String): DataFrame =
    normalizeEventTime(df, colName)
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Typed row models for the Dataset[T] surfaces (FIXTURES.md §A.1 analogs
  * mapped onto testdata column names). Used where compile-time field checks
  * pay for themselves (typed scans, stateful processors).
  */
object Models {
  /** ≙ reference `models/Order.java:4-7` mapped onto the testdata `orders`
    * table. Timestamps stay `java.sql.Timestamp` for Encoder friendliness. */
  case class Order(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  /** Keyed record envelope ≙ Kafka (key, value, timestamp) — SURVEY §1.2. */
  case class Record(key: String, value: String, eventTime: java.sql.Timestamp)

  /** Event row for streaming ops over the `events` table. */
  case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  /** Fraud-detector emission ≙ `FraudProcessor.java:61-82`. */
  case class FraudAlert(key: String, orderKey: Long, runningCount: Long, alert: String)
}
