package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source definitions ≙ the reference's consumers (SURVEY §2.1).
  *
  * One record model everywhere (SURVEY §1.2): `key STRING, value STRING,
  * eventTime TIMESTAMP` — the Kafka (key, value, timestamp) triple. Every
  * downstream operator consumes this shape, so sources are interchangeable:
  * Kafka in production, MemoryStream in streaming tests, parquet for batch
  * correctness runs.
  *
  * The Kafka reader requires the (public) `spark-sql-kafka-0-10` connector
  * on the classpath and a reachable broker — neither exists in the build
  * sandbox, so [[kafkaStream]]/[[kafkaBatch]] are exercised for plan
  * construction only; the record-envelope contract they produce is what
  * the MemoryStream/parquet tests pin.
  */
object Sources {

  /** Streaming Kafka source ≙ `builder.stream(topic)` —
    * `WordCountApp.java:49`, `StreamStreamJoinExample.java:107-108`.
    * Casts the raw bytes to the string record envelope; `eventTime` is the
    * broker timestamp (the reference's default "partitionTime"), to be
    * overridden downstream by an event-time parse chain when a
    * TimestampExtractor analog applies (SURVEY §2.1). */
  def kafkaStream(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("eventTime"))

  /** Batch Kafka scan (topic replay) — same envelope, bounded. */
  def kafkaBatch(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("eventTime"))

  /** Typed source ≙ `Consumed.with(String, jsonSerde)`
    * (`OrderStreamConsumer.java:33-39`): parse the JSON value into a
    * struct column `v` and flatten. NULL rows (malformed payloads) keep
    * their envelope so re-key fallbacks can route them. */
  def typed(records: DataFrame, schema: StructType): DataFrame =
    records.withColumn("v", from_json(col("value"), schema))

  /** Parquet batch source over a testdata/lake table (the correctness
    * harness path; partition-pruned + filter-pushed by Catalyst). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Parquet streaming source (file-arrival stream over a lake directory) —
    * the no-broker stand-in for a topic subscription at scale. */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** JSONL corpus ingest — the wire format raw training corpora arrive in.
    * Schema is REQUIRED: `inferSchema` on 100 TB is a full extra scan, and
    * an inferred schema silently drifts with the data; an explicit one
    * fails loudly. PERMISSIVE mode routes malformed lines to
    * `_corrupt_record` (kept when the schema declares it) instead of
    * failing the job — at crawl scale some lines are ALWAYS broken, and
    * dropping them must be an explicit downstream filter, not a silent
    * reader default. Line-delimited JSON splits by newline, so a 100 TB
    * directory parallelizes per-block like any text source. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** CSV ingest with the same explicit-schema, keep-the-corrupt-line
    * contract as [[jsonl]] (header-skipping, quoted-field defaults). */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** ORC batch source — the other columnar lake format Spark ships a
    * vectorized, predicate-pushing reader for (Hive-ecosystem corpora
    * arrive as ORC as often as parquet). Same scan properties: column
    * pruning + PushedFilters reach the ORC reader, partitioned layouts
    * prune directories (pinned in SourcesSpec). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw media-file ingest for the multimodal column: Spark's built-in
    * `binaryFile` source yields one row per file — (path, modificationTime,
    * length, content BINARY) — which is exactly the opaque-payload shape
    * [[graft.operators.Multimodal]] consumes (`modality` sniff, header
    * dims, content hash) with no codec anywhere in the scan.
    * `pathGlobFilter` restricts to the media extensions wanted; at 100 TB
    * the source parallelizes per-file and prunes by the glob before any
    * byte is read. Files larger than executor memory belong in a chunked
    * format instead — the reader hard-caps at
    * `spark.sql.sources.binaryFile.maxLength` (2 GB default). */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("length"), col("content"))
}
