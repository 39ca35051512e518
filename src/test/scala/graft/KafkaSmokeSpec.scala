package graft

import graft.{sinks, sources}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sandbox's Kafka limitation (SURVEY §2.1 rows 1/6): the public
  * `spark-sql-kafka-0-10` connector jar is absent from /opt/spark/jars and
  * the build resolves offline, so the Kafka source/sink can be constructed
  * but never executed here. These tests assert the failure is EXACTLY the
  * missing-connector lookup error — so the limitation can't silently rot,
  * and if the connector ever appears on the classpath they fail loudly,
  * flagging that the Kafka path must be promoted to executed tests.
  */
class KafkaSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertMissingConnector(e: Throwable): Unit = {
    // Spark's DataSource.lookupDataSource error for an absent provider
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    assert(msg.contains("kafka"),
      s"expected the missing-connector error to name the kafka source, got: $msg")
    assert(msg.contains("failed to find") || msg.contains("data source"),
      s"expected a data-source lookup failure, got: $msg")
  }

  test("kafkaStream fails with the missing-connector lookup error, nothing else") {
    val e = intercept[Exception] {
      sources.Sources.kafkaStream(spark, "localhost:9092", "orders-topic")
    }
    assertMissingConnector(e)
  }

  test("kafkaBatch fails with the missing-connector lookup error, nothing else") {
    val e = intercept[Exception] {
      sources.Sources.kafkaBatch(spark, "localhost:9092", "orders-topic")
    }
    assertMissingConnector(e)
  }

  test("toKafka builds the writer (envelope projection is analyzable); only start() hits the connector lookup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val records = in.toDF().toDF("key", "value")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kafka-ckpt").toString
    // writer construction must succeed: the sink's (key, value) binary
    // envelope is a plain projection, resolved against the stream schema
    val writer = sinks.Sinks.toKafka(records, "localhost:9092", "alerts-topic", ckpt)
    val e = intercept[Exception] { writer.start() }
    assertMissingConnector(e)
  }
}
