package graft

import graft.apps.Topologies
import org.scalatest.funsuite.AnyFunSuite

/** Every T1–T10 topology must wire source → transform → sink and drain
  * end-to-end over the sf0.001 testdata stream. */
class AppsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // sparse-output topologies: correct wiring can still yield 0 rows at
  // sf0.001 (threshold alerts / tight join windows) — drain must succeed
  private val mayBeEmpty = Set("t6", "t8")

  Topologies.names.foreach { name =>
    test(s"topology $name runs source→transform→sink end-to-end") {
      val (out, mode) = Topologies.build(name, spark, TestSpark.Sf0001)
      assert(out.isStreaming, s"$name must be a streaming pipeline")
      val sink = s"app_$name"
      val q = out.writeStream.outputMode(mode).format("memory").queryName(sink).start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table(sink).count()
      if (!mayBeEmpty(name)) assert(rows > 0, s"$name drained 0 rows")
    }
  }

  test("unknown topology name is rejected") {
    intercept[IllegalArgumentException](Topologies.build("nope", spark, TestSpark.Sf0001))
  }
}
