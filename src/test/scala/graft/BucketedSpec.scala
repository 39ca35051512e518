package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-storage co-located join: the write-once-shuffle-never path. */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("bucketed tables join with no Exchange and match the plain join") {
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    Bucketed.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketed.writeBucketed(cust, "b_cust", "o_custkey", 8)
    // disable broadcast so the assert proves BUCKETING (not broadcast)
    // removed the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.bucketedJoin(spark, "b_orders", "b_cust", Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected the bucketed join to plan without any shuffle:\n$plan")
      assert(joined.count() == orders.join(cust, Seq("o_custkey")).count())
      assert(joined.exceptAll(orders.join(cust, Seq("o_custkey"))).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
