package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON payload codec ≙ the reference's generic Jackson serde
  * (`serdes/JsonPOJOSerde.java:20-39`) plus its POJO schemas
  * (`models/Order.java:4-7`, `models/Payment.java:5-6`,
  * `models/Customer.java:5-7`, `models/EnrichedOrder.java:5-6`).
  *
  * Spark-first: serialization is `from_json`/`to_json` over explicit
  * `StructType`s — codegen'd, vectorizable, and schema-checked at plan
  * time, vs. the reference's per-record reflective Jackson calls. Field
  * ORDER in each struct matches the reference POJO declaration order so
  * `to_json` emits byte-identical shapes to Jackson's default
  * (declaration-ordered) serialization — pinned by the golden sample at
  * `StreamTableJoinExample.java:159`.
  */
object JsonCodec {

  /** ≙ models/Order.java:4-7 — note `total_amount` IS a string. */
  val OrderSchema: StructType = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("customer_id", IntegerType),
    StructField("order_date", StringType),
    StructField("total_amount", StringType)))

  /** ≙ models/Payment.java:5-6. */
  val PaymentSchema: StructType = StructType(Seq(
    StructField("orderId", IntegerType),
    StructField("amount", DoubleType)))

  /** ≙ models/Customer.java:5-7 — string customerId (vs Order's int). */
  val CustomerSchema: StructType = StructType(Seq(
    StructField("customerId", StringType),
    StructField("name", StringType),
    StructField("email", StringType)))

  /** ≙ models/EnrichedOrder.java:5-6 — the one nested type. */
  val EnrichedOrderSchema: StructType = StructType(Seq(
    StructField("order", OrderSchema),
    StructField("customer", CustomerSchema)))

  /** Deserialize a JSON payload column to a typed struct. Malformed input
    * yields a NULL struct (PERMISSIVE) — the engine's total-function stance
    * vs. the reference serde's throw (`JsonPOJOSerde.java:36-38`); callers
    * re-key nulls to "UNKNOWN" via [[keyOrUnknown]]. */
  def parseOrder(value: Column): Column = from_json(value, OrderSchema)
  def parsePayment(value: Column): Column = from_json(value, PaymentSchema)
  def parseCustomer(value: Column): Column = from_json(value, CustomerSchema)

  /** Serialize an (order, customer) struct pair to the reference's nested
    * EnrichedOrder JSON (`StreamTableJoinExample.java:159`):
    * `{"order":{...},"customer":{...}}`. */
  def enrichedOrderJson(order: Column, customer: Column): Column =
    to_json(struct(order.as("order"), customer.as("customer")))

  /** Serialize any struct column back to a JSON payload (generic serde
    * write side). */
  def toJsonValue(payload: Column): Column = to_json(payload)

  /** Re-key with the reference's "UNKNOWN" fallback on malformed payloads
    * (`StreamsOrderCount.java:103-105`): `field` is a column extracted from
    * a parsed struct; NULL (parse failure or absent field) ⇒ "UNKNOWN". */
  def keyOrUnknown(field: Column): Column =
    coalesce(field.cast("string"), lit("UNKNOWN"))
}
