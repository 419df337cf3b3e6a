package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Table loaders + shared determinism helpers for the oracle query surface.
  *
  * Determinism rules (FIXTURES.md): every query has a total explicit
  * ordering; money/float aggregates go through exact integer cents
  * (`round(x*100) → long`) so the sum is order-insensitive and hash-stable
  * across Spark and DuckDB; DuckDB `sum(BIGINT)` returns HUGEINT so every
  * oracle SQL casts aggregate sums back to BIGINT.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which vanilla Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the legacy conf and
    * rebuild a microsecond TimestampType column with integer division
    * (`div`, not `/` — nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer
    * range, so float division would corrupt low bits). ts is monotone in
    * event_id with no µs collisions in the test data, so the µs truncation
    * cannot reorder anything relative to the ns-precision DuckDB oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Exact cents: round(x*100) as long. Input values have ≤2 decimals, so
    * this is lossless; summing longs is order-insensitive. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
