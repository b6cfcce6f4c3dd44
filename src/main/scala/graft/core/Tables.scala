package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and load through here so that column
  * pruning + predicate pushdown reach the parquet scan (the scan node should
  * show `ReadSchema` with only the referenced columns and `PushedFilters`
  * for any literal predicate above it).
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The events table's `ts` is a parquet TIMESTAMP(NANOS) column, which
    * Spark cannot represent as TimestampType (micros). Sessions built via
    * `GraftSession` set `spark.sql.legacy.parquet.nanosAsLong` so it reads
    * as an exact BIGINT; we expose:
    *   - `ts_ns`  — epoch nanoseconds (exact, total ordering)
    *   - `ts_sec` — epoch seconds (floor), for window buckets
    * The DuckDB oracle mirrors these as `epoch_ns(ts)` / `epoch_ns(ts) //
    * 1e9`. All arithmetic stays in integer space — no double rounding at
    * any scale. (The conf lives at session build — no load-time mutation.) */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_sec", org.apache.spark.sql.functions.expr("ts_ns div 1000000000"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
