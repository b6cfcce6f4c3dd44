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
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizeTemporal(load(spark, dir, "orders"), "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizeTemporal(load(spark, dir, "lineitem"), "l_shipdate")
  /** The events table's `ts` column has shipped in two physical encodings
    * across testdata generations:
    *   - parquet TIMESTAMP(NANOS): Spark can't represent nanos as
    *     TimestampType, so `GraftSession` sets
    *     `spark.sql.legacy.parquet.nanosAsLong` and the column loads as an
    *     exact BIGINT of epoch nanoseconds;
    *   - parquet timestamp[us]: loads as TIMESTAMP / TIMESTAMP_NTZ, which we
    *     convert via `unix_micros` (exact — the session timezone is UTC, so
    *     the NTZ→timestamp cast is a no-op reinterpretation).
    * We dispatch on the loaded schema so both generations yield the same
    * contract:
    *   - `ts_ns`  — BIGINT epoch nanoseconds (exact, total ordering)
    *   - `ts_sec` — BIGINT epoch seconds (floor), for window buckets
    * The DuckDB oracle mirrors these as `epoch_ns(ts)` / `epoch_ns(ts) //
    * 1e9` (epoch_ns handles both encodings natively). All arithmetic stays
    * in integer space — no double rounding at any scale. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    val tsNs = raw.schema("ts").dataType match {
      case LongType => col("ts")
      case _        => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    raw
      .withColumn("ts", tsNs) // in-place replace keeps the column position
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_sec", expr("ts_ns div 1000000000"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-drift armor for temporal columns (the drift class that broke
    * the events loader when the driver regenerated testdata): whatever
    * physical encoding a date-ish column ships in, queries see
    * TIMESTAMP_NTZ. A column already NTZ is left untouched — no extra
    * projection, so scan-level filter pushdown is unchanged on the
    * canonical path. Conversions are exact: the session timezone is UTC
    * (LTZ→NTZ is a reinterpretation), DATE midnight-extends, and a
    * BIGINT column here can only be epoch nanoseconds read via
    * `nanosAsLong` (floor-divided to µs). */
  private[graft] def normalizeTemporal(df: DataFrame, cols: String*): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    cols.foldLeft(df) { (d, name) =>
      d.schema(name).dataType match {
        case TimestampNTZType => d
        case TimestampType | DateType =>
          d.withColumn(name, col(name).cast(TimestampNTZType))
        case LongType =>
          d.withColumn(name,
            timestamp_micros(expr(s"$name div 1000")).cast(TimestampNTZType))
        case other =>
          throw new IllegalArgumentException(
            s"cannot normalize temporal column $name of type $other")
      }
    }
  }
}
