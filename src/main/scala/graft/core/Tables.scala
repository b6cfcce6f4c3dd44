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
  import org.apache.spark.sql.types._

  def region(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "region"), "r_regionkey" -> IntegerType)
  def nation(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "nation"),
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
  def customer(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "customer"),
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType)
  def supplier(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "supplier"),
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
  def part(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "part"),
      "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  def orders(spark: SparkSession, dir: String): DataFrame =
    conform(normalizeTemporal(load(spark, dir, "orders"), "o_orderdate"),
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType)
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    conform(normalizeTemporal(load(spark, dir, "lineitem"), "l_shipdate"),
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType)
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
    conform(raw
      .withColumn("ts", tsNs) // in-place replace keeps the column position
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_sec", expr("ts_ns div 1000000000")),
      "event_id" -> LongType, "user_id" -> LongType,
      "value" -> DoubleType)
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "documents"),
      "doc_id" -> LongType, "n_chars" -> LongType, "text" -> StringType)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    conform(load(spark, dir, "embeddings"),
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-drift armor for NON-temporal columns (the r9 lesson,
    * generalized past `normalizeTemporal`): each loader declares the
    * canonical type of its id / numeric-width / embedding / text
    * columns — the types every query and oracle in this repo was built
    * and gated against — and `conform` dispatches on what the parquet
    * actually shipped:
    *   - exact match (ignoring nullability): column untouched, so the
    *     canonical path adds NO projection and scan-level pushdown /
    *     pruning behave exactly as before this armor existed;
    *   - integral↔integral drift (int32 ids regenerated as int64 or
    *     vice versa): cast to the canonical width — key and label
    *     domains here are small (≤ millions), so narrowing is exact,
    *     and a per-row range guard raises (naming the column) if that
    *     assumption is ever violated rather than letting the non-ANSI
    *     cast wrap silently;
    *   - float↔double list drift (`embeddings.embedding`): cast the
    *     element type — the float32 canon is what every similarity
    *     kernel and its gated oracle compute in;
    *   - scalar float↔double drift (the money/value columns —
    *     `l_extendedprice`, `o_totalprice`, `events.value`, …): cast to
    *     the double canon every aggregate was gated against;
    *   - binary→string drift (`documents.text` re-encoded as BYTE_ARRAY
    *     without the UTF8 annotation): reinterpret as UTF-8 string;
    *   - anything else: throw, loudly naming the column — a silent
    *     best-effort cast here is how a drift becomes a wrong-answer
    *     round instead of a one-line fix.
    */
  private[graft] def conform(df: DataFrame, want: (String, org.apache.spark.sql.types.DataType)*): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    // nullability-insensitive equality (DataType.sameType is private[sql])
    def stripNull(t: DataType): DataType = t match {
      case ArrayType(e, _)    => ArrayType(stripNull(e), containsNull = true)
      case MapType(k, v, _)   => MapType(stripNull(k), stripNull(v), valueContainsNull = true)
      case StructType(fields) => StructType(fields.map(f =>
        f.copy(dataType = stripNull(f.dataType), nullable = true)))
      case other              => other
    }
    // An ABSENT column is not policed here: partial fixtures (tests,
    // projected exports) load fine, and a query referencing the missing
    // column already fails loudly at analysis with the column name.
    want.filter { case (name, _) => df.columns.contains(name) }
      .foldLeft(df) { case (d, (name, tgt)) =>
      val have = d.schema(name).dataType
      if (stripNull(have) == stripNull(tgt)) d
      else {
        val convertible = (have, tgt) match {
          case (h, t) if integral(h) && integral(t) => true
          case (FloatType, DoubleType) | (DoubleType, FloatType) => true
          case (ArrayType(he, _), ArrayType(te, _)) =>
            Set[DataType](FloatType, DoubleType)(he) &&
              Set[DataType](FloatType, DoubleType)(te)
          case (BinaryType, StringType) => true
          case _                        => false
        }
        if (!convertible)
          throw new IllegalArgumentException(
            s"cannot conform column $name: loaded $have, canonical $tgt")
        val rank = Map[DataType, Int](
          ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
        val casted =
          if (integral(have) && integral(tgt) && rank(have) > rank(tgt)) {
            // NARROWING integral drift: with ANSI off, a drifted id above
            // the target range would WRAP to a wrong value silently —
            // contradicting the throw-loudly policy above. Guard per row
            // (codegen'd, no extra pass over the data) and raise naming
            // the column; in-range values cast exactly as before.
            val (lo, hi) = tgt match {
              case ByteType  => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
              case ShortType => (Short.MinValue.toLong, Short.MaxValue.toLong)
              case _         => (Int.MinValue.toLong, Int.MaxValue.toLong)
            }
            when(col(name).isNull, lit(null).cast(tgt))
              .when(col(name).between(lo, hi), col(name).cast(tgt))
              .otherwise(raise_error(format_string(
                s"conform: column $name value %s out of range for $tgt",
                col(name).cast("string"))).cast(tgt))
          } else col(name).cast(tgt)
        d.withColumn(name, casted)
      }
    }
  }

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
