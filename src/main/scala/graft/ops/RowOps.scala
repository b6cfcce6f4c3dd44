package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level parse / filter / JSON transforms (SURVEY.md §2.3 R4/R6/R8,
  * §2.7 F4/F6–F9).
  *
  * - R6 (`TopSpeedWindowing.scala:132-135`): strip enclosing parens with
  *   `substring(1, len-1)`, split on `,`, cast fields Int/Int/Double/Long.
  * - R8 (`TwitterExample.java:97-102`): lowercase string-equality filter.
  * - R4/F9 (`TwitterExample.java:131-169`): schema-on-read JSON field
  *   access; here `from_json` with an explicit schema so Catalyst prunes
  *   the parse to the referenced fields.
  */
object RowOps {

  /** R6 round-trip on the events table: serialize each event to the
    * reference's "(a,b,c,d)" text form, then parse it back with
    * substring+split+cast. Exercises F3/F6/F8/F11 end-to-end while staying
    * fully expressible in ANSI SQL for the oracle. */
  def parseCast(events: DataFrame): DataFrame = {
    val line = concat(
      lit("("), col("event_id"), lit(","), col("user_id"), lit(","),
      col("value"), lit(","), col("ts_sec"), lit(")"))
    val stripped = substring(line, lit(2), length(line) - 2)
    val f = split(stripped, ",")
    events
      .select(f.as("f"))
      .select(
        element_at(col("f"), 1).cast("bigint").as("event_id"),
        element_at(col("f"), 2).cast("bigint").as("user_id"),
        element_at(col("f"), 3).cast("double").as("value"),
        element_at(col("f"), 4).cast("bigint").as("ts_sec"))
      .select(
        col("event_id"), col("user_id"),
        // F11 Math.min/max clamp parity (least/greatest)
        least(greatest(col("value"), lit(0.0)), lit(100000.0)).as("value"),
        col("ts_sec"))
  }

  /** R8 equality filter (lowercased). Pushed down to the parquet scan. */
  def filterEq(df: DataFrame, colName: String, needle: String): DataFrame =
    df.filter(lower(col(colName)) === lit(needle.toLowerCase))

  /** Minimal schema of the events `props` JSON column ({"k": int}). */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** R4/F9: parse the JSON props column and project a nested field.
    * `from_json` + struct access beats `get_json_object` in the hot path:
    * one parse, schema-pruned, codegen-friendly. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .filter(col("k").isNotNull)

  /** Fault-tolerant JSON field extraction: corrupt payloads yield a NULL
    * field and `is_valid = false` instead of failing the job — the
    * ingest-robustness contract (a 100 TB crawl WILL contain garbage;
    * one bad record must cost one row, not the stage).
    *
    * Cross-engine caveat, measured: Spark's `get_json_object` (Jackson)
    * stops at the end of the first complete JSON value and so TOLERATES
    * trailing garbage (`{"k":1}x` → 1), while DuckDB's `json_valid`
    * rejects it. Leading corruption is rejected by both. Oracle checks
    * therefore corrupt the PREFIX; treat trailing-garbage acceptance as
    * engine-defined. */
  def tryJsonExtract(df: DataFrame, rawCol: String, field: String): DataFrame = {
    val k = get_json_object(col(rawCol), s"$$.$field").cast("long")
    df.select(col("event_id"), k.as(field), k.isNotNull.as("is_valid"))
  }
}
