package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level tokenization transforms (SURVEY.md §2.3 R1/R2/R3/R5, §2.7 F1–F5).
  *
  * Reference semantics:
  *  - R1 (`WordCount.java:106-122`, `PojoExample.java:145-160`): lowercase,
  *    split on `\W+`, drop empty tokens, emit `(word, 1)`.
  *  - R2 (`SocketWindowWordCount.scala:62`): split on `\s`.
  *  - R3 (`TwitterExample.java:84-97`): if ANY token equals the needle
  *    (case-insensitively), emit ALL tokens uppercased; else emit nothing.
  *
  * All are pure Catalyst expressions (codegen'd, no UDFs): at 100 TB the
  * explode runs map-side with no shuffle; only the downstream groupBy
  * shuffles, with partial aggregation (map-side combine) applied first.
  */
object Tokenize {

  /** `\W+` tokens of `lower(col)`, empties dropped (R1). */
  def words(text: Column): Column =
    filter(split(lower(text), "\\W+"), w => length(w) > 0)

  /** Explode a text column into one `word` row per token (R1). */
  def explodeWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("word"))

  /** Word count over a text column: scan → project → explode → shuffle agg.
    * The whole spine of the engine (SURVEY.md §7.2 M0). */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    explodeWords(df, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Whitespace (`\s`) tokenizer word count (R2). The reference splits on
    * single whitespace chars, so runs of spaces produce empty tokens; the
    * reference keeps them (no filter in `SocketWindowWordCount.scala:62`),
    * but downstream the map to `(w, 1)` counts them too. We keep exact
    * parity: no empty-drop here. */
  def wordCountWs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** R3 conditional fan-out: rows whose token set contains `needle`
    * (case-insensitive) emit all their tokens uppercased.
    * Tokens are materialized once and the needle test selects the array
    * (explode of an empty array drops the row) — a `filter` formulation
    * would be pushed below the projection and re-run the tokenizer, and
    * HOFs evaluate interpreted (see Dedup notes). */
  def conditionalFanout(df: DataFrame, textCol: String, needle: String): DataFrame =
    df.select(words(col(textCol)).as("tk"))
      .select(when(exists(col("tk"), w => w === lit(needle.toLowerCase)), col("tk"))
        .otherwise(array().cast("array<string>")).as("tk"))
      .select(explode(col("tk")).as("w"))
      .select(upper(col("w")).as("word"))
}
