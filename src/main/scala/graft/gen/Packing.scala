package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate documents into fixed-budget
  * training sequences" step of a pretraining pipeline, as a deterministic
  * relational operator.
  *
  * Greedy CONTIGUOUS packing per shard: docs are deterministically
  * sharded (`id mod shards`), ordered by id within the shard, and a doc
  * opens bin `floor(cum_before / budget)` — bins fill in id order and a
  * doc whose size straddles a boundary belongs to the bin it STARTED in
  * (how packed pretraining shards are actually laid out; the remainder
  * is the usual boundary-crossing token block).
  *
  * Scale shape: no global sort — the only shuffle is the per-shard
  * window partition, and `shards` is the parallelism knob (pick ≥
  * cluster cores; each shard's running sum is a linear scan). All
  * arithmetic is integer (cumulative sums of sizes, integer division),
  * so the result is bit-identical on any engine.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, sizeCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(sizeCol),
        // truncated `%` (sign of dividend), NOT pmod: the DuckDB oracle
      // computes `id % shards` and the two diverge on negative ids —
      // bit parity has to hold over the full id domain, not just the
      // non-negative testdata
      (col(idCol) % lit(shards)).cast("int").as("shard"))
      .withColumn("cum_size", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        expr(s"(cum_size - $sizeCol) div $budget").cast("bigint"))
      .select(col(idCol), col("shard"), col("cum_size"), col("bin"))
  }
}
