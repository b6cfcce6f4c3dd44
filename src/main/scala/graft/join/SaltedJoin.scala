package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the big (skewed) side's key into
  * `salts` sub-keys and replicate the small side once per salt, so a hot
  * key's rows spread over `salts` reducers instead of one straggler task.
  *
  * This is the classic manual remedy when AQE's skew-join split cannot
  * apply (e.g. the skewed side feeds an aggregation in the same stage,
  * or partition-size stats are unavailable). The salt is deterministic
  * (pmod of a hash of the row, not rand()) so retried tasks produce
  * identical output — load-bearing for exactly-once sinks.
  *
  * Cost model: replicates the SMALL side `salts`× (map-side, no extra
  * shuffle of the big side beyond the join's own exchange). Choose
  * `salts` ≈ (hot-key rows / target-partition rows), bounded by the
  * small side's replication budget.
  */
object SaltedJoin {

  /** Inner equi-join `big(bigKey) == small(smallKey)` with `salts`-way
    * key salting. Column sets must be disjoint (like a raw `join`).
    *
    * `saltBy` chooses the salt input: pass a UNIQUE id column (preferred
    * — byte-identical duplicate rows then spread across sub-keys too);
    * None hashes the whole row, which keeps determinism but cannot
    * separate byte-identical duplicates (they share a hash). */
  def inner(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
            salts: Int, saltBy: Option[String] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic per-row salt on the big side: spreads a hot key's
    // rows across `salts` sub-keys and is stable under task retry
    // (unlike rand()/monotonically_increasing_id()).
    val saltSrc = saltBy.map(c => xxhash64(col(c)))
      .getOrElse(xxhash64(struct(big.columns.map(col): _*)))
    val saltedBig = big.withColumn("__salt",
      pmod(saltSrc, lit(salts)).cast("int"))
    // Replicate the small side once per salt value.
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"), "inner")
      .drop("__salt")
  }
}
