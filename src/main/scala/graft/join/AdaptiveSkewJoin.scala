package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Profile-driven join-strategy selection — closes the loop the skew
  * profiler opens ([[graft.rel.Analytics.skewProfile]] is "the query you
  * run BEFORE choosing a join strategy at 100 TB"; this is the choosing).
  *
  * The decision mirrors what an engineer reads off the profile:
  *  - small side fits a broadcast budget → broadcast hash join (no
  *    shuffle of the big side at all; skew is irrelevant when the hot
  *    key never crosses the wire);
  *  - hottest key's row count exceeds `skewFactor`× the average
  *    post-shuffle partition → [[SaltedJoin]] with just enough salts to
  *    bring the hot partition back to target size (capped at the
  *    shuffle parallelism — more salts than reducers buys nothing);
  *  - otherwise → plain shuffled equi-join, the cheapest correct plan.
  *
  * All three strategies produce the SAME ROWS — strategy is a physical
  * choice, never a semantic one (spec-asserted on skewed and flat
  * fixtures). The profile consumed here is the log2 histogram (≤ ~64
  * rows at any scale: buckets are key-count magnitudes), so `pick` costs
  * one tiny collect; the profiling pass itself is the explicit price of
  * an informed plan and is run once per (table, key), not per join. */
object AdaptiveSkewJoin {

  sealed trait Strategy
  /** Plain shuffled equi-join: flat profile, no broadcast fit. */
  case object Plain extends Strategy
  /** Broadcast the small side: skew-immune, zero big-side shuffle. */
  case object BroadcastSmall extends Strategy
  /** Salt the big side `salts` ways and replicate the small side. */
  final case class Salted(salts: Int) extends Strategy

  /** Choose a strategy from a [[graft.rel.Analytics.skewProfile]] frame
    * (bucket, n_keys, n_rows, max_cnt) of the BIG side's join key.
    *
    * `smallRows` is the small side's row count (the caller usually knows
    * it; counting it here would hide a full pass inside a "cheap" pick).
    * `broadcastMaxRows` is a row-count stand-in for the byte budget
    * `spark.sql.autoBroadcastJoinThreshold` expresses — row counts are
    * what the profile speaks, and the caller can translate bytes/row. */
  def pick(profile: DataFrame, smallRows: Long, shufflePartitions: Int,
           broadcastMaxRows: Long = 1000000L,
           skewFactor: Double = 4.0): Strategy = {
    require(shufflePartitions > 0 && broadcastMaxRows >= 0 && skewFactor > 0)
    if (smallRows <= broadcastMaxRows) BroadcastSmall
    else {
      val rows = profile.select(col("n_rows"), col("max_cnt")).collect()
      val total = rows.map(_.getLong(0)).sum
      val hottest = if (rows.isEmpty) 0L else rows.map(_.getLong(1)).max
      val target = math.max(1L, total / shufflePartitions)
      if (hottest > skewFactor * target)
        Salted(math.min(shufflePartitions.toLong,
          math.ceil(hottest.toDouble / target).toLong).toInt)
      else Plain
    }
  }

  /** Execute the picked strategy. Output columns are big ++ small (both
    * key columns retained), identical across strategies. */
  def join(big: DataFrame, bigKey: String, small: DataFrame,
           smallKey: String, strategy: Strategy): DataFrame = strategy match {
    case BroadcastSmall =>
      big.join(broadcast(small), big(bigKey) === small(smallKey), "inner")
    case Plain =>
      big.join(small, big(bigKey) === small(smallKey), "inner")
    case Salted(s) =>
      SaltedJoin.inner(big, bigKey, small, smallKey, s)
  }

  /** Count-with-ceiling: how many rows `df` has, capped at `ceiling` —
    * `limit(ceiling)` keeps the probe LOCAL-bounded (each task stops
    * after its share of the limit; a LocalLimit caps every scan task),
    * so a misjudged "small" side costs a bounded probe, not a full
    * scan. Callers only ever compare the result against thresholds
    * < ceiling, so the truncation is invisible to the decision. */
  def countAtMost(df: DataFrame, ceiling: Long): Long = {
    require(ceiling > 0 && ceiling <= Int.MaxValue.toLong,
      s"ceiling must be in (0, 2^31): $ceiling")
    df.limit(ceiling.toInt).count()
  }

  /** Profile-then-join in one call: profiles the big side's key, picks,
    * executes. The profiling pass over the big side is the documented
    * cost of an informed plan — at 100 TB one linear scan buys freedom
    * from a straggler reducer that would otherwise dominate the stage.
    * The small side is only PROBED (count capped at
    * broadcastMaxRows + 1 via limit), so a caller who misjudges which
    * side is small pays a bounded peek, not a second full scan.
    *
    * Callers joining the same big table in a loop should NOT use this
    * convenience form — it re-profiles on every call. Profile once with
    * [[graft.rel.Analytics.skewProfile]] (and count the small side
    * once), then use the cached-profile overload below / [[pick]] +
    * [[join]] directly. */
  def autoJoin(big: DataFrame, bigKey: String, small: DataFrame,
               smallKey: String, broadcastMaxRows: Long = 1000000L,
               skewFactor: Double = 4.0): DataFrame =
    autoJoin(big, bigKey, small, smallKey,
      graft.rel.Analytics.skewProfile(big, bigKey),
      countAtMost(small, broadcastMaxRows + 1),
      broadcastMaxRows, skewFactor)

  /** Cached-profile overload: the loop-safe form — the caller profiled
    * the big side and counted (or ceiling-counted) the small side once,
    * and reuses both across many joins. `smallRows` may be any value
    * > broadcastMaxRows to mean "too big to broadcast" (exactness above
    * the threshold never changes the decision). */
  def autoJoin(big: DataFrame, bigKey: String, small: DataFrame,
               smallKey: String, profile: DataFrame, smallRows: Long,
               broadcastMaxRows: Long, skewFactor: Double): DataFrame = {
    val parts = big.sparkSession.sessionState.conf.numShufflePartitions
    val strategy = pick(profile, smallRows, parts, broadcastMaxRows, skewFactor)
    join(big, bigKey, small, smallKey, strategy)
  }
}
