package graft.streaming

/** Deterministic snapshot-upload starvation for one named RocksDB
  * state-store partition (r17 verdict item 3).
  *
  * The endurance soaks established that store-level upload starvation
  * is restart-timing-stochastic (SOAK_MAINT1/8_R17: a store that never
  * lands a maintenance window between stop cycles), and the recovery
  * probe priced the consequence globally by suppressing EVERY upload
  * via `minDeltasForSnapshot`. This injection closes the loop
  * end-to-end: the provider class
  * ([[org.apache.spark.sql.execution.streaming.state.GraftStarvedRocksDBProvider]],
  * a one-line subclass living in the owning package because the parent
  * is `private[sql]`) no-ops `doMaintenance()` — snapshot upload + file
  * cleanup — for exactly the partition named by the
  * `graft.starved.partition` system property, so a soak can INJECT the
  * stochastic failure mode on a store it chose, then assert the
  * per-partition census names that store and the resume price matches
  * the measured per-version model.
  *
  * Injection-only: local-mode soaks and specs share one JVM, so a
  * system property reaches the maintenance thread; production clusters
  * never load this class (the soak mains set the provider conf
  * explicitly). Commit-path behavior (changelog writes) is untouched —
  * correctness rides the changelog exactly as with a genuinely starved
  * store. */
object StarvedRocksDBProvider {
  /** Fully-qualified provider class name for
    * `spark.sql.streaming.stateStore.providerClass`. */
  val ProviderClass: String =
    classOf[org.apache.spark.sql.execution.streaming.state.GraftStarvedRocksDBProvider].getName

  /** System property naming the starved partition id(s), comma
    * separated; unset/empty/unparsable tokens starve nothing. */
  val PartitionProp = "graft.starved.partition"

  def isStarved(partitionId: Int): Boolean =
    decide(partitionId, sys.props.get(PartitionProp))

  /** Pure decision for the spec: which partition ids does a property
    * value starve. */
  private[streaming] def decide(partitionId: Int, prop: Option[String]): Boolean =
    prop.exists(_.split(",").flatMap(_.trim.toIntOption).contains(partitionId))

  /** Partition id of one SnapshotLastUploaded instance-metric key,
    * e.g. "SnapshotLastUploaded.partition_8_default" → 8. */
  def partitionOf(key: String): Option[Int] =
    "partition_([0-9]+)".r.findFirstMatchIn(key).map(_.group(1).toInt)
}
