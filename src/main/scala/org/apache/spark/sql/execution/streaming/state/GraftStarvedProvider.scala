package org.apache.spark.sql.execution.streaming.state

/** Package-bridge for [[graft.streaming.StarvedRocksDBProvider]]'s
  * injection mechanism: `RocksDBStateStoreProvider` is `private[sql]`
  * at the Scala level (JVM-public — Spark instantiates providers
  * reflectively from the public `stateStore.providerClass` conf), so
  * the one-line subclass lives in the owning package and everything
  * else (the starvation decision, key parsing, documentation) stays in
  * graft.streaming. `doMaintenance()` is the hook the maintenance pool
  * calls for snapshot upload + file cleanup; skipping it for the named
  * partition reproduces a genuinely starved store — commit-path
  * changelog writes are untouched. */
class GraftStarvedRocksDBProvider extends RocksDBStateStoreProvider {
  override def doMaintenance(): Unit =
    if (!graft.streaming.StarvedRocksDBProvider.isStarved(stateStoreId.partitionId))
      super.doMaintenance()
}
