package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.LongType

/** Accumulates `observe()` metrics across ALL micro-batches of every
  * streaming query in the session.
  *
  * Why not `query.recentProgress`: that is a RING BUFFER capped at
  * `spark.sql.streaming.numRecentProgressUpdates` (default 100). A
  * funnel summed from it is exact for a short backfill and silently
  * loses every batch but the last 100 on a long-running ingest — at one
  * micro-batch per few seconds a day-long run under-reports by ~99%.
  * The listener bus delivers every progress event regardless of run
  * length, so totals here are O(1) state per (run, metric) and correct
  * for arbitrarily many batches.
  *
  * Only LONG-typed observed fields are accumulated (the funnel counter
  * shape); other types are ignored rather than mis-summed. Thread-safe:
  * the bus is single-threaded per event type but `totals` may be read
  * from the main thread concurrently.
  */
final class FunnelListener extends StreamingQueryListener {
  private val acc = new ConcurrentHashMap[(UUID, String, String), AtomicLong]
  private val done = ConcurrentHashMap.newKeySet[UUID]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.observedMetrics.forEach { (obs, row) =>
      val schema = row.schema
      if (schema != null) schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (f.dataType == LongType && !row.isNullAt(i))
          acc.computeIfAbsent((p.runId, obs, f.name), _ => new AtomicLong)
            .addAndGet(row.getLong(i))
      }
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    done.add(e.runId)

  /** Accumulated total for one (run, observation, field); 0 if that
    * metric never fired (an empty backlog produces no batches). */
  def total(runId: UUID, obs: String, field: String): Long = {
    val v = acc.get((runId, obs, field))
    if (v == null) 0L else v.get()
  }

  /** The listener bus is async: progress events for the final batch can
    * arrive AFTER `awaitTermination` returns. The termination event is
    * posted after all progress events for the run, so once it lands the
    * totals are complete. Returns false on timeout. */
  def awaitTerminated(runId: UUID, timeoutMs: Long = 30000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!done.contains(runId) && System.nanoTime() < deadline)
      Thread.sleep(50)
    done.contains(runId)
  }

  /** Attach a fresh listener to the session. Callers keep the reference
    * and should `spark.streams.removeListener` it when done (tests). */
  def register(spark: SparkSession): FunnelListener = {
    spark.streams.addListener(this)
    this
  }
}
