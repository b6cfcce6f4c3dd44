package graft.ops

import org.apache.spark.sql.Dataset
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.reflect.ClassTag

/** R9: ordered async map — `AsyncDataStream.orderedWait(in, timeout,
  * capacity)(f)` (`AsyncIOExample.scala:40-45`; SURVEY.md §2.3 R9).
  *
  * Per input record an async lookup is issued; at most `capacity` requests
  * are in flight at once; OUTPUT ORDER equals INPUT ORDER within each
  * partition (Flink's orderedWait guarantee is per parallel subtask, which
  * maps exactly to a Spark partition). Implemented on `mapPartitions` — no
  * Catalyst work needed, stays fully distributed, no driver involvement.
  */
object AsyncMap {

  def orderedWait[I, O: ClassTag](ds: Dataset[I], timeout: FiniteDuration = 10.seconds,
                                  capacity: Int = 10)(f: I => Future[O])(
      implicit enc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    require(capacity > 0, "capacity must be positive")
    ds.mapPartitions { it =>
      // Sliding window of at most `capacity` in-flight Futures; results
      // are awaited and emitted strictly in input order.
      new Iterator[O] {
        private val inflight = scala.collection.mutable.Queue.empty[Future[O]]
        private def fill(): Unit =
          while (inflight.size < capacity && it.hasNext) inflight += f(it.next())
        def hasNext: Boolean = { fill(); inflight.nonEmpty }
        def next(): O = { fill(); Await.result(inflight.dequeue(), timeout) }
      }
    }
  }

  /** The reference example's async function is an identity lookup on
    * `ExecutionContext.global` (`AsyncIOExample.scala:40-45`). */
  def identityAsync[T](x: T): Future[T] = Future(x)(ExecutionContext.global)
}
