package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{ExecutionContext, Future}

import graft.SparkSuite

/** R9 `orderedWait` — the two properties the multiset oracle cannot see
  * (VERDICT r01 "What's wrong" #1): output order == input order per
  * partition, and at most `capacity` requests in flight. */
object AsyncProbe {
  // Shared across executor threads (local mode = one JVM).
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  def reset(): Unit = { inFlight.set(0); maxInFlight.set(0) }
  def tracked(x: Long): Future[Long] = {
    val now = inFlight.incrementAndGet()
    maxInFlight.updateAndGet(m => math.max(m, now))
    Future {
      // Variable latency: later elements often finish FIRST, so an
      // implementation that emitted on completion order would fail.
      Thread.sleep(x % 5)
      inFlight.decrementAndGet()
      x * 2
    }(ExecutionContext.global)
  }
}

class AsyncMapSpec extends SparkSuite {
  // error-path tests below deliberately fail tasks: the stalled-future
  // deadline test surfaces a TimeoutException through the job
  override protected def expectedTaskFailureSubstrings: Seq[String] =
    Seq("TimeoutException")

  import spark.implicits._

  test("R9 output order equals input order within each partition") {
    val n = 2000
    val ds = spark.range(n).as[Long].repartition(4)
    val inputOrder = ds.mapPartitions(it => Iterator.single(it.toSeq)).collect()
    val outputOrder = AsyncMap.orderedWait(ds)(AsyncProbe.tracked)
      .mapPartitions(it => Iterator.single(it.toSeq)).collect()
    val inSorted = inputOrder.map(_.map(_ * 2)).sortBy(_.headOption.getOrElse(-1L)).toSeq
    val outSorted = outputOrder.sortBy(_.headOption.getOrElse(-1L)).toSeq
    assert(outSorted === inSorted) // per-partition sequences, in order
  }

  test("R9 at most `capacity` requests in flight; pipelining actually happens") {
    AsyncProbe.reset()
    val out = AsyncMap.orderedWait(spark.range(500).as[Long].coalesce(1),
      capacity = 10)(AsyncProbe.tracked).collect()
    assert(out.toSeq === (0L until 500L).map(_ * 2))
    assert(AsyncProbe.maxInFlight.get() <= 10,
      s"capacity bound violated: ${AsyncProbe.maxInFlight.get()}")
    assert(AsyncProbe.maxInFlight.get() >= 2,
      "no pipelining observed — orderedWait degenerated to sequential awaits")
  }

  test("R9 a stalled future FAILS the task at the deadline instead of hanging the stream") {
    // Flink's orderedWait with a timeout treats an async result that
    // misses the deadline as an error (AsyncIOExample.scala:34 uses 10 s);
    // the Spark twin must surface a TimeoutException through the job,
    // not block the partition forever. Element 7 never completes.
    import scala.concurrent.Promise
    import scala.concurrent.duration._
    val t0 = System.nanoTime()
    val e = intercept[org.apache.spark.SparkException] {
      AsyncMap.orderedWait(spark.range(20).as[Long].coalesce(1),
        timeout = 2.seconds) { x =>
        if (x == 7L) Promise[Long]().future // stalls forever
        else AsyncMap.identityAsync(x)
      }.collect()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a TimeoutException in the cause chain, got: ${chain(e).map(_.getClass.getName)}")
    // failed AT the deadline (one 2 s await), not after some multiple of it
    assert(sec < 15.0, s"timeout path took $sec s — stream effectively hung")
  }

  test("R9 identity function is an order-preserving pass-through") {
    val out = AsyncMap.orderedWait(spark.range(100).as[Long].coalesce(1))(
      AsyncMap.identityAsync[Long]).collect().toSeq
    assert(out === (0L until 100L))
  }
}
