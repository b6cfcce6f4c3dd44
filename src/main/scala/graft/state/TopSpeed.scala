package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** W3–W5: GlobalWindow + TimeEvictor(10 s) + DeltaTrigger(50 m) arg-max —
  * the one genuinely custom stateful operator in the reference
  * (`TopSpeedWindowing.scala:105-121`; SURVEY.md §2.5).
  *
  * Semantics (per car): buffer events; when an event arrives whose
  * `distance` is ≥ `triggerMeters` beyond the last-fired event's distance,
  * first evict buffered events older than `evictionSec` before the newest,
  * then emit the buffered record with max speed, and remember the firing
  * element. Flink applies the evictor before the window function on fire.
  *
  * Streaming form: `flatMapGroupsWithState` (update mode) — state is
  * (buffer, lastFiredDistance). Batch/oracle form: max speed per
  * `(carId, floor(distance / triggerMeters))` bucket — identical output on
  * deterministic ascending input (SURVEY.md §7.2 M4).
  */
object TopSpeed {

  /** `seq` is a per-car monotone arrival number (event_id for derived
    * events, the rate counter for the simulator): it totalizes the
    * processing order when `time` (ms-truncated) and `distance` tie —
    * e.g. zero-speed events inside one millisecond — keeping the state
    * machine's order identical to the oracle's (ts_us, event_id) sort
    * (r2 ADVICE). Speeds must be non-negative so distance is monotone
    * in arrival order. */
  case class CarEvent(carId: Int, speed: Int, distance: Double, time: Long,
                      seq: Long)
  case class CarState(buffer: List[CarEvent], lastFired: Double)

  /** The state-machine core shared by BOTH state APIs (the
    * flatMapGroupsWithState path and the transformWithState processor):
    * fold a time-ordered slice of one car's events into (next state,
    * emissions). Pure function — the two runtimes can never diverge. */
  def advance(prev: CarState, events: Seq[CarEvent], evictionMs: Long,
              triggerMeters: Double): (CarState, Seq[CarEvent]) = {
    var buffer = prev.buffer
    var lastFired = prev.lastFired
    val out = scala.collection.mutable.ArrayBuffer.empty[CarEvent]
    // (time, distance, seq): distance carries the sub-millisecond arrival
    // order (it is a cumulative sum in arrival order), seq settles
    // zero-speed ties — together this reproduces the oracle's
    // (ts_us, event_id) processing order exactly
    events.sortBy(e => (e.time, e.distance, e.seq)).foreach { e =>
      buffer = e :: buffer
      if (e.distance - lastFired >= triggerMeters) {
        val horizon = buffer.map(_.time).max - evictionMs
        buffer = buffer.filter(_.time >= horizon) // TimeEvictor, pre-fire
        // arg-max tie chain mirrors the oracle's ORDER BY speed DESC,
        // time DESC, rn DESC: among equal (speed, time), the latest
        // arrival — whose distance is maximal — is emitted
        out += buffer.maxBy(b => (b.speed, b.time, b.distance, b.seq))
        lastFired = e.distance                     // DeltaTrigger reset
      }
    }
    (CarState(buffer, lastFired), out.toSeq)
  }

  /** Streaming/typed implementation, usable on both bounded and unbounded
    * `Dataset[CarEvent]`. Events within a group are processed in `time`
    * order (micro-batch granularity: the loop fires as many times as the
    * data demands — SURVEY.md §7.4(3)). */
  def topSpeedStateFn(evictionMs: Long, triggerMeters: Double)(
      carId: Int, events: Iterator[CarEvent], state: GroupState[CarState]): Iterator[CarEvent] = {
    val (next, out) = advance(state.getOption.getOrElse(CarState(Nil, 0.0)),
      events.toSeq, evictionMs, triggerMeters)
    state.update(next)
    out.iterator
  }

  /** Apply the stateful op to a typed dataset (works in batch too; in
    * streaming wrap with withWatermark upstream and OutputMode.Update). */
  def run(ds: Dataset[CarEvent], evictionMs: Long = 10000L,
          triggerMeters: Double = 50.0): Dataset[CarEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.carId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        topSpeedStateFn(evictionMs, triggerMeters))
  }

  /** The same operator on Spark 4's arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`) —
    * the forward-looking runtime with per-state-variable storage, TTL and
    * timer support. Wraps the SAME `advance` core, so
    * `TopSpeedSpec`/`StreamingSpec` can assert both APIs emit identically.
    * Streaming runs require the RocksDB state store provider. */
  class TopSpeedProcessor(evictionMs: Long, triggerMeters: Double)
      extends StatefulProcessor[Int, CarEvent, CarEvent] {
    @transient private var state: ValueState[CarState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CarState]("topSpeedState",
        Encoders.product[CarState], TTLConfig.NONE)
    override def handleInputRows(carId: Int, rows: Iterator[CarEvent],
                                 timerValues: TimerValues): Iterator[CarEvent] = {
      val prev = Option(state.get()).getOrElse(CarState(Nil, 0.0))
      val (next, out) = advance(prev, rows.toSeq, evictionMs, triggerMeters)
      state.update(next)
      out.iterator
    }
  }

  /** `run`'s twin on the v2 state API. */
  def runTws(ds: Dataset[CarEvent], evictionMs: Long = 10000L,
             triggerMeters: Double = 50.0): Dataset[CarEvent] = {
    import ds.sparkSession.implicits._
    // BATCH transformWithState still loads a real state store, whose
    // snapshot reporting needs the StateStoreCoordinator RPC endpoint —
    // created only when the StreamingQueryManager initializes. Touching
    // `streams` bootstraps it; without this a pure-batch session fails
    // with CANNOT_LOAD_STATE_STORE / RpcEndpointNotFoundException.
    ds.sparkSession.streams
    ds.groupByKey(_.carId)
      .transformWithState(new TopSpeedProcessor(evictionMs, triggerMeters),
        TimeMode.None(), OutputMode.Update)
  }

  /** Deterministic CarEvent derivation from the events table (FIXTURES.md
    * §B): carId = user_id % cars, speed = value, distance = running sum of
    * speed/3.6 per car ordered by (ts_us, event_id), time = epoch ms.
    * Ordering uses MICROsecond granularity + event_id tiebreak: DuckDB
    * truncates the parquet NANOS timestamps to micros on read, so a
    * nanosecond sort key would order ties differently across engines.
    *
    * The cumulative distance runs in INTEGER space: values carry exactly
    * 2 decimals, so `round(speed*100)` is an exact BIGINT, its window sum
    * is exact, and the single `/360.0` per row rounds once — making
    * `distance` bit-identical across engines. (A running DOUBLE sum is
    * NOT: DuckDB's windowed SUM is not a sequential fold, and the last
    * few bits diverge.) */
  def carEvents(events: DataFrame, cars: Int): DataFrame = {
    val w = Window.partitionBy(col("carId")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(
        (col("user_id") % cars).cast("int").as("carId"),
        col("value").as("speed"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      .withColumn("distance",
        sum(round(col("speed") * 100).cast("long")).over(w) / 360.0)
      .select(col("carId"), col("speed").as("speed"), col("distance"),
        expr("ts_us div 1000").as("time"), col("event_id"),
        col("event_id").as("seq"))
  }

  /** Batch/oracle reformulation: per (carId, floor(distance/trigger))
    * bucket, the max speed and the event attaining it (tie → max id).
    * Output names are lowercase (`car_id`) so the DuckDB oracle's
    * case-folded identifiers line up. */
  def topSpeedBuckets(events: DataFrame, cars: Int, triggerMeters: Double): DataFrame = {
    val ce = carEvents(events, cars)
    val w = Window.partitionBy(col("carId"), col("bucket"))
      .orderBy(col("speed").desc, col("event_id").desc)
    ce.withColumn("bucket", floor(col("distance") / triggerMeters))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("carId").as("car_id"), col("bucket"),
        col("speed").as("top_speed"), col("event_id"))
  }
}
