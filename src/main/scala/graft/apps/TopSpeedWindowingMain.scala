package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Args, GraftSession, Tables}
import graft.sinks.Sinks
import graft.sources.Sources
import graft.state.TopSpeed

/** Runnable mirror of `TopSpeedWindowing.scala:59-126`: car-event stream
  * → per-car delta-trigger/evictor arg-max (W3-W5).
  *
  * Default: batch — CarEvents derived deterministically from the events
  * table (the oracle-checked path), printed. `--stream` runs the S5
  * simulator twin: a rate source driving `cars` cars whose speed follows
  * a deterministic profile with closed-form cumulative distance (the
  * reference's seeded random walk needs per-tick state; a stateless
  * profile keeps the source a pure map over the rate counter, which is
  * what scales), through the same stateful operator, update mode.
  *
  * Usage: --cars 2 --rate 20 --stream --runSeconds 10
  */
object TopSpeedWindowingMain {

  /** S5 twin: (carId, speed, distance, time) from the rate counter.
    * speed(t) = 50 + 30·sin(t/10 + carId) km/h; distance is its exact
    * integral over 100 ms ticks, so distance is monotone and the delta
    * trigger fires roughly every ~65 ticks like the reference's walk. */
  def carSim(spark: SparkSession, cars: Int, rowsPerSecond: Long): DataFrame =
    Sources.rateStream(spark, rowsPerSecond)
      .select(
        (col("value") % cars).cast("int").as("carId"),
        (col("value") / cars).cast("double").as("tick"),
        col("timestamp"), col("value"))
      .select(
        col("carId"),
        (lit(50.0) + lit(30.0) * sin(col("tick") / 10 + col("carId")))
          .cast("int").as("speed"),
        // ∫ (50 + 30 sin(u/10 + c)) du / 36 over [0, tick] (km/h → m per 100ms tick)
        ((lit(50.0) * col("tick")
          - lit(300.0) * cos(col("tick") / 10 + col("carId"))
          + lit(300.0) * cos(col("carId"))) / 36.0).as("distance"),
        unix_millis(col("timestamp")).as("time"),
        col("value").as("seq"))

  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("topspeed-windowing")
    import spark.implicits._
    val cars = a.getOrElse("cars", "2").toInt
    if (a.has("stream")) {
      val events = carSim(spark, cars, a.getOrElse("rate", "20").toLong)
        .as[TopSpeed.CarEvent]
      val q = Sinks.consoleStream(TopSpeed.run(events).toDF(), "update").start()
      a.get("runSeconds") match {
        case Some(s) => q.awaitTermination(s.toLong * 1000); q.stop(); spark.stop()
        case None => q.awaitTermination()
      }
    } else {
      val ce = TopSpeed.carEvents(
        Tables.events(spark, a.getOrElse("data", "/root/testdata/sf0.001")), cars)
        .selectExpr("carId", "cast(speed as int) as speed", "distance", "time", "seq")
        .as[TopSpeed.CarEvent]
      Sinks.print(TopSpeed.run(ce).toDF())
      spark.stop()
    }
  }
}
