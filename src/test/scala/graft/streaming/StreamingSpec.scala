package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSuite
import graft.ops.TweetJson
import graft.state.TopSpeed
import graft.state.TopSpeed.CarEvent

/** End-to-end Structured Streaming twins (VERDICT r01 "Next round" #1):
  * every test drives a real `readStream`-equivalent source (MemoryStream)
  * through the SAME transformation function the batch oracle checks, and
  * asserts the streaming emissions equal the batch result. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def mem[A: Encoder]: MemoryStream[A] = MemoryStream[A](spark)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("A4 running word count in update mode reproduces the golden per-record sequence") {
    val ms = mem[String]
    // the SAME transformation as the batch englishWordCount — running in
    // update mode gives the per-batch running emission
    val wc = TweetJson.englishWordCount(ms.toDF(), "value")
    val q = wc.writeStream.format("memory").queryName("golden_wc")
      .outputMode("update").start()
    withQuery(q) {
      // One tweet per micro-batch = the reference's running emission
      // cadence at batch granularity (`TwitterExampleData.java:28`).
      TweetJson.FixtureTexts.foreach { t => ms.addData(t); q.processAllAvailable() }
      val got = spark.table("golden_wc").as[(String, Long)].collect().toSeq.sorted
      assert(got === TweetJson.GoldenRunningCounts.sorted)
    }
  }

  test("A4 exact per-record replay: ordered golden sequence from ONE micro-batch") {
    import graft.state.RunningCount
    // the same extraction the batch oracle uses yields the word arrivals
    // in tweet order; numbering them makes the interleaved emission order
    // assertable after the key shuffle — no one-record-per-batch crutch
    val words = TweetJson.englishWords(TweetJson.fixtureDf(spark), "json")
      .as[String].collect()
    val arrivals = words.zipWithIndex.map { case (w, i) =>
      RunningCount.WordIn(i.toLong, w)
    }
    val ms = mem[RunningCount.WordIn]
    val q = RunningCount.run(ms.toDS()).writeStream.format("memory")
      .queryName("rc_golden").outputMode("update").start()
    withQuery(q) {
      ms.addData(arrivals.toSeq: _*) // ALL records in one micro-batch
      q.processAllAvailable()
      val got = spark.table("rc_golden").as[RunningCount.WordOut].collect()
        .sortBy(_.seq).map(o => (o.word, o.cnt)).toSeq
      // the reference's exact per-record emission order
      // (TwitterExampleData.java:28): one update per input occurrence
      assert(got === Seq("apache" -> 1L, "flink" -> 1L, "apache" -> 2L,
        "flink" -> 2L, "apache" -> 3L, "flink" -> 3L))
      // counts keep rising across batches: state carries over
      ms.addData(RunningCount.WordIn(100L, "apache"))
      q.processAllAvailable()
      val last = spark.table("rc_golden").as[RunningCount.WordOut]
        .collect().maxBy(_.seq)
      assert(last === RunningCount.WordOut(100L, "apache", 4L))
    }
  }

  test("transformWithState TopSpeed twin streams on RocksDB == batch emissions") {
    val events = Seq(
      CarEvent(0, 30, 10.0, 0L, 0L), CarEvent(0, 50, 30.0, 1000L, 1000L),
      CarEvent(0, 40, 55.0, 2000L, 2000L), CarEvent(0, 60, 80.0, 3000L, 3000L),
      CarEvent(0, 20, 110.0, 4000L, 4000L), CarEvent(1, 10, 60.0, 0L, 0L))
    val batch = TopSpeed.run(events.toDS()).collect().toSeq
      .sortBy(e => (e.carId, e.time))
    // the v2 state API requires the RocksDB provider when streaming;
    // changelog checkpointing is the at-scale companion (per-batch
    // checkpoint uploads become incremental deltas instead of full
    // SST snapshots — the difference between O(changed keys) and
    // O(total state) per commit on a 100 TB keyspace)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      val ms = mem[CarEvent]
      val q = TopSpeed.runTws(ms.toDS()).writeStream.format("memory")
        .queryName("tws_topspeed").outputMode("update").start()
      withQuery(q) {
        events.grouped(2).foreach { g => ms.addData(g: _*); q.processAllAvailable() }
        val got = spark.table("tws_topspeed").as[CarEvent].collect().toSeq
          .sortBy(e => (e.carId, e.time))
        assert(got === batch)
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("RunningCount on transformWithState == flatMapGroupsWithState (batch + stream)") {
    import graft.state.RunningCount
    val ins = Seq(RunningCount.WordIn(0L, "a"), RunningCount.WordIn(1L, "b"),
      RunningCount.WordIn(2L, "a"), RunningCount.WordIn(3L, "a"))
    val v1 = RunningCount.run(ins.toDS()).collect().toSeq.sortBy(_.seq)
    val v2 = RunningCount.runTws(ins.toDS()).collect().toSeq.sortBy(_.seq)
    assert(v2 === v1)
    assert(v1.map(o => (o.word, o.cnt)) ===
      Seq("a" -> 1L, "b" -> 1L, "a" -> 2L, "a" -> 3L))
  }

  test("interval join: exact |Δts| <= gap pairing incl. across window boundaries, streaming == batch") {
    // ts 9 vs 11 straddles every 10s tumbling boundary — a window join
    // would miss it; the interval join must not. 9 vs 21 is out (Δ=12).
    val aRows = Seq((9L, "k1", 1L), (0L, "k1", 2L), (5L, "k2", 3L))
    val bRows = Seq((11L, "k1", 10L), (21L, "k1", 11L), (6L, "k2", 12L))
    def aShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("k"), col("_3").as("a_id"))
    def bShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("k"), col("_3").as("b_id"))
    val batch = StreamingTwins.intervalJoin(
      aShape(aRows.toDF()), bShape(bRows.toDF()), "ts", "k", gapSec = 10L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(batch === Set((1L, 10L), (3L, 12L)))

    val am = mem[(Long, String, Long)]
    val bm = mem[(Long, String, Long)]
    val joined = StreamingTwins.intervalJoin(
      aShape(am.toDF()), bShape(bm.toDF()), "ts", "k", gapSec = 10L)
    val q = joined.writeStream.format("memory").queryName("sijoin")
      .outputMode("append").start()
    withQuery(q) {
      am.addData(aRows: _*); bm.addData(bRows: _*); q.processAllAvailable()
      am.addData((500L, "zz", 99L)); bm.addData((500L, "zz", 98L))
      q.processAllAvailable()
      val got = spark.table("sijoin").filter(col("a_id") < 90)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      assert(got === batch)
    }
  }

  test("full-outer windowed join: unmatched rows of BOTH sides emit NULLs after the watermark") {
    val gRows = Seq((0L, "tom", 3, 1L), (0L, "bob", 1, 3L))  // bob has no salary
    val sRows = Seq((1L, "tom", 100, 11L), (1L, "eve", 50, 12L)) // eve has no grade
    def gShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("grade"), col("_4").as("g_id"))
    def sShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("salary"), col("_4").as("s_id"))
    val batch = StreamingTwins.windowedFullJoin(
      gShape(gRows.toDF()), sShape(sRows.toDF()), "ts", "name", "2 seconds")
      .select(col("name"), col("g_id"), col("s_id"))
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(batch === Set(("tom", Some(1L), Some(11L)),
      ("bob", Some(3L), None), ("eve", None, Some(12L))))

    val gm = mem[(Long, String, Int, Long)]
    val sm = mem[(Long, String, Int, Long)]
    val joined = StreamingTwins.windowedFullJoin(
      gShape(gm.toDF()), sShape(sm.toDF()), "ts", "name", "2 seconds")
    val q = joined.writeStream.format("memory").queryName("sfjoin")
      .outputMode("append").start()
    withQuery(q) {
      gm.addData(gRows: _*); sm.addData(sRows: _*); q.processAllAvailable()
      // advance both watermarks past the window so BOTH unmatched sides
      // finalize (two steps: NULL-side emission lags one batch)
      gm.addData((100L, "zz", 0, 99L)); sm.addData((100L, "zz", 0, 98L))
      q.processAllAvailable()
      gm.addData((200L, "zz", 0, 97L)); sm.addData((200L, "zz", 0, 96L))
      q.processAllAvailable()
      val got = spark.table("sfjoin")
        .filter((col("g_id").isNull || col("g_id") < 90) &&
          (col("s_id").isNull || col("s_id") < 90)) // drop sentinel rows
        .select(col("name"), col("g_id"), col("s_id"))
        .as[(String, Option[Long], Option[Long])].collect().toSet
      assert(got === batch)
    }
  }

  test("left-outer windowed join: unmatched left rows emit NULLs after the watermark") {
    val gRows = Seq((0L, "tom", 3, 1L), (0L, "bob", 1, 3L)) // bob has no salary
    val sRows = Seq((1L, "tom", 100, 11L))
    def gShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("grade"), col("_4").as("g_id"))
    def sShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("salary"), col("_4").as("s_id"))
    val batch = StreamingTwins.windowedLeftJoin(
      gShape(gRows.toDF()), sShape(sRows.toDF()), "ts", "name", "2 seconds")
      .select(col("name"), col("g_id"), col("s_id"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(batch === Set(("tom", 1L, Some(11L)), ("bob", 3L, None)))

    val gm = mem[(Long, String, Int, Long)]
    val sm = mem[(Long, String, Int, Long)]
    val joined = StreamingTwins.windowedLeftJoin(
      gShape(gm.toDF()), sShape(sm.toDF()), "ts", "name", "2 seconds")
    val q = joined.writeStream.format("memory").queryName("sljoin")
      .outputMode("append").start()
    withQuery(q) {
      gm.addData(gRows: _*); sm.addData(sRows: _*); q.processAllAvailable()
      // push both watermarks far past the window so the unmatched left
      // row is finalized and emitted with NULL right columns
      gm.addData((100L, "zz", 0, 99L)); sm.addData((100L, "zz", 0, 98L))
      q.processAllAvailable()
      gm.addData((200L, "zz", 0, 97L)); sm.addData((200L, "zz", 0, 96L))
      q.processAllAvailable()
      val got = spark.table("sljoin")
        .filter(col("g_id") < 90) // drop sentinel rows
        .select(col("name"), col("g_id"), col("s_id"))
        .as[(String, Long, Option[Long])].collect().toSet
      assert(got === batch)
    }
  }

  test("A5/W1/W6 watermarked tumbling window agg: streaming emissions == batch result") {
    val data = Seq((0L, "a", 1.0), (1L, "a", 2.0), (6L, "b", 3.0))
    def shape(df: DataFrame): DataFrame =
      df.select(timestamp_seconds(col("_1")).as("ts"),
        col("_2").as("k"), col("_3").as("v"))

    val batch = StreamingTwins.windowedSum(shape(data.toDF()), "ts", "k", "v", "5 seconds")
      .select(unix_timestamp(col("wstart")).as("w"), col("k"), col("sum_value"))
      .as[(Long, String, Double)].collect().toSet

    val ms = mem[(Long, String, Double)]
    val agg = StreamingTwins.windowedSum(shape(ms.toDF()), "ts", "k", "v", "5 seconds")
    val q = agg.writeStream.format("memory").queryName("wsum")
      .outputMode("append").start()
    withQuery(q) {
      ms.addData(data: _*); q.processAllAvailable()
      // Advance the watermark past both windows; append mode then emits
      // them as FINAL (exactly-once) results.
      ms.addData((100L, "z", 0.0)); q.processAllAvailable()
      ms.addData((200L, "z", 0.0)); q.processAllAvailable()
      val got = spark.table("wsum")
        .select(unix_timestamp(col("wstart")).as("w"), col("k"), col("sum_value"))
        .as[(Long, String, Double)].collect().toSet
        .filter(_._1 < 100L) // drop the sentinel's own flushed window
      assert(got === batch)
      assert(got === Set((0L, "a", 3.0), (5L, "b", 3.0))) // hand-computed
    }
  }

  test("sliding windowed agg: each event in size/slide windows, streaming == batch") {
    val data = Seq((0L, "a", 1.0), (7L, "a", 2.0), (12L, "b", 4.0))
    def shape(df: DataFrame): DataFrame =
      df.select(timestamp_seconds(col("_1")).as("ts"),
        col("_2").as("k"), col("_3").as("v"))
    def slide(df: DataFrame) = StreamingTwins.windowedSum(
      shape(df), "ts", "k", "v", "10 seconds", slide = Some("5 seconds"))

    val batch = slide(data.toDF())
      .select(unix_timestamp(col("wstart")).as("w"), col("k"), col("sum_value"))
      .as[(Long, String, Double)].collect().toSet
    // hand-computed: ts=0 -> windows starting -5 and 0; ts=7 -> 0 and 5;
    // ts=12 -> 5 and 10
    assert(batch === Set(
      (-5L, "a", 1.0), (0L, "a", 3.0), (5L, "a", 2.0),
      (5L, "b", 4.0), (10L, "b", 4.0)))

    val ms = mem[(Long, String, Double)]
    val q = slide(ms.toDF()).writeStream.format("memory").queryName("slide_sum")
      .outputMode("append").start()
    withQuery(q) {
      ms.addData(data: _*); q.processAllAvailable()
      ms.addData((100L, "z", 0.0)); q.processAllAvailable()
      ms.addData((200L, "z", 0.0)); q.processAllAvailable()
      val got = spark.table("slide_sum")
        .select(unix_timestamp(col("wstart")).as("w"), col("k"), col("sum_value"))
        .as[(Long, String, Double)].collect().toSet
        .filter(_._1 < 90L)
      assert(got === batch)
    }
  }

  test("J1 stream-stream windowed join with dual watermarks == batch join, m×n") {
    val gRows = Seq((0L, "tom", 3, 1L), (1L, "tom", 5, 2L), (0L, "bob", 1, 3L))
    val sRows = Seq((1L, "tom", 100, 11L), (3L, "tom", 200, 12L), (1L, "alice", 50, 13L))
    def gShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("grade"), col("_4").as("g_id"))
    def sShape(df: DataFrame) = df.select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("name"), col("_3").as("salary"), col("_4").as("s_id"))

    val batch = StreamingTwins.windowedJoin(
      gShape(gRows.toDF()), sShape(sRows.toDF()), "ts", "name", "2 seconds")
      .select(col("name"), col("g_id"), col("s_id")).as[(String, Long, Long)]
      .collect().toSet
    assert(batch === Set(("tom", 1L, 11L), ("tom", 2L, 11L))) // 2 grades × 1 salary in [0,2)

    val gm = mem[(Long, String, Int, Long)]
    val sm = mem[(Long, String, Int, Long)]
    val joined = StreamingTwins.windowedJoin(
      gShape(gm.toDF()), sShape(sm.toDF()), "ts", "name", "2 seconds")
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    withQuery(q) {
      gm.addData(gRows: _*); sm.addData(sRows: _*); q.processAllAvailable()
      val got = spark.table("sjoin")
        .select(col("name"), col("g_id"), col("s_id")).as[(String, Long, Long)]
        .collect().toSet
      assert(got === batch)
    }
  }

  test("K3 streaming file sink: checkpointed parquet output round-trips") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsink").toString
    val ms = mem[(Long, String)]
    val q = ms.toDF().toDF("id", "v").writeStream
      .format("parquet").option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .outputMode("append").start()
    withQuery(q) {
      ms.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      ms.addData((3L, "c")); q.processAllAvailable()
      val got = spark.read.parquet(s"$base/data")
        .as[(Long, String)].collect().toSet
      assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")))
    }
  }

  test("K3 exactly-once across restart: a new query resumes from the checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ms = mem[(Long, String)]
    def startQuery() = ms.toDF().toDF("id", "v").writeStream
      .format("parquet").option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .outputMode("append").start()
    val q1 = startQuery()
    ms.addData((1L, "a"), (2L, "b")); q1.processAllAvailable(); q1.stop()
    // arrives while NO query is running: must be picked up, not lost
    ms.addData((3L, "c"))
    val q2 = startQuery()
    withQuery(q2) {
      ms.addData((4L, "d")); q2.processAllAvailable()
      val rows = spark.read.parquet(s"$base/data").as[(Long, String)].collect()
      assert(rows.toSet === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      assert(rows.length === 4) // exactly-once: restart neither dropped nor replayed
    }
  }

  test("streaming exact dedup: dropDuplicates holds state across micro-batches") {
    val ms = mem[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").dropDuplicates("doc_id")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    withQuery(q) {
      ms.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch")); q.processAllAvailable()
      ms.addData((2L, "b-dup-next-batch"), (3L, "c")); q.processAllAvailable()
      val got = spark.table("sdedup").as[(Long, String)].collect().toMap
      assert(got.keySet === Set(1L, 2L, 3L))
      assert(got(2L) === "b") // the cross-batch duplicate was dropped by state
    }
  }

  test("streaming dedup with bounded state: dropDuplicatesWithinWatermark") {
    // The scale-safe streaming dedup: state for a key expires once the
    // watermark passes it, so unbounded streams don't accumulate
    // unbounded dedup state (plain dropDuplicates state grows forever).
    val ms = mem[(Long, Long)] // (ts_sec, doc_id)
    val df = ms.toDF().select(timestamp_seconds(col("_1")).as("ts"), col("_2").as("doc_id"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = df.writeStream.format("memory").queryName("wdedup")
      .outputMode("append").start()
    withQuery(q) {
      ms.addData((0L, 1L), (1L, 1L), (2L, 2L)); q.processAllAvailable() // dup within watermark
      ms.addData((100L, 9L)); q.processAllAvailable() // advance watermark past doc 1's state
      ms.addData((101L, 1L)); q.processAllAvailable() // state expired → doc 1 re-emitted
      val ids = spark.table("wdedup").select("doc_id").as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 1L, 2L, 9L))
    }
  }

  test("session-window agg: streaming emissions (after watermark) == batch result") {
    val data = Seq((0L, 1L, 1.0), (10L, 1L, 2.0), (60L, 1L, 4.0)) // 2 sessions for key 1
    def agg(df: DataFrame): DataFrame = {
      val shaped = df.select(col("_1").as("ts_sec"), col("_2").as("k"), col("_3").as("v"))
        .withColumn("ts", timestamp_seconds(col("ts_sec")))
        .withWatermark("ts", "0 seconds")
      shaped.groupBy(session_window(col("ts"), "30 seconds").as("w"), col("k"))
        .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("s"), col("k"), col("sum_value"))
    }
    val batch = agg(data.toDF()).as[(Long, Long, Double)].collect().toSet
    assert(batch === Set((0L, 1L, 3.0), (60L, 1L, 4.0)))

    val ms = mem[(Long, Long, Double)]
    val q = agg(ms.toDF()).writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    withQuery(q) {
      ms.addData(data: _*); q.processAllAvailable()
      ms.addData((1000L, 9L, 0.0)); q.processAllAvailable() // advance watermark
      ms.addData((2000L, 9L, 0.0)); q.processAllAvailable()
      val got = spark.table("ssess").as[(Long, Long, Double)].collect().toSet
        .filter(_._1 < 1000L)
      assert(got === batch)
    }
  }

  test("W3-W5 TopSpeed stateful op: incremental MemoryStream run == batch run") {
    val all = Seq(
      CarEvent(0, 30, 10.0, 0L, 0L), CarEvent(0, 50, 30.0, 1000L, 1000L),
      CarEvent(0, 40, 55.0, 2000L, 2000L), CarEvent(0, 60, 80.0, 3000L, 3000L),
      CarEvent(0, 20, 110.0, 4000L, 4000L),
      CarEvent(1, 10, 10.0, 0L, 0L), CarEvent(1, 20, 75.0, 1000L, 1000L))
    val batch = TopSpeed.run(all.toDS()).collect().toSeq.sortBy(e => (e.carId, e.time))

    val ms = mem[CarEvent]
    val q = TopSpeed.run(ms.toDS()).writeStream.format("memory")
      .queryName("tspeed").outputMode("update").start()
    withQuery(q) {
      // Split mid-stream: state (buffer + lastFired) must carry across
      // micro-batches for the second firing to be correct.
      ms.addData(all.take(3): _*); q.processAllAvailable()
      ms.addData(all.drop(3): _*); q.processAllAvailable()
      val got = spark.table("tspeed").as[CarEvent].collect().toSeq
        .sortBy(e => (e.carId, e.time))
      assert(got === batch)
      assert(got === Seq(
        CarEvent(0, 50, 30.0, 1000L, 1000L), CarEvent(0, 60, 80.0, 3000L, 3000L),
        CarEvent(1, 20, 75.0, 1000L, 1000L)))
    }
  }

  test("stateful restart under a CHANGED spark.sql.shuffle.partitions resumes correctly") {
    // The ops question every long-running stream hits: state is hash-
    // partitioned by the shuffle-partition count of the FIRST run, which
    // Spark pins in the checkpoint's offset metadata — a later restart
    // under a retuned session conf must keep reading the old state
    // layout, not silently re-shard. Asserted end to end: windows whose
    // state spans the restart still sum correctly.
    val in = java.nio.file.Files.createTempDirectory("graft-evolve-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-evolve-out").toString
    def writeFile(name: String, rows: Seq[(Long, String, Double)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(in, name),
        rows.map { case (t, k, v) => s"$t,$k,$v" }.mkString("", "\n", "\n"))
    def run(): Unit = {
      val parsed = graft.sources.Sources.readTextStream(spark, in)
        .select(split(col("value"), ",").as("p"))
        .select(timestamp_seconds(expr("try_cast(p[0] AS bigint)")).as("ts"),
          expr("p[1]").as("k"), expr("try_cast(p[2] AS double)").as("v"))
      val q = StreamingTwins.windowedSum(parsed, "ts", "k", "v", "10 seconds")
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/checkpoint")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(180000)) finally q.stop()
    }
    // run 1 (default 32 shuffle partitions): window [0,10) still OPEN
    writeFile("a.txt", Seq((0L, "a", 1.0), (3L, "a", 2.0), (6L, "b", 3.0)))
    run()
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      // run 2 under the retuned conf: more rows into the SAME window,
      // then a sentinel advancing the watermark past it
      writeFile("b.txt", Seq((8L, "a", 10.0), (100L, "z", 0.0)))
      run()
      writeFile("c.txt", Seq((200L, "z", 0.0))) // flush the sentinel's window
      run()
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    val got = spark.read.parquet(s"$out/data")
      .select(unix_timestamp(col("wstart")).as("w"), col("k"), col("sum_value"))
      .as[(Long, String, Double)].collect().toSet
      .filter(_._1 < 100L)
    // window state written by run 1 (1+2 for a, 3 for b) merged with run
    // 2's late addition (10.0 for a) — only possible if the restarted
    // query kept the original state sharding
    assert(got === Set((0L, "a", 13.0), (0L, "b", 3.0)))
  }

  test("foreachBatch incremental dedup: cross-batch hash store, idempotent replay") {
    import graft.dedup.Dedup
    val out = java.nio.file.Files.createTempDirectory("graft-incsink").toString
    val ms = mem[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch((df: DataFrame, id: Long) => Dedup.incrementalSink(out)(df, id))
      .option("checkpointLocation", s"$out/ck")
      .start()
    withQuery(q) {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")); q.processAllAvailable()
      ms.addData((4L, "beta"), (5L, "gamma")); q.processAllAvailable()
    }
    def dataIds = spark.read.parquet(s"$out/data")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 3 is an intra-batch dup of 1; 4 is a CROSS-batch dup of 2
    assert(dataIds === Seq(1L, 2L, 5L))
    // replay of batch 1 (foreachBatch's failure contract): same content,
    // same id — output must be unchanged, not emptied (the store read
    // excludes the batch's own partition) and not doubled (overwrite)
    Dedup.incrementalSink(out)(
      Seq((4L, "beta"), (5L, "gamma")).toDF("doc_id", "text"), 1L)
    assert(dataIds === Seq(1L, 2L, 5L))
  }

  test("foreachBatch incremental NEAR-dup: cross-batch band store, idempotent replay") {
    import graft.dedup.Dedup
    val out = java.nio.file.Files.createTempDirectory("graft-incnear").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val nearDup = base.replace("lazy", "sleepy")
    val other = "completely different text about spark and flink engines"
    val ms = mem[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch((df: DataFrame, id: Long) => Dedup.incrementalNearDupSink(out)(df, id))
      .option("checkpointLocation", s"$out/ck")
      .start()
    withQuery(q) {
      ms.addData((1L, base), (2L, other)); q.processAllAvailable()
      // 3 is a CROSS-batch near-dup of 1 (different bytes!), 4 is fresh
      ms.addData((3L, nearDup), (4L, "unrelated fresh content words here")); q.processAllAvailable()
    }
    def dataIds = spark.read.parquet(s"$out/data")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(dataIds === Seq(1L, 2L, 4L))
    // replay of batch 1: output unchanged — the store read excludes the
    // batch's own band-key partition, so its docs aren't self-rejected
    Dedup.incrementalNearDupSink(out)(
      Seq((3L, nearDup), (4L, "unrelated fresh content words here")).toDF("doc_id", "text"), 1L)
    assert(dataIds === Seq(1L, 2L, 4L))
  }

  test("band-store compaction: globally distinct keys, gate decisions unchanged") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    // two batches sharing most band keys (same doc content re-seen)
    Dedup.incrementalNearDupSink(out)(Seq((1L, base)).toDF("doc_id", "text"), 0L)
    Dedup.incrementalNearDupSink(out)(
      Seq((2L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text"), 1L)
    val (before, after) = Dedup.compactBandStore(spark, s"$out/store", s"$out/store2")
    assert(after < before, "cross-batch repeats must compact away")
    assert(after ==
      spark.read.parquet(s"$out/store").select("bkey").distinct().count())
    // the gate admits/rejects identically against the compacted store
    // (probe 3 re-sends SEEN content — identical band keys, certain hit)
    val probe = Seq((3L, base), (4L, "totally new and different stuff"))
      .toDF("doc_id", "text")
    def gate(dir: String) = Dedup.incrementalNearDup(probe,
        spark.read.parquet(dir).select("bkey"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gate(s"$out/store2") === gate(s"$out/store"))
    // probe 3 shares bands with seen content → rejected; 4 admitted
    assert(gate(s"$out/store2") === Seq(4L))
  }

  test("band-store TTL retention: ages out by NEWEST sighting, stays age-aware") {
    val out = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    // k1 seen only in batch 0; k2 re-seen in batch 1; k3 new in batch 1
    Seq("k1", "k2").toDF("bkey").write.parquet(s"$out/store/batch=0")
    Seq("k2", "k3").toDF("bkey").write.parquet(s"$out/store/batch=1")
    val (before, after) = graft.dedup.Dedup.compactBandStoreRetain(
      spark, s"$out/store", s"$out/store2", minBatch = 1L)
    assert((before, after) === ((4L, 2L)))
    val kept = spark.read.parquet(s"$out/store2")
      .select("bkey", "batch").as[(String, Long)].collect().sortBy(_._1)
    // k1 aged out (last seen batch 0); k2 survives with its NEWEST age
    // (retention is max(batch) per key, so re-seen keys keep full power)
    assert(kept.toSeq === Seq(("k2", 1L), ("k3", 1L)))
    // retention composes: a second pass with a higher floor empties it
    val (_, after2) = graft.dedup.Dedup.compactBandStoreRetain(
      spark, s"$out/store2", s"$out/store3", minBatch = 2L)
    assert(after2 === 0L)
  }

  test("stream-static enrich: broadcast dim join per micro-batch == batch, left rows survive") {
    val dim = Seq((1, "gold"), (2, "silver")).toDF("user_id", "tier")
    val eventsData = Seq((1, 10.0), (2, 20.0), (3, 30.0), (1, 40.0))
    val batch = StreamingTwins
      .enrichWithDim(eventsData.toDF("user_id", "value"), dim, "user_id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), Option(r.getString(2)))).toSeq.sorted

    val ms = mem[(Int, Double)]
    val enriched = StreamingTwins.enrichWithDim(
      ms.toDF().toDF("user_id", "value"), dim, "user_id")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    withQuery(q) {
      // split across micro-batches: each batch joins the same static dim
      ms.addData(eventsData.take(2): _*); q.processAllAvailable()
      ms.addData(eventsData.drop(2): _*); q.processAllAvailable()
      val got = spark.table("enriched")
        .collect().map(r => (r.getInt(0), r.getDouble(1), Option(r.getString(2)))).toSeq.sorted
      assert(got === batch)
      // the un-keyed user (3) flowed through with a NULL tier
      assert(got.contains((3, 30.0, None)))
    }
  }

  test("streaming funnel == batch funnel under event-time-ordered batches; " +
    "state advances monotonically") {
    import graft.state.StreamingFunnel
    import graft.state.StreamingFunnel.FunnelEvent
    val steps = Seq("view", "click", "purchase")
    // u1 full chain across batches; u2 click-before-view (chain stops at
    // t1); u3 no step 1 ever (no output); u4 same-ts view+click (strict >
    // rejects the click)
    val events = Seq(
      FunnelEvent(2L, "click", 5L), FunnelEvent(2L, "purchase", 6L),
      FunnelEvent(1L, "view", 10L), FunnelEvent(2L, "view", 8L),
      FunnelEvent(4L, "view", 10L), FunnelEvent(4L, "click", 10L),
      FunnelEvent(1L, "click", 20L), FunnelEvent(3L, "click", 30L),
      FunnelEvent(1L, "purchase", 40L), FunnelEvent(3L, "purchase", 50L))
    // batch oracle on the same rows
    val batch = graft.rel.Analytics.funnel(
      events.toDF("user_id", "event_type", "ts_us"), steps)
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq

    val ms = mem[FunnelEvent]
    val q = StreamingFunnel.run(ms.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    withQuery(q) {
      // per-user event-time order holds across these batch splits
      val ordered = events.sortBy(e => (e.ts_us, steps.indexOf(e.event_type)))
      ordered.grouped(3).foreach { g => ms.addData(g: _*); q.processAllAvailable() }
      // LAST emission per user == the batch funnel row
      val rows = spark.table("funnel_stream")
        .selectExpr("user_id", "times[0] AS t1", "times[1] AS t2", "times[2] AS t3")
        .collect()
      val last = rows.zipWithIndex.groupBy(_._1.getLong(0))
        .map { case (u, rs) => val r = rs.maxBy(_._2)._1
          (u, r.getAs[Long]("t1"), Option(r.getAs[Any]("t2")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("t3")).map(_.asInstanceOf[Long])) }
        .toSeq.sortBy(_._1)
      assert(last === batch)
      // u3 (no step 1) never emitted
      assert(!rows.exists(_.getLong(0) == 3L))
      // every emission per user is monotone: chain never loses a step
      for ((_, rs) <- rows.zipWithIndex.groupBy(_._1.getLong(0))) {
        val seqs = rs.sortBy(_._2).map(_._1).map(r =>
          Seq(Option(r.getAs[Any]("t1")), Option(r.getAs[Any]("t2")),
            Option(r.getAs[Any]("t3"))).count(_.isDefined))
        assert(seqs.sameElements(seqs.sorted), "a later emission lost a step")
      }
    }
  }
}
