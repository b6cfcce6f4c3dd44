package graft.join

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {
  // contract-check tests deliberately fail tasks with loud raises
  override protected def expectedTaskFailureSubstrings: Seq[String] =
    Seq("asof contract violation", "requires non-null key and ts")

  import spark.implicits._

  test("asof: latest right row at-or-before each left ts per key; no-match keeps NULL") {
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 9L, 901L), (2L, 8L, 902L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asof(left, right, "k", "ts")
      .select("k", "ts", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 10L, 100L, Some(901L)), // latest of {5, 9} <= 10
      (1L, 5L, 101L, Some(900L)),  // equal timestamps match (inclusive)
      (2L, 7L, 102L, None)))       // right row at 8 is in the future
  }

  test("asof: a matched right row with a NULL field is taken WHOLE, not stitched") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, Option(10.0), 2L), (1L, 9L, Option.empty[Double], 7L))
      .toDF("k", "ts", "price", "qty")
    val got = AsofJoin.asof(left, right, "k", "ts")
      .select("lid", "price", "qty")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    // the ts=9 row wins entirely: price NULL from THAT row, not 10.0
    // carried over from ts=5 (per-column fill would fabricate a row
    // that never existed)
    assert(got === Seq((100L, None, Some(7L))))
  }

  test("asof: every left row survives exactly once (left-outer cardinality)") {
    val left = (0L until 50L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 10L).map(i => (i % 5, i * 3, i + 1000)).toDF("k", "ts", "rid")
    val out = AsofJoin.asof(left, right, "k", "ts")
    assert(out.count() === 50L)
    assert(out.select("lid").distinct().count() === 50L)
  }

  test("asofNative (custom SparkStrategy): hand case incl. inclusive tie and NULL no-match") {
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L), (3L, 1L, 103L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 9L, 901L), (2L, 8L, 902L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofNative(left, right, "k", "ts")
      .select("k", "ts", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 10L, 100L, Some(901L)),
      (1L, 5L, 101L, Some(900L)),  // inclusive at equal ts
      (2L, 7L, 102L, None),        // right row is in the future
      (3L, 1L, 103L, None)))       // key absent on the right entirely
  }

  test("asofNative generalizes beyond BIGINT: string keys, TIMESTAMP ts") {
    import org.apache.spark.sql.functions.timestamp_seconds
    def shape(rows: Seq[(String, Long, Long)], payload: String) =
      rows.toDF("k", "s", payload)
        .select($"k", timestamp_seconds($"s").as("ts"), org.apache.spark.sql.functions.col(payload))
    val left = shape(Seq(("apple", 10L, 100L), ("pear", 7L, 102L)), "lid")
    val right = shape(Seq(("apple", 9L, 901L), ("apple", 11L, 902L), ("zed", 1L, 903L)), "rid")
    val got = AsofJoin.asofNative(left, right, "k", "ts")
      .select("k", "lid", "rid")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === Set(
      ("apple", 100L, Some(901L)), // 9 <= 10, 11 is in the future
      ("pear", 102L, None)))       // key missing on the right
  }

  test("asofNative == window asof on real data, any input partitioning") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), expr("ts_ns div 1000").as("ts"),
        col("event_id").as("p_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("k"), expr("ts_ns div 1000").as("ts"))
      .agg(max("event_id").as("v_id")) // unique per (k, ts) by construction
    val viaWindow = AsofJoin.asof(purchases, views, "k", "ts")
      .select("k", "ts", "p_id", "v_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val viaNative = AsofJoin.asofNative(purchases.repartition(7), views.repartition(3), "k", "ts")
      .select("k", "ts", "p_id", "v_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(viaNative === viaWindow)
    assert(viaNative.nonEmpty)
  }

  test("asofNative plan: AsofMergeJoin exec, two exchanges, no union/window") {
    val left = (0L until 1000L).map(i => (i % 7, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 300L).map(i => (i % 7, i * 2, i + 9000)).toDF("k", "ts", "rid")
    val df = AsofJoin.asofNative(left, right, "k", "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AsofMergeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      "native asof must not fall back to the union+window formulation")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"more than one exchange per side:\n$plan")
  }

  test("checkContract=true: a duplicate right (key, ts) fails LOUDLY in both forms") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val dupRight = Seq((1L, 5L, 7L), (1L, 5L, 9L)).toDF("k", "ts", "rid")
    for (form <- Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame](
        (l, r) => AsofJoin.asof(l, r, "k", "ts", checkContract = true),
        (l, r) => AsofJoin.asofNative(l, r, "k", "ts", checkContract = true))) {
      val e = intercept[Exception] { form(left, dupRight).collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("asof contract violation")),
        s"expected a loud contract message, got: $e")
    }
    // and a contract-abiding right side passes the check unchanged
    val okRight = Seq((1L, 5L, 7L)).toDF("k", "ts", "rid")
    val got = AsofJoin.asof(left, okRight, "k", "ts", checkContract = true)
      .select("rid").as[Long].collect().toSeq
    assert(got === Seq(7L))
  }

  test("asofNative: NULL key/ts raises a clear contract error, not an opaque NPE") {
    val left = Seq((Option(1L), Option(10L), 100L)).toDF("k", "ts", "lid")
    val right = Seq((Option(1L), Option.empty[Long], 900L)).toDF("k", "ts", "rid")
    val e = intercept[Exception] {
      AsofJoin.asofNative(left, right, "k", "ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("requires non-null key and ts")),
      s"expected the non-null contract message, got: $e")
  }

  test("asofNative under AQE coalescing: children stay co-numbered, results exact") {
    // tiny frames + 32 shuffle partitions force AQE's coalescer to act;
    // the exec's partition-count require would fire loudly if AQE ever
    // shrank one side only
    val left = (0L until 2000L).map(i => (i % 11, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 500L).map(i => (i % 11, i * 3, i + 9000)).toDF("k", "ts", "rid")
    val native = AsofJoin.asofNative(left, right, "k", "ts")
      .select("k", "ts", "lid", "rid")
    val viaWindow = AsofJoin.asof(left, right, "k", "ts")
      .select("k", "ts", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    native.collect() // finalize native's own AQE plan (.as[] would re-plan)
    val got = native.as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === viaWindow)
    val plan = native.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AQEShuffleRead") || plan.contains("coalesced"),
      s"expected AQE to have coalesced the tiny shuffles:\n$plan")
  }

  test("asof: contract-violating right ties resolve deterministically, not by partition order") {
    // two right rows at the SAME (key, ts) violate the uniqueness
    // contract; the xxhash64 tie-break must pick the same winner
    // regardless of input partitioning
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, 7L), (1L, 5L, 9L)).toDF("k", "ts", "rid")
    val picks = (1 to 8).map { n =>
      AsofJoin.asof(left, right.repartition(n), "k", "ts")
        .select("rid").as[Long].collect().head
    }
    assert(picks.distinct.size === 1)
  }
}
