package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.Aggregations
import graft.core.Tables
import graft.gen.SampleData
import graft.join.WindowJoin
import graft.ops.{AsyncMap, RowOps, Tokenize}
import graft.rel.Relational
import graft.state.TopSpeed

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame`; the paired
  * `oracleSql` entry is equivalent ANSI SQL DuckDB runs on the same parquet
  * tables. Column names are aliased identically on both sides (the driver
  * sorts columns by name before hashing). DOUBLE aggregation goes through
  * DECIMAL on both sides so partial-aggregate order can never perturb the
  * hash (exact + associative).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * M0 walking skeleton: scan → project → explode → filter → shuffle agg
    * (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    Tokenize.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"), "text")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- M0/M1: row ops + scalar functions -------------------------------
    "q_wordcount" -> ((s, d) =>
      Tokenize.wordCount(Tables.documents(s, d), "text")),
    "q_tokenize_ws" -> ((s, d) =>
      Tokenize.wordCountWs(Tables.documents(s, d), "text")),
    "q_conditional_fanout" -> ((s, d) =>
      Tokenize.conditionalFanout(Tables.documents(s, d), "text", "spark")),
    "q_filter_eq" -> ((s, d) =>
      RowOps.filterEq(Tables.events(s, d), "event_type", "click")
        .select("event_id", "event_type", "value")),
    "q_parse_cast" -> ((s, d) =>
      RowOps.parseCast(Tables.events(s, d))),
    "q_json_extract" -> ((s, d) =>
      RowOps.jsonExtract(Tables.events(s, d))),
    "q_generator_domain" -> ((s, _) =>
      SampleData.gradesSalaries(s, 1000L)),
    "q_scan_text" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          length(col("text")).as("text_len"), col("lang"))),
    // ---- M2: aggregation + windows ---------------------------------------
    "q_running_sum" -> ((s, d) =>
      Aggregations.runningSum(Tables.events(s, d), "user_id", "event_id", "value")),
    "q_keyed_sum" -> ((s, d) =>
      Aggregations.keyedSum(Tables.events(s, d), "user_id", "value")),
    "q_window_sum" -> ((s, d) =>
      Aggregations.windowSum(Tables.events(s, d), "ts_sec", "event_type", "value", 5L)),
    "q_maxby" -> ((s, d) =>
      Aggregations.maxBy(Tables.events(s, d), "user_id", "value", "event_id")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")),
    // ---- M3: windowed join -----------------------------------------------
    "q_window_join" -> ((s, d) =>
      WindowJoin.eventSliceJoin(Tables.events(s, d), "signup", "purchase", 3600L)),
    // ---- M4: TopSpeed stateful op (batch/oracle reformulation) ------------
    "q_topspeed_bucket" -> ((s, d) =>
      TopSpeed.topSpeedBuckets(Tables.events(s, d), 10, 50.0)),
    // ---- M5: ordered async map -------------------------------------------
    "q_async_identity" -> ((s, d) => {
      import s.implicits._
      val ids = Tables.events(s, d).select(col("event_id")).as[Long]
      AsyncMap.orderedWait(ids)(AsyncMap.identityAsync[Long]).toDF("event_id")
    }),
    // ---- relational headliners (scale surface) ----------------------------
    "q_tpch_q1" -> Relational.q1 _,
    "q_tpch_q3" -> Relational.q3 _,
    "q_tpch_q5" -> Relational.q5 _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
        |      FROM documents) t
        |WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "q_tokenize_ws" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s')) AS word
        |      FROM documents) t
        |GROUP BY word""".stripMargin,
    "q_conditional_fanout" ->
      """SELECT upper(word) AS word
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
        |      FROM documents
        |      WHERE list_contains(regexp_split_to_array(lower(text), '\W+'), 'spark')) t
        |WHERE length(word) > 0""".stripMargin,
    "q_filter_eq" ->
      "SELECT event_id, event_type, value FROM events WHERE lower(event_type) = 'click'",
    "q_parse_cast" ->
      """SELECT event_id, user_id,
        |       least(greatest(value, 0.0), 100000.0) AS value,
        |       epoch_ns(ts) // 1000000000 AS ts_sec
        |FROM events""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, event_type, cast(json_extract(props, '$.k') AS bigint) AS k
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL""".stripMargin,
    "q_generator_domain" ->
      """SELECT seq,
        |       list_value('tom','jerry','alice','bob','john','grace')[
        |         cast(((1103515245*(seq+1)+12345) % 2147483648) % 6 + 1 AS int)] AS name,
        |       cast(((1103515245*(seq+2)+12345) % 2147483648) % 5 + 1 AS int) AS grade,
        |       cast(((1103515245*(seq+3)+12345) % 2147483648) % 10000 + 1 AS int) AS salary
        |FROM (SELECT range AS seq FROM range(1000)) g""".stripMargin,
    "q_scan_text" ->
      "SELECT doc_id, n_chars, length(text) AS text_len, lang FROM documents",
    "q_running_sum" ->
      """SELECT user_id, event_id,
        |       cast(sum(cast(value AS decimal(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_sum
        |FROM events""".stripMargin,
    "q_keyed_sum" ->
      """SELECT user_id, cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_window_sum" ->
      """SELECT (epoch_ns(ts) // 5000000000) * 5 AS wstart_sec, event_type,
        |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_maxby" ->
      """SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q_window_join" ->
      """WITH a AS (SELECT user_id, (epoch_ns(ts) // 3600000000000) * 3600 AS wstart_sec,
        |                  value AS grade, event_id AS a_id
        |           FROM events WHERE event_type = 'signup'),
        |     b AS (SELECT user_id, (epoch_ns(ts) // 3600000000000) * 3600 AS wstart_sec,
        |                  value AS salary, event_id AS b_id
        |           FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, a.wstart_sec, a_id, b_id, grade, salary
        |FROM a JOIN b ON a.user_id = b.user_id AND a.wstart_sec = b.wstart_sec""".stripMargin,
    "q_topspeed_bucket" ->
      """WITH ce AS (SELECT cast(user_id % 10 AS int) AS car_id, value AS speed,
        |                   epoch_ns(ts) // 1000 AS ts_us, event_id
        |            FROM events),
        |     d AS (SELECT car_id, speed, event_id,
        |                  sum(speed/3.6) OVER (PARTITION BY car_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS distance
        |           FROM ce)
        |SELECT car_id, cast(floor(distance/50.0) AS bigint) AS bucket,
        |       speed AS top_speed, event_id
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY car_id, floor(distance/50.0)
        |        ORDER BY speed DESC, event_id DESC) AS rn FROM d) t
        |WHERE rn = 1""".stripMargin,
    "q_async_identity" ->
      "SELECT event_id FROM events",
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1.0 AS decimal(3,2)) - cast(l_discount AS decimal(18,2)))) AS double) AS sum_disc_price,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1.0 AS decimal(3,2)) - cast(l_discount AS decimal(18,2))) * (cast(1.0 AS decimal(3,2)) + cast(l_tax AS decimal(18,2)))) AS double) AS sum_charge,
        |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1.0 AS decimal(3,2)) - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |  AND l_shipdate > TIMESTAMP '2000-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1.0 AS decimal(3,2)) - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
  )
}
