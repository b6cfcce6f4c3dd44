package graft

import graft.core.Tables

/** Bucketing for co-located joins (the 100 TB shuffle-elimination tool):
  * both fact tables bucketed on the join key join WITHOUT any exchange —
  * the plan proof that pre-partitioned layouts carry through Catalyst. */
class BucketingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("join of co-bucketed tables plans with zero exchanges") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    // The in-memory catalog forgets tables across JVMs but the warehouse
    // dirs persist — clear the physical locations too.
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("t_orders_b", "t_lineitem_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("t_orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("t_lineitem_b")

    val joined = spark.table("t_lineitem_b").join(spark.table("t_orders_b"),
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(joined.count() === li.count()) // every lineitem has its order
  }

  test("TPC-H q3 over co-bucketed facts runs with ZERO shuffles, same result") {
    // The end-to-end layout-driven payoff: bucket both facts on the join
    // key and q3's whole pipeline is exchange-free — the bucketed join
    // needs no shuffle, and the groupBy leads with the bucket key so the
    // aggregation's clustering requirement is already satisfied.
    import org.apache.spark.sql.functions._
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("t_orders_q3", "t_lineitem_q3").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("t_orders_q3")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("t_lineitem_q3")

    // pin the join strategy to the bucketed SMJ path (the explicit
    // customer broadcast hint is threshold-independent)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
      val cust = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val q = spark.table("t_lineitem_q3")
        .filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
        .join(spark.table("t_orders_q3")
          .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(dec(col("l_extendedprice")) *
          (lit(1.0).cast("decimal(3,2)") - dec(col("l_discount")))), 2)
          .cast("double").as("revenue"))
      val got = q.collect().map(_.toSeq).toSet
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges === 0, s"bucketed q3 still shuffles ($exchanges):\n$plan")
      val expected = graft.rel.Relational.q3(spark, sf).collect().map(_.toSeq).toSet
      assert(got === expected && got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
