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
}
