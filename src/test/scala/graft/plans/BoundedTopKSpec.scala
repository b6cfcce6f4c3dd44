package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{PlanAudit, Tables}

/** The BoundGlobalTopK optimizer rule: the naive unpartitioned
  * row_number + filter top-k — the r4 scale-defect class — must plan as
  * a distributed TakeOrderedAndProject with the window ranking only the
  * k survivors, without changing results. */
class BoundedTopKSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def counts = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("tok"))
    .filter(length(col("tok")) > 0)
    .groupBy("tok").agg(count(lit(1)).as("cnt"))

  private val order = Seq(col("cnt").desc, col("tok").asc)

  test("naive global row_number top-k plans as TakeOrderedAndProject, results unchanged") {
    val naive = counts
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .filter(col("rn") <= 5)
    val got = naive.orderBy("rn").as[(String, Long, Int)].collect()
    val plan = naive.queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"rule did not bound the window:\n$plan")
    assert(PlanAudit.unboundedSinglePartitionSorts(plan) == 0,
      s"unbounded single-partition sort survived:\n$plan")
    // results identical to the hand-bounded formulation
    val expect = counts.orderBy(order: _*).limit(5)
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .orderBy("rn").as[(String, Long, Int)].collect()
    assert(got.toSeq === expect.toSeq)
  }

  test("strict <, reversed >=, and extra conjuncts all bound; tightest bound wins") {
    val naive = counts
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .filter(col("rn") < 8 && lit(10) >= col("rn") && col("cnt") > 0)
    val plan = naive.queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
    assert(naive.count() == 7) // rn in [1, 7]; cnt > 0 always true here
  }

  test("PARTITIONED row_number windows are left alone (WindowGroupLimit path)") {
    val df = counts
      .withColumn("grp", substring(col("tok"), 1, 1))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(order: _*)))
      .filter(col("rn") <= 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), plan)
    // per-group top-2: every group has <= 2 rows
    val per = df.groupBy("grp").count().as[(String, Long)].collect()
    assert(per.forall(_._2 <= 2))
  }

  test("mirrored literal-on-the-left equality bound fires (rn = k written as k = rn)") {
    val naive = counts
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .filter(lit(5) === col("rn"))
    val plan = naive.queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"mirrored EqualTo did not bound the window:\n$plan")
    val got = naive.as[(String, Long, Int)].collect()
    assert(got.length == 1 && got.head._3 == 5)
  }

  private def tied = Seq(
    ("a", 10L), ("b", 9L), ("c", 9L), ("d", 9L), ("e", 5L), ("f", 5L), ("g", 1L)
  ).toDF("tok", "cnt")

  test("rank <= k with ties: ties-safe WindowGroupLimit bound, all tied rows kept") {
    // disable Spark's own InferWindowGroupLimit so the assertion proves
    // OUR rule closes the shape, then check against the enabled default
    withSQLConf("spark.sql.optimizer.windowGroupLimitThreshold" -> "-1") {
      val naive = tied
        .withColumn("r", rank().over(Window.orderBy(col("cnt").desc)))
        .filter(col("r") <= 2)
      val got = naive.as[(String, Long, Int)].collect().sortBy(_._1)
      // rank 2 is a THREE-way tie: 4 survivors from k=2 — Limit(2) would
      // have dropped two of them
      assert(got.map(_._1).toSeq === Seq("a", "b", "c", "d"))
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"rank shape not bounded with the built-in rule disabled:\n$plan")
      assert(!plan.contains("TakeOrderedAndProject"),
        s"tie-unsafe row_number rewrite applied to rank():\n$plan")
    }
    // default conf: Spark's rule fires first; ours must leave it alone
    // (idempotence) and results must be identical
    val dflt = tied
      .withColumn("r", rank().over(Window.orderBy(col("cnt").desc)))
      .filter(col("r") <= 2)
      .as[(String, Long, Int)].collect().sortBy(_._1)
    assert(dflt.map(_._1).toSeq === Seq("a", "b", "c", "d"))
  }

  test("dense_rank <= k bounds via WindowGroupLimit and keeps whole value classes") {
    withSQLConf("spark.sql.optimizer.windowGroupLimitThreshold" -> "-1") {
      val naive = tied
        .withColumn("r", dense_rank().over(Window.orderBy(col("cnt").desc)))
        .filter(col("r") <= 3)
      val got = naive.as[(String, Long, Int)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq === Seq("a", "b", "c", "d", "e", "f"))
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"dense_rank shape not bounded:\n$plan")
    }
  }

  test("windows computing anything besides row_number are not rewritten") {
    // a full-frame sum must see every row; the rule must not bound it
    val df = counts
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .withColumn("tot", sum(col("cnt")).over())
      .filter(col("rn") <= 3)
    val total = counts.agg(sum(col("cnt"))).as[Long].head()
    val got = df.select("tot").distinct().as[Long].collect()
    assert(got.toSeq === Seq(total), "full-frame sum changed under the rule")
  }
}
