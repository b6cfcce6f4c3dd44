package graft.apps
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_tpch_q2","q_tpch_q8","q_tpch_q11","q_tpch_q15","q_tpch_q17","q_tpch_q21","q_chunk_dedup")) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val bc = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val shj = plan.linesIterator.count(_.contains("ShuffledHashJoin"))
      println(s"PLAN $q exchanges=$ex bhj=$bc smj=$smj shj=$shj")
    }
    spark.stop()
  }
}
