package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: seeded sample-data generators (`WindowJoinSampleData.scala:35-75`;
  * SURVEY.md §2.1).
  *
  * The reference draws uniform names from a 6-element array, grades in
  * [1,5], salaries in [1,10000] from `java.util.Random`. For oracle
  * checkability we use a deterministic LCG over `spark.range(n)` instead
  * of `rand(seed)` — Spark's `rand` output depends on partitioning, an
  * LCG on the row id does not, and the identical arithmetic runs in
  * DuckDB. Fully distributed: `range` parallelizes, no shuffle at all.
  */
object SampleData {

  val Names = Seq("tom", "jerry", "alice", "bob", "john", "grace")

  /** glibc-style LCG step on a BIGINT: (a*x + c) mod 2^31. */
  private def lcg(x: org.apache.spark.sql.Column, salt: Long) =
    pmod(lit(1103515245L) * (x + lit(salt)) + lit(12345L), lit(2147483648L))

  /** n rows of (seq, name, grade, salary) with the reference's domains. */
  def gradesSalaries(spark: SparkSession, n: Long): DataFrame = {
    val names = array(Names.map(lit): _*)
    spark.range(n).select(
      col("id").as("seq"),
      element_at(names, (lcg(col("id"), 1) % 6 + 1).cast("int")).as("name"),
      (lcg(col("id"), 2) % 5 + 1).cast("int").as("grade"),
      (lcg(col("id"), 3) % 10000 + 1).cast("int").as("salary"))
  }
}
