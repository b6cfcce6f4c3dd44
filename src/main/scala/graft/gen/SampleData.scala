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

  /** The generator mapping over any BIGINT sequence column — shared by the
    * batch generator below and the streaming rate-source twin (the rate
    * source's `value` plays the `seq` role). Extra columns pass through. */
  def withGradeSalary(df: DataFrame, seqCol: String): DataFrame = {
    val names = array(Names.map(lit): _*)
    val x = col(seqCol)
    df.withColumn("name", element_at(names, (lcg(x, 1) % 6 + 1).cast("int")))
      .withColumn("grade", (lcg(x, 2) % 5 + 1).cast("int"))
      .withColumn("salary", (lcg(x, 3) % 10000 + 1).cast("int"))
  }

  /** n rows of (seq, name, grade, salary) with the reference's domains. */
  def gradesSalaries(spark: SparkSession, n: Long): DataFrame =
    withGradeSalary(spark.range(n).select(col("id").as("seq")), "seq")
      .select("seq", "name", "grade", "salary")
}
