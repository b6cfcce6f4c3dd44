package graft.apps

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.core.Tables

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("end-to-end pipeline: filters compose, output is deduped and split-labeled") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = PipelineMain.run(docs, testFraction = 0.2)
    val rows = out.select("doc_id", "split").as[(Long, String)].collect()

    assert(rows.nonEmpty && rows.length <= docs.count())
    assert(rows.map(_._1).distinct.length === rows.length) // unique doc ids
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "test")))

    // Exact duplicates cannot survive: every kept text is unique.
    val keptTexts = out.select("text").as[String].collect()
    assert(keptTexts.distinct.length === keptTexts.length)

    // Deterministic end to end.
    val again = PipelineMain.run(docs, testFraction = 0.2)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }
}
