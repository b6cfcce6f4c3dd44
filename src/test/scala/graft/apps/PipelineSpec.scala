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

  test("pipeline with decontamination: bench-overlapping docs are gone") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") < 5)
    val out = PipelineMain.run(docs, testFraction = 0.2, benchDocs = Some(bench))
      .select("doc_id").as[Long].collect().toSet
    val base = PipelineMain.run(docs, testFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(out.subsetOf(base)) // decontamination only removes
    // every bench doc that survived the other filters is removed
    assert(out.intersect((0L until 5L).toSet).isEmpty)
  }

  test("funnel audit: one-pass counts are monotone and end at the output size") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (out, audit) = PipelineMain.runAudited(docs, testFraction = 0.2,
      benchDocs = Some(docs.filter(col("doc_id") < 5)))
    val fun = PipelineMain.funnel(audit)
    assert(fun.map(_._1) === Seq("docs_in", "lang", "quality", "repetition",
      "exact_dedup", "near_dedup", "decontaminate"))
    // keep-sets are nested, so the funnel never grows
    assert(fun.sliding(2).forall { case Seq(a, b) => b._2 <= a._2 })
    assert(fun.head._2 === docs.count())
    // the last stage's survivor count IS the pipeline output size
    assert(fun.last._2 === out.count())
  }
}
