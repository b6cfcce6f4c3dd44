package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Args, GraftSession, Tables}
import graft.dedup.Dedup
import graft.gen.Sampling
import graft.text.TextAnalysis

/** End-to-end training-data pipeline: the composition the individual
  * operators exist for. Stage order follows cost — cheap map-side
  * filters first, the shuffling dedup stages on the survivors only:
  *
  *   documents
  *     → language filter (map-side)
  *     → quality filter (map-side)
  *     → repetition filter (2 partial-agg shuffles)
  *     → exact dedup (1 shuffle on content hash)
  *     → near-dup dedup: MinHash-LSH pairs → clusters → keep canonical
  *     → benchmark decontamination (broadcast anti-flag)
  *     → deterministic train/test split (map-side)
  *     → parquet out (partitioned by split)
  *
  * Usage: --data /root/testdata/sf0.001 --out /tmp/graft-pipeline
  */
object PipelineMain {

  /** The pipeline as a pure function: documents in (plus an optional
    * eval set to decontaminate against), labeled keepers out. */
  def run(docs: DataFrame, testFraction: Double,
          benchDocs: Option[DataFrame] = None): DataFrame = {
    val lang = TextAnalysis.langId(docs).filter(col("lang_pred") === "en")
      .select("doc_id")
    val quality = TextAnalysis.qualityScore(docs).filter(col("keep"))
      .select("doc_id")
    val repetition = TextAnalysis.repetitionScore(docs).filter(col("keep"))
      .select("doc_id")
    val filtered = docs
      .join(lang, "doc_id")
      .join(quality, "doc_id")
      .join(repetition, "doc_id")
    val exactKeep = Dedup.exact(filtered).select(col("keep_id").as("doc_id"))
    val exactDocs = filtered.join(exactKeep, "doc_id")
    val nearKeep = Dedup.applyClusters(exactDocs,
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(exactDocs, n = 2, k = 6, rowsPerBand = 2)))
      .filter(col("keep")).select("doc_id")
    val deduped = exactDocs.join(nearKeep, "doc_id")
    val clean = benchDocs match {
      case Some(bench) =>
        deduped.join(Dedup.decontaminate(deduped, bench, n = 2)
          .filter(col("keep")).select("doc_id"), "doc_id")
      case None => deduped
    }
    Sampling.trainTestSplit(clean, "doc_id", testFraction)
  }

  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("training-data-pipeline")
    val docs = Tables.documents(spark, a.getOrElse("data", "/root/testdata/sf0.001"))
    // persisted: count, the split histogram, and the write would each
    // re-run the joins + dedup stages otherwise
    val out = run(docs, a.getOrElse("testFraction", "0.1").toDouble)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    val kept = out.count()
    val by = out.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[pipeline] $total docs in -> $kept kept ($by)")
    a.get("out").foreach { dir =>
      out.write.mode("overwrite").partitionBy("split").parquet(dir)
      println(s"[pipeline] wrote $dir (partitioned by split)")
    }
    out.unpersist()
    spark.stop()
  }
}
