package graft.apps

import org.apache.spark.sql.functions.col

import graft.core.{Args, GraftSession, Tables}
import graft.ops.Tokenize
import graft.sinks.Sinks

/** Runnable mirror of `WordCount.java:52-94`: bounded text → tokenizer →
  * keyed count → text file (overwrite) or stdout.
  *
  * Usage: --input <text file>   (default: documents.parquet text column)
  *        --data <sf dir>       (default /root/testdata/sf0.001)
  *        --output <dir>        (omit → print, like the reference)
  */
object WordCountMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("wordcount")
    val lines = a.get("input") match {
      case Some(p) => graft.sources.Sources.readText(spark, p)
        .withColumnRenamed("value", "text")
      case None => Tables.documents(spark,
        a.getOrElse("data", "/root/testdata/sf0.001")).select(col("text"))
    }
    val counts = Tokenize.wordCount(lines, "text")
    a.get("output") match {
      case Some(out) => Sinks.writeText(counts, out)
      case None => Sinks.print(counts)
    }
    spark.stop()
  }
}
