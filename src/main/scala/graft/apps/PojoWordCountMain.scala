package graft.apps

import org.apache.spark.sql.functions.col

import graft.core.{Args, GraftSession, Tables}
import graft.sinks.Sinks

/** Runnable mirror of `PojoExample.java:51-89`: the same word count over
  * a TYPED record (`Word` ↔ the reference's mutable POJO, here an
  * immutable case class with the `Encoder` playing TypeInformation's
  * role — SURVEY.md §1.3). Typed flatMap/groupByKey variant, kept to
  * demo the Dataset API; the column form in WordCountMain is the
  * codegen-friendly hot path. */
object PojoWordCountMain {

  case class Word(word: String, frequency: Long)

  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("pojo-wordcount")
    import spark.implicits._
    val texts = Tables.documents(spark,
      a.getOrElse("data", "/root/testdata/sf0.001"))
      .select(col("text")).as[String]
    val words = texts
      .flatMap(_.toLowerCase.split("\\W+"))
      .filter(_.nonEmpty)
      .map(Word(_, 1L))
    val counts = words.groupByKey(_.word)
      .mapGroups((w, it) => Word(w, it.map(_.frequency).sum))
    a.get("output") match {
      case Some(out) => Sinks.writeText(counts.toDF(), out)
      case None => Sinks.print(counts.toDF())
    }
    spark.stop()
  }
}
