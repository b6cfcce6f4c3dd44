package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** R1/R2/R3 tokenizer edge cases (`WordCount.java:106-122`,
  * `SocketWindowWordCount.scala:62`, `TwitterExample.java:84-97`). */
class TokenizeSpec extends SparkSuite {
  import spark.implicits._

  private def wc(texts: String*): Map[String, Long] =
    Tokenize.wordCount(texts.toDF("text"), "text")
      .as[(String, Long)].collect().toMap

  test("R1 lowercases, splits on \\W+, drops empties") {
    assert(wc("Hello, World! hello") === Map("hello" -> 2L, "world" -> 1L))
  }

  test("R1 punctuation-only and empty lines produce no tokens") {
    assert(wc("?!.,;", "", "  ") === Map.empty[String, Long])
  }

  test("R1 digits survive \\W+ tokenization") {
    assert(wc("abc 123 abc123") === Map("abc" -> 1L, "123" -> 1L, "abc123" -> 1L))
  }

  test("R2 \\s split keeps empty tokens (reference parity)") {
    // "a  b" splits to ["a", "", "b"] — the reference does not filter
    val m = Tokenize.wordCountWs(Seq("a  b").toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(m === Map("a" -> 1L, "" -> 1L, "b" -> 1L))
  }

  test("R3 conditional fan-out emits ALL tokens uppercased when needle present") {
    val out = Tokenize.conditionalFanout(
      Seq("Spark is fast", "flink only", "I like SPARK too").toDF("text"),
      "text", "spark").as[String].collect().sorted.toSeq
    assert(out === Seq("FAST", "I", "IS", "LIKE", "SPARK", "SPARK", "TOO").sorted)
  }

  test("R3 conditional fan-out emits nothing when needle absent") {
    val out = Tokenize.conditionalFanout(
      Seq("no match here").toDF("text"), "text", "spark").count()
    assert(out === 0L)
  }
}
