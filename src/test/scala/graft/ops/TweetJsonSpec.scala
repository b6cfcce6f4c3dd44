package graft.ops

import graft.SparkSuite

/** R4/S7/F9 nested tweet-JSON parity against the reference's golden
  * fixture (`TwitterExampleData.java:22-28`). */
class TweetJsonSpec extends SparkSuite {
  import spark.implicits._

  private lazy val fixture = TweetJson.fixtureDf(spark)

  test("golden word count: (apache,3), (flink,3)") {
    val m = TweetJson.englishWordCount(fixture, "json")
      .as[(String, Long)].collect().toMap
    assert(m === Map("apache" -> 3L, "flink" -> 3L))
  }

  test("nested struct access: user.lang and hashtag array shape") {
    val rows = TweetJson.docMeta(fixture, "json")
      .as[(Long, String, Int, String)].collect().toSeq.sortBy(_._1)
    assert(rows === Seq(
      (0L, "en", 2, "example1"),
      (1L, "en", 2, "example2"),
      (2L, "en", 2, "example3")))
  }

  test("array<struct> explode: one row per hashtag with nested indices") {
    val tags = TweetJson.hashtags(fixture, "json")
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(tags === Seq(
      (0L, "example1", 0), (0L, "tweet1", 0),
      (1L, "example2", 0), (1L, "tweet2", 0),
      (2L, "example3", 0), (2L, "tweet3", 0)))
  }

  test("empty hashtags array yields null first_tag, not an ANSI error") {
    val docs = Seq(
      """{"id":5,"user":{"lang":"en","entities":{"hashtags":[]}}}""",
      """{"id":6,"user":{"lang":"en"}}""").toDF("json")
    val rows = TweetJson.docMeta(docs, "json")
      .as[(Long, String, Option[Int], Option[String])].collect().sortBy(_._1)
    assert(rows(0) === ((5L, "en", Some(0), None)))
    assert(rows(1) === ((6L, "en", None, None)))
  }

  test("non-English and text-less documents are filtered out") {
    val docs = Seq(
      """{"text":"Guten Tag","user":{"lang":"de"}}""",
      """{"user":{"lang":"en"}}""",
      """{"text":"hello world","user":{"lang":"en"}}""").toDF("json")
    val m = TweetJson.englishWordCount(docs, "json")
      .as[(String, Long)].collect().toMap
    assert(m === Map("hello" -> 1L, "world" -> 1L))
  }
}
