package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R4/S7/F9: the full nested tweet-JSON pipeline
  * (`TwitterExample.java:131-169`, fixtures `TwitterExampleData.java:22-28`).
  *
  * The reference parses each tweet document with Jackson, keeps tweets with
  * `user.lang == "en"` and a `text` field, then tokenizes the text into
  * lowercase `(word, 1)` pairs. Here the parse is one `from_json` with an
  * explicit nested schema — Catalyst prunes the parse to the referenced
  * fields (only `text`, `user.lang`, `user.entities.hashtags` are ever
  * materialized), which at 100 TB means the JSON parser skips everything
  * else per record.
  */
object TweetJson {

  val hashtagType: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("indices", ArrayType(IntegerType))))

  /** Nested tweet schema — the subset of fields the reference reads plus
    * enough structure to prove nested struct + array-of-struct access.
    * `from_json` tolerates absent fields (null), extra fields (ignored). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("id", LongType),
    StructField("id_str", StringType),
    StructField("text", StringType),
    StructField("truncated", BooleanType),
    StructField("user", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("screen_name", StringType),
      StructField("location", StringType),
      StructField("lang", StringType),
      StructField("entities", StructType(Seq(
        StructField("hashtags", ArrayType(hashtagType)))))))
    )))

  /** Parse a JSON-string column into the nested tweet struct `t`. */
  def parse(df: DataFrame, jsonCol: String): DataFrame =
    df.select(from_json(col(jsonCol), tweetSchema).as("t"))

  /** The reference pipeline: select English tweets, tokenize text into
    * lowercase words (StringTokenizer default delimiters = whitespace;
    * the `replaceAll("\\s*", "")` is a no-op on whitespace-free tokens).
    * Emits one row per (word). */
  def englishWords(df: DataFrame, jsonCol: String): DataFrame =
    parse(df, jsonCol)
      .filter(col("t.user.lang") === "en" && col("t.text").isNotNull)
      .select(explode(split(col("t.text"), "\\s+")).as("w"))
      .select(lower(col("w")).as("word"))
      .filter(length(col("word")) > 0)

  /** Word count over English tweets — the batch final state of the
    * reference's running keyed sum. */
  def englishWordCount(df: DataFrame, jsonCol: String): DataFrame =
    englishWords(df, jsonCol).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Doc-level nested projection: id, user.lang, hashtag array access
    * (count + first tag) — exercises struct-in-struct and
    * array<struct> paths. */
  def docMeta(df: DataFrame, jsonCol: String): DataFrame =
    parse(df, jsonCol).select(
      col("t.id").as("id"),
      col("t.user.lang").as("lang"),
      size(col("t.user.entities.hashtags")).as("n_hashtags"),
      // guarded: element_at(…, 1) on an EMPTY array throws under ANSI
      // (a null/missing array is fine); the oracle yields NULL there
      when(size(col("t.user.entities.hashtags")) > 0,
        element_at(col("t.user.entities.hashtags"), 1).getField("text"))
        .as("first_tag"))

  /** Flatten the nested hashtags array<struct>: one row per (tweet id,
    * hashtag text, first index). */
  def hashtags(df: DataFrame, jsonCol: String): DataFrame =
    parse(df, jsonCol)
      .select(col("t.id").as("id"),
        explode(col("t.user.entities.hashtags")).as("h"))
      .select(col("id"), col("h.text").as("tag"),
        element_at(col("h.indices"), 1).as("idx0"))

  /** Golden fixture documents — JSON docs shaped like tweets (the
    * reference embeds these as test data, TwitterExampleData.java:22-26;
    * they are synthetic, "not acquired from Twitter"). Kept byte-identical
    * for parity with the reference's golden running-count output. */
  val FixtureTexts: Seq[String] = Seq(
    """{"created_at":"Mon Jan 1 00:00:00 +0000 1901","id":0,"id_str":"000000000000000000","text":"Apache Flink","source":null,"truncated":false,"in_reply_to_status_id":null,"in_reply_to_status_id_str":null,"in_reply_to_user_id":null,"in_reply_to_user_id_str":null,"in_reply_to_screen_name":null,"user":{"id":0,"id_str":"0000000000","name":"Apache Flink","screen_name":"Apache Flink","location":"Berlin","protected":false,"verified":false,"followers_count":999999,"friends_count":99999,"listed_count":999,"favourites_count":9999,"statuses_count":999,"created_at":"Mon Jan 1 00:00:00 +0000 1901","utc_offset":7200,"time_zone":"Amsterdam","geo_enabled":false,"lang":"en","entities":{"hashtags":[{"text":"example1","indices":[0,0]},{"text":"tweet1","indices":[0,0]}]},"contributors_enabled":false,"is_translator":false,"profile_background_color":"C6E2EE","profile_background_tile":false,"profile_link_color":"1F98C7","profile_sidebar_border_color":"FFFFFF","profile_sidebar_fill_color":"252429","profile_text_color":"666666","profile_use_background_image":true,"default_profile":false,"default_profile_image":false,"following":null,"follow_request_sent":null,"notifications":null},"geo":null,"coordinates":null,"place":null,"contributors":null}""",
    """{"created_at":"Mon Jan 1 00:00:00 +0000 1901","id":1,"id_str":"000000000000000000","text":"Apache Flink","source":null,"truncated":false,"in_reply_to_status_id":null,"in_reply_to_status_id_str":null,"in_reply_to_user_id":null,"in_reply_to_user_id_str":null,"in_reply_to_screen_name":null,"user":{"id":0,"id_str":"0000000000","name":"Apache Flink","screen_name":"Apache Flink","location":"Berlin","protected":false,"verified":false,"followers_count":999999,"friends_count":99999,"listed_count":999,"favourites_count":9999,"statuses_count":999,"created_at":"Mon Jan 1 00:00:00 +0000 1901","utc_offset":7200,"time_zone":"Amsterdam","geo_enabled":false,"lang":"en","entities":{"hashtags":[{"text":"example2","indices":[0,0]},{"text":"tweet2","indices":[0,0]}]},"contributors_enabled":false,"is_translator":false,"profile_background_color":"C6E2EE","profile_background_tile":false,"profile_link_color":"1F98C7","profile_sidebar_border_color":"FFFFFF","profile_sidebar_fill_color":"252429","profile_text_color":"666666","profile_use_background_image":true,"default_profile":false,"default_profile_image":false,"following":null,"follow_request_sent":null,"notifications":null},"geo":null,"coordinates":null,"place":null,"contributors":null}""",
    """{"created_at":"Mon Jan 1 00:00:00 +0000 1901","id":2,"id_str":"000000000000000000","text":"Apache Flink","source":null,"truncated":false,"in_reply_to_status_id":null,"in_reply_to_status_id_str":null,"in_reply_to_user_id":null,"in_reply_to_user_id_str":null,"in_reply_to_screen_name":null,"user":{"id":0,"id_str":"0000000000","name":"Apache Flink","screen_name":"Apache Flink","location":"Berlin","protected":false,"verified":false,"followers_count":999999,"friends_count":99999,"listed_count":999,"favourites_count":9999,"statuses_count":999,"created_at":"Mon Jan 1 00:00:00 +0000 1901","utc_offset":7200,"time_zone":"Amsterdam","geo_enabled":false,"lang":"en","entities":{"hashtags":[{"text":"example3","indices":[0,0]},{"text":"tweet3","indices":[0,0]}]},"contributors_enabled":false,"is_translator":false,"profile_background_color":"C6E2EE","profile_background_tile":false,"profile_link_color":"1F98C7","profile_sidebar_border_color":"FFFFFF","profile_sidebar_fill_color":"252429","profile_text_color":"666666","profile_use_background_image":true,"default_profile":false,"default_profile_image":false,"following":null,"follow_request_sent":null,"notifications":null},"geo":null,"coordinates":null,"place":null,"contributors":null}""")

  /** The reference's golden per-record running-count emission for the
    * fixture (`TwitterExampleData.STREAMING_COUNTS_AS_TUPLES`). */
  val GoldenRunningCounts: Seq[(String, Long)] = Seq(
    "apache" -> 1L, "apache" -> 2L, "apache" -> 3L,
    "flink" -> 1L, "flink" -> 2L, "flink" -> 3L)

  def fixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FixtureTexts.toDF("json")
  }
}
