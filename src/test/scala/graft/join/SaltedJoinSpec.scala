package graft.join

import graft.SparkSuite

class SaltedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted inner join == plain inner join (multiset), skew spread over sub-keys") {
    // 10k rows of one hot key + a uniform tail, joined to a small dim.
    val big = (Seq.fill(10000)(1L) ++ (2L to 500L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (999L, "absent"))
      .toDF("sk", "name")

    val plain = big.join(small, big("k") === small("sk"), "inner")
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = SaltedJoin.inner(big, "k", small, "sk", salts = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._3 == "hot") === 10000)
  }

  test("saltBy unique id spreads byte-identical duplicate rows across sub-keys") {
    // 1000 byte-identical (key, payload) rows — whole-row hashing puts
    // them all in ONE sub-key; salting by the unique id spreads them.
    val big = (1L to 1000L).map(i => (1L, "same", i)).toDF("k", "payload", "row_id")
    val small = Seq((1L, "dim")).toDF("sk", "name")
    val out = SaltedJoin.inner(big, "k", small, "sk", salts = 8, saltBy = Some("row_id"))
    assert(out.count() === 1000L)
    import org.apache.spark.sql.functions.{countDistinct, pmod, xxhash64, col, lit}
    val spread = big.select(pmod(xxhash64(col("row_id")), lit(8)).as("s"))
      .agg(countDistinct("s")).as[Long].head()
    assert(spread >= 4, s"id salt failed to spread: $spread sub-keys")
  }

  test("salting is deterministic across runs (retry-safe)") {
    val big = (1L to 200L).map(k => (k % 5, k)).toDF("k", "payload")
    val small = (0L to 4L).map(k => (k, s"d$k")).toDF("sk", "name")
    val r1 = SaltedJoin.inner(big, "k", small, "sk", 4).collect().map(_.toString).sorted
    val r2 = SaltedJoin.inner(big, "k", small, "sk", 4).collect().map(_.toString).sorted
    assert(r1.toSeq === r2.toSeq)
  }
}
