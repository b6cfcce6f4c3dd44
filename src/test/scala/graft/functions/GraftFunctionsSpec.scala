package graft.functions

import graft.SparkSuite

/** The custom expressions are first-class SQL citizens: registered via
  * SparkSessionExtensions, callable from spark.sql, codegen-compatible. */
class GraftFunctionsSpec extends SparkSuite {

  test("simhash64 is callable from SQL") {
    val r = spark.sql(
      "SELECT simhash64(array('alpha', 'beta')) AS h, simhash64(array('alpha', 'beta')) AS h2"
    ).collect().head
    assert(r.getString(0).matches("[0-9a-f]{16}"))
    assert(r.getString(0) === r.getString(1))
  }

  test("minhash_sig is callable from SQL and matches the documented min-md5 semantics") {
    val r = spark.sql(
      "SELECT minhash_sig(array('x y'), 2) AS mh, " +
        "least(md5('0:x y'), md5('0:x y')) AS m0, md5('1:x y') AS m1"
    ).collect().head
    val mh = r.getSeq[String](0)
    assert(mh === Seq(r.getString(1), r.getString(2)))
  }

  test("single-element and empty arrays behave (nulls for empty)") {
    val r = spark.sql("SELECT minhash_sig(cast(array() AS array<string>), 3) AS mh").collect().head
    assert(r.getSeq[String](0) === Seq(null, null, null))
    val s = spark.sql("SELECT simhash64(cast(array() AS array<string>)) AS h").collect().head
    assert(s.getString(0) === "0000000000000000") // zero votes → all-zero bits
  }
}
