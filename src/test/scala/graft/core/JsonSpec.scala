package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** [[Json.escape]] guards the hand-rolled one-line JSON artifacts: Spark
  * stage names interpolated into probe output carry arbitrary plan text
  * (quotes, backslashes, newlines), which unescaped breaks downstream
  * jq/python parsing of the artifact (r16 advisory). */
class JsonSpec extends AnyFunSuite {

  test("escape handles quotes, backslashes, and control characters") {
    assert(Json.escape("plain_name") === "plain_name")
    assert(Json.escape("""a "quoted" name""") === """a \"quoted\" name""")
    assert(Json.escape("""back\slash""") === """back\\slash""")
    assert(Json.escape("line1\nline2\ttab\rcr") === """line1\nline2\ttab\rcr""")
    assert(Json.escape("bell") === "bell\\u0007")
  }

  test("escaped output round-trips through a JSON parser shape") {
    val nasty = "WholeStageCodegen (1)\n+- HashAggregate \"x\\y\""
    val line = s"""{"name":"${Json.escape(nasty)}"}"""
    // minimal structural check: balanced quotes, no raw control chars
    assert(!line.exists(c => c < 0x20))
    assert(line.count(_ == '"') % 2 === 0)
  }
}
