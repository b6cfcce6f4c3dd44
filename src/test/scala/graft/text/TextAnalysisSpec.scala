package graft.text

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("skipgramPairs: forward window pairs off the array, no self-join in the plan") {
    val df = TextAnalysis.skipgramPairs(docs("a b c d", "a b"), window = 2)
    val got = df.as[(String, String, Long)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    // doc1 window-2 forward pairs: ab ac bc bd cd; doc2 adds ab again
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
    // edge: window past the end clamps; single-token and empty docs emit 0
    assert(TextAnalysis.skipgramPairs(docs("x", ""), window = 5).count() == 0)
    // the scale property: pairs generate from each row's own array — a
    // positional SELF-JOIN (quadratic at corpus scale) must not appear
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"positional join crept in:\n$plan")
  }

  test("langId: empty doc yields ratio 0.0 and 'und', never NaN") {
    val rows = TextAnalysis.langId(docs("", "   ", "the cat sat on the mat"))
      .as[(Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(rows(0) === ((0L, 0.0, "und")))
    assert(rows(1) === ((1L, 0.0, "und")))
    assert(rows(2)._2 > 0.02 && rows(2)._3 === "en") // 2×"the" in 6 tokens
  }

  test("qualityScore: empty doc yields zero ratios and keep=false") {
    val r = TextAnalysis.qualityScore(docs(""))
      .as[(Long, Long, Long, Double, Double, Boolean)].collect().head
    assert(r === ((0L, 0L, 0L, 0.0, 0.0, false)))
  }

  test("qualityScore: repetitive doc is dropped, diverse doc kept") {
    val rep = Seq.fill(20)("spam").mkString(" ")
    val div = (1 to 20).map(i => s"w$i").mkString(" ")
    val rows = TextAnalysis.qualityScore(docs(rep, div))
      .as[(Long, Long, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(rows(0)._6 === false && rows(0)._4 === 0.05) // 1 distinct / 20
    assert(rows(1)._6 === true && rows(1)._4 === 1.0)
  }

  test("tokenCount: ws vs BPE-ish segmentation") {
    val r = TextAnalysis.tokenCount(docs("ab12 cd-ef"))
      .as[(Long, Long, Long)].collect().head
    // ws: [ab12, cd-ef]; bpe-ish: [ab, 12, cd, -, ef]
    assert(r === ((0L, 2L, 5L)))
  }

  test("termStats/tfIdf: hand-computed tf, df, corpus size and weight") {
    val stats = TextAnalysis.termStats(docs("a a b", "b c"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sorted
    assert(stats === Seq(
      (0L, "a", 2L, 1L, 2L), (0L, "b", 1L, 2L, 2L),
      (1L, "b", 1L, 2L, 2L), (1L, "c", 1L, 1L, 2L)))
    val w = TextAnalysis.tfIdf(TextAnalysis.termStats(docs("a a b", "b c")))
      .select("doc_id", "word", "tfidf")
      .as[(Long, String, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    // tf=2, df=1, n=2: 2 * (ln(3/2) + 1)
    assert(math.abs(w((0L, "a")) - 2 * (math.log(3.0 / 2.0) + 1)) < 1e-12)
    // tf=1, df=2, n=2: ln(1) + 1 = 1
    assert(math.abs(w((0L, "b")) - 1.0) < 1e-12)
  }

  test("repetitionScore: hand-computed max-bigram share; short docs score 0") {
    val r = TextAnalysis.repetitionScore(
      docs("a b a b a b", "a b c d e f", "solo"), threshold = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    // "a b a b a b": 5 bigram occurrences, "a b" x3 → 0.6, dropped
    assert(r(0) === ((0L, 5L, 3L, 0.6, false)))
    // all-distinct bigrams: 5 occurrences, max 1 → 0.2, kept
    assert(r(1) === ((1L, 5L, 1L, 0.2, true)))
    // <2 tokens: no bigrams, ratio 0, kept
    assert(r(2) === ((2L, 0L, 0L, 0.0, true)))
  }

  test("redactPii: masks email, phone and IP; counts taken before masking") {
    val df = Seq((0L, "mail bob.smith+x@corp.example.org or +1-555-0042 at 192.168.0.1 done"),
      (1L, "nothing here")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(r(0) === ((0L, "mail <EMAIL> or <PHONE> at <IP> done", 1, 1, 1)))
    assert(r(1) === ((1L, "nothing here", 0, 0, 0)))
  }

  test("truncateTokens: exact prefix when over budget, identity when under") {
    val df = Seq((0L, "a b c d e"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.truncateTokens(df, budget = 3)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(r(0) === ((0L, 5, 3, "a b c")))
    assert(r(1) === ((1L, 2, 2, "x y")))
  }

  test("vocabEncode: frequency-then-alpha ids, OOV -> 0, original order kept") {
    // counts: b=3, a=2, c=2, z=1 -> vocab(minDf=2, size=2): b=1, a=2
    // (c loses the count tie with a alphabetically and falls off at size 2)
    val d = docs("a b c", "b c a", "b z")
    val got = TextAnalysis.vocabEncode(d, minDf = 2, vocabSize = 2)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, 3L, "2 1 0"),   // a b c -> 2 1 OOV
      (1L, 3L, "1 0 2"),   // b c a
      (2L, 2L, "1 0")))    // b z (z below minDf)
  }

  test("fingerprint: <2 tokens yields null, equal shingle sets share a fingerprint") {
    val rows = TextAnalysis.fingerprint(docs("solo", "a b c", "a b c"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(rows(0)._2.isEmpty)
    assert(rows(1)._2.nonEmpty && rows(1)._2 === rows(2)._2)
  }

  test("lmScore: hand-computed counts, ratio, and bands") {
    // corpus: a a a b -> cnt(a)=3, cnt(b)=1, N=4
    // doc0 "a a a": sum_cnt=9, mrf = 9/3/4 = 0.75
    // doc1 "b":     sum_cnt=1, mrf = 1/1/4 = 0.25
    val r = TextAnalysis.lmScore(docs("a a a", "b"), rareMax = 0.3, midMax = 0.5)
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(r(0) === ((0L, 3L, 9L, 0.75, "common")))
    assert(r(1) === ((1L, 1L, 1L, 0.25, "rare")))
  }

  test("lmLogProb: uniform-token doc scores log2 of its relative frequency") {
    // corpus "a a": p(a) = 1 -> log2 1 = 0; add rare "b" for a nonzero case
    val r = TextAnalysis.lmLogProb(docs("a a b", "a"))
      .as[(Long, Double)].collect().sortBy(_._1)
    // p(a)=3/4, p(b)=1/4; doc0 avg = (2*log2(.75) + log2(.25))/3
    val expect0 = (2 * math.log(0.75) / math.log(2) + math.log(0.25) / math.log(2)) / 3
    assert(math.abs(r(0)._2 - expect0) < 1e-12)
    assert(math.abs(r(1)._2 - math.log(0.75) / math.log(2)) < 1e-12)
  }

  test("noveltyScore: corpus-unique shingles counted per doc; 1-token docs drop") {
    // doc0 "a b c": shingles {a b, b c}; doc1 "a b d": {a b, b d}; doc2 "z"
    // df(a b)=2 shared; b c / b d unique -> each doc 1 novel of 2
    val r = TextAnalysis.noveltyScore(docs("a b c", "a b d", "z"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r.length === 2)
    assert(r(0) === ((0L, 2L, 1L, "novel"))) // 2*1 >= 2
    assert(r(1) === ((1L, 2L, 1L, "novel")))
  }

  test("vocabCoverage: exact covered mass per k, k past |vocab| clamps to total") {
    // counts: b=3, a=2, z=1 -> N=6; top1 covers 3, top2 covers 5, top9 covers 6
    val r = TextAnalysis.vocabCoverage(docs("b b b a", "a z"), Seq(1, 2, 9))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1, 3L, 6L), (2, 5L, 6L), (9, 6L, 6L)))
  }

  test("calibratedQuality: equal admission RATE per source regardless of " +
    "each source's score scale") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // source A: 10 diverse docs (high ratios); source B: 10 repetitive
    // docs (low ratios). A raw global cutoff would keep all of A and
    // none of B; per-source percentile keeps 8/10 of EACH.
    val texts =
      (0 until 10).map(i => ("a b c d e f g h i j".split(" ").take(3 + i % 7) :+ s"x$i").mkString(" ")) ++
      (0 until 10).map(i => (Seq.fill(12)("w") :+ s"y${i % 5}" :+ s"z$i").mkString(" "))
    val d = docs(texts: _*)
      .withColumn("source", when(col("doc_id") < 10, lit("A")).otherwise(lit("B")))
    val r = TextAnalysis.calibratedQuality(d, minPctRank = 0.2)
      .as[(Long, String, Double, Double, Boolean)].collect()
    val bySrc = r.groupBy(_._2).view.mapValues(rows => rows.count(_._5)).toMap
    assert(bySrc === Map("A" -> 8, "B" -> 8))
    // and within each source the kept docs are exactly the top-ranked
    r.groupBy(_._2).foreach { case (_, rows) =>
      val kept = rows.filter(_._5).map(_._4).min
      val droppedMax = rows.filterNot(_._5).map(_._4).max
      assert(droppedMax < kept)
    }
  }

  test("langAgreement: crosstab counts declared vs predicted per source") {
    import org.apache.spark.sql.functions.lit
    val d = docs("the cat is on the mat here now", "w w w w w")
      .withColumn("source", lit("s0")).withColumn("lang", lit("en"))
    val r = TextAnalysis.langAgreement(d)
      .as[(String, String, String, Long)].collect().sortBy(_._3)
    assert(r.toSeq === Seq(("s0", "en", "en", 1L), ("s0", "en", "und", 1L)))
  }

  test("boilerplate: shared prefixes flagged and stripped; short docs never match") {
    val d = docs(
      "the quick brown fox jumps",  // 0: shares 3-token prefix with 1
      "the quick brown cat sits",   // 1
      "a different start here",     // 2: unique prefix
      "the quick")                  // 3: shorter than the prefix length
    val r = TextAnalysis.boilerplate(d, prefixLen = 3, minDocs = 2)
      .as[(Long, Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(r === Seq(
      (0L, 5L, true, 2L), (1L, 5L, true, 2L),
      (2L, 4L, false, 4L), (3L, 2L, false, 2L)))
  }

  test("postings: df is the full count, postings capped at k and ascending") {
    // token 'x' in 5 docs (cap at 3), 'y' in 2, 'z' repeated within one
    // doc (must dedup to df 1)
    val d = docs("x y z z", "x y", "x", "x", "x")
    val r = TextAnalysis.postings(d, k = 3)
      .as[(String, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r === Map(
      "x" -> ((5L, "0,1,2")),
      "y" -> ((2L, "0,1")),
      "z" -> ((1L, "0"))))
  }
}
