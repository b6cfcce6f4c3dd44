package graft.text

import graft.SparkSuite

/** Checks distributed BPE against an independent in-memory reference
  * implementation (the naive dictionary algorithm from the original BPE
  * paper) — the strongest check available for an operator whose output
  * is a sequential data-dependent argmax chain (not SQL-expressible). */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Naive reference: same algorithm, zero Spark. */
  private def naiveTrain(corpus: Seq[String], numMerges: Int,
                         minPairFreq: Long): Seq[(String, String, Long)] = {
    var words: Map[Seq[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => (w.map(_.toString) :+ Bpe.EndOfWord, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.length < numMerges && continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best.filter(_._2 >= minPairFreq) match {
        case None => continue = false
        case Some(((l, r), c)) =>
          out += ((l, r, c))
          words = words.map { case (syms, f) => (Bpe.applyMerge(syms, l, r), f) }
            .groupBy(_._1).view.mapValues(_.values.sum).toMap
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low lower lower newest newest newest newest widest",
    "widest widest newest low lowest")

  test("train matches the naive reference merge-for-merge (order, pairs, counts)") {
    val got = Bpe.train(docs(corpus: _*), numMerges = 12, minPairFreq = 2)
      .collect().sortBy(_.rank)
      .map(m => (m.left, m.right, m.pair_freq)).toSeq
    val want = naiveTrain(corpus, 12, 2)
    assert(got === want)
    assert(got.nonEmpty && got.length <= 12)
  }

  test("applyMerge is left-to-right and non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") === Seq("x"))
  }

  test("train stops early when no pair reaches minPairFreq") {
    // every word unique, every char pair frequency 1
    val merges = Bpe.train(docs("ab cd ef"), numMerges = 5, minPairFreq = 2).collect()
    assert(merges.isEmpty)
  }

  test("encode replays training: corpus words segment to the trained symbol counts") {
    val d = docs(corpus: _*)
    val merges = Bpe.train(d, numMerges = 8, minPairFreq = 2).collect().toSeq
    val enc = Bpe.encode(d, merges).as[(Long, Long, Long)].collect().sortBy(_._1)
    // reference: apply the same merges to each word of each doc
    val expected = corpus.zipWithIndex.map { case (t, i) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      val units = tk.map { w =>
        var syms: Seq[String] = w.map(_.toString) :+ Bpe.EndOfWord
        merges.sortBy(_.rank).foreach(m => syms = Bpe.applyMerge(syms, m.left, m.right))
        syms.length.toLong
      }.sum
      (i.toLong, tk.length.toLong, units)
    }
    assert(enc.toSeq === expected)
    // merging strictly reduces unit count vs raw chars+marker
    val raw = corpus.map(_.split(" ").filter(_.nonEmpty).map(_.length + 1).sum)
    enc.zip(raw).foreach { case ((_, _, units), r) => assert(units < r) }
  }

  test("more merges never increase a document's unit count (monotone compression)") {
    val d = docs(corpus: _*)
    val all = Bpe.train(d, numMerges = 10, minPairFreq = 2).collect().toSeq
    val few = all.take(3)
    val encFew = Bpe.encode(d, few).as[(Long, Long, Long)].collect().sortBy(_._1)
    val encAll = Bpe.encode(d, all).as[(Long, Long, Long)].collect().sortBy(_._1)
    encFew.zip(encAll).foreach { case ((_, _, f), (_, _, a)) => assert(a <= f) }
  }
}
