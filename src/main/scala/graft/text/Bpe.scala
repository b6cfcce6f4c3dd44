package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training + encoding — the
  * corpus-to-tokenizer step of a pretraining pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Training is the map-reduce formulation: work happens on the UNIQUE-
  * WORD table (word, freq) — at 100 TB the corpus is ~10^13 tokens but
  * the unique-word table is ~10^8-10^9 rows, so each merge iteration is
  * one bounded shuffle over the word table, never a corpus pass. Each
  * iteration: (1) explode adjacent symbol pairs, (2) freq-weighted pair
  * count (partial aggregation map-side), (3) argmax via a distributed
  * `orderBy.limit(1)` (TakeOrderedAndProject — no global sort), (4)
  * apply the winning merge map-side to every word's symbol array. The
  * single-row argmax collect is the algorithm's inherent sequential
  * dependency (merge i+1's counts depend on merge i), not a driver-side
  * data loop.
  *
  * Symbol arrays are mutated in a typed `Dataset.map` rather than SQL
  * HOFs: left-to-right non-overlapping merge application is a sequential
  * scan with lookahead, which `transform()` cannot express (its lambda
  * sees one element at a time) — this is the genuine per-row imperative
  * case the design doc reserves typed maps for. Lineage is truncated
  * with `localCheckpoint` every few merges so the plan does not grow
  * linearly in merge count (measured r3: analyzer OOM on iterative
  * frames without truncation).
  *
  * Determinism: ties in pair counts break on the pair's string order,
  * so the learned merge table is a pure function of the corpus.
  */
object Bpe {

  /** End-of-word marker appended as a final symbol, as in the original
    * BPE formulation — lets the tokenizer distinguish "low" inside
    * "lowest" from the word "low". */
  val EndOfWord = "</w>"

  case class WordSyms(word: String, syms: Seq[String], freq: Long)
  case class Merge(rank: Int, left: String, right: String, pair_freq: Long)

  private def tokens(df: DataFrame) =
    // native one-pass tokenizer == filter(split(text, " "), length > 0)
    df.select(explode(
      graft.functions.GraftFunctions.spaceTokens(col("text"))).as("word"))

  /** Merge every non-overlapping left-to-right occurrence of (l, r). */
  private[text] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merges from the corpus. Returns the ranked merge
    * table (rank, left, right, pair_freq); stops early when no pair
    * occurs at least `minPairFreq` times. */
  def train(df: DataFrame, numMerges: Int, minPairFreq: Long = 2L): Dataset[Merge] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var words: Dataset[WordSyms] = tokens(df)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordSyms(w, w.map(_.toString) :+ EndOfWord, f) }
      .localCheckpoint() // truncate: everything below never re-runs
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // freq-weighted adjacent-pair counts; map-side partial agg keeps
      // the shuffle bounded by distinct-pair cardinality
      val best = words
        .flatMap(ws => ws.syms.iterator.zip(ws.syms.iterator.drop(1))
          .map { case (a, b) => (a, b, ws.freq) })
        .toDF("l", "r", "freq")
        .groupBy("l", "r").agg(sum("freq").as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("l").asc, col("r").asc)
        .limit(1) // TakeOrderedAndProject: distributed top-1, no global sort
        .as[(String, String, Long)]
        .collect() // exactly one row — the sequential merge decision
      best.headOption.filter(_._3 >= minPairFreq) match {
        case None => done = true
        case Some((l, r, pf)) =>
          merges += Merge(rank, l, r, pf)
          val prev = words
          words = words.map(ws => ws.copy(syms = applyMerge(ws.syms, l, r)))
          // re-checkpoint every iteration: each map is cheap, but the
          // chained plan would re-apply ALL merges per pass otherwise
          words = words.localCheckpoint()
          prev.unpersist()
          rank += 1
      }
    }
    merges.toSeq.toDS()
  }

  /** Encode documents with a learned merge table: per word, apply the
    * merges in rank order (the standard greedy BPE encode), then count
    * the resulting subword units per document. Map-side only — the
    * ranked merge list broadcasts (a tokenizer is ≤ ~10^5 merges), and a
    * per-partition word cache memoizes segmentation so each DISTINCT
    * word per partition pays the merge loop once (words repeat heavily:
    * Zipf). */
  def encode(df: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val bc = spark.sparkContext.broadcast(ordered)
    df.select(col("doc_id"),
      graft.functions.GraftFunctions.spaceTokens(col("text")).as("tk"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        def nUnits(w: String): Int = cache.getOrElseUpdate(w, {
          var syms: Seq[String] = w.map(_.toString) :+ EndOfWord
          ms.foreach { case (l, r) =>
            if (syms.length > 1) syms = applyMerge(syms, l, r)
          }
          syms.length
        })
        it.map { case (id, tk) =>
          (id, tk.length.toLong, tk.iterator.map(w => nUnits(w).toLong).sum)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_units")
  }
}
