package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All operators are single-pass, per-row Catalyst expressions (no UDFs,
  * no shuffle except the final agg where noted) — at 100 TB they run
  * map-side at scan speed with column pruning down to (doc_id, text).
  */
object TextAnalysis {

  /** Whitespace tokens of a text column (documents are pre-normalized
    * lowercase `[a-z ]` — see FIXTURES.md §B). */
  private def toks(text: Column): Column =
    // one-pass native kernel == filter(split(text, " "), t => length(t) > 0)
    // (r20: the filter HOF ran interpreted per token — see TextKernels)
    graft.functions.GraftFunctions.spaceTokens(text)

  /** Stopword list for the n-gram/stopword language heuristic. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Language ID via stopword-hit ratio: fraction of tokens that are
    * English stopwords; >= 2% → 'en', else 'und'. A real pipeline swaps
    * the wordlist per language; the operator shape (token-set membership
    * ratio + threshold) is the load-bearing part. */
  def langId(df: DataFrame): DataFrame = {
    // tokens materialized in their own projection — the expression below
    // references them 4x, and HOFs run interpreted (see Dedup notes)
    val tk = col("tk")
    val sw = array(EnStopwords.map(lit): _*)
    // native kernel (r20) == size(filter(tk, w => array_contains(sw, w)))
    val hits = graft.functions.GraftFunctions.wordHits(tk, sw)
    val total = size(tk)
    // Empty-doc guard: 0 tokens → ratio 0.0 / 'und', never NaN.
    val ratio = when(total > 0, hits.cast("double") / total).otherwise(lit(0.0))
    df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(
        col("doc_id"),
        ratio.as("en_ratio"),
        when(ratio >= 0.02, "en").otherwise("und").as("lang_pred"))
  }

  /** Quality scoring: token count, distinct-token ratio (repetitiveness),
    * mean token length, and a composite keep/drop flag — the standard
    * cheap pre-filters before expensive dedup/training. */
  def qualityScore(df: DataFrame): DataFrame = {
    // tokens materialized once (referenced 5x below — see langId note)
    val tk = col("tk")
    val n = size(tk)
    val nd = size(array_distinct(tk))
    // Empty-doc guards: 0 tokens → 0.0 ratios and keep=false, never NaN.
    val dRatio = when(n > 0, nd.cast("double") / n).otherwise(lit(0.0))
    // native kernel (r20) == aggregate(tk, 0L, (acc, w) => acc + length(w))
    val meanLen = when(n > 0,
      graft.functions.GraftFunctions.tokenLenSum(tk).cast("double") / n)
      .otherwise(lit(0.0))
    df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(
        col("doc_id"),
        n.cast("bigint").as("n_tokens"),
        nd.cast("bigint").as("n_distinct"),
        dRatio.as("distinct_ratio"),
        meanLen.as("mean_token_len"),
        (n >= 10 && dRatio >= 0.2).as("keep"))
  }

  /** [[qualityScore]]'s keep predicate as an inline Column over a
    * MATERIALIZED token-array column — for pipelines that must keep
    * their other columns (a streaming ingest can't afford the self-join
    * that re-attaching them would cost). Pass `toksCol(text)` projected
    * in its own select first (HOF re-evaluation trap, see above). */
  def qualityKeep(tk: Column): Column = {
    val n = size(tk)
    val dRatio = when(n > 0,
      size(array_distinct(tk)).cast("double") / n).otherwise(lit(0.0))
    n >= 10 && dRatio >= 0.2
  }

  /** The tokenizer as a public Column, for [[qualityKeep]] callers. */
  def toksCol(text: Column): Column = toks(text)

  /** Per-source CALIBRATED quality filtering: a raw quality cutoff
    * applied corpus-wide keeps whatever each source's score distribution
    * happens to contain — a clean source sails through, a noisy one
    * floods the corpus. Normalizing the score to its percentile rank
    * WITHIN source ("keep the top (1-q) of every source") equalizes the
    * admission rate across provenances, which is how production
    * pipelines actually threshold heterogeneous feeds. One shuffle on
    * source; the window sort is per-source, never global (and a skewed
    * source is a skewed SORT, not a collapsed partition — range-split it
    * upstream if one source is half the corpus). Ordering is
    * (score, doc_id): total, so percent_rank is deterministic. */
  def calibratedQuality(df: DataFrame, minPctRank: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("distinct_ratio"), col("doc_id"))
    qualityScore(df)
      .join(df.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("distinct_ratio"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("keep_cal", col("pct_rank") >= minPctRank)
  }

  /** Declared-vs-predicted language agreement crosstab per source — the
    * data-quality audit that catches a feed whose metadata lies about
    * its language (or a language-ID model drifting on one source). One
    * map-side scoring pass + one small aggregation. */
  def langAgreement(df: DataFrame): DataFrame =
    langId(df)
      .join(df.select(col("doc_id"), col("source"), col("lang")), "doc_id")
      .groupBy(col("source"), col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (`[a-z]+` word pieces / `[0-9]+` digit runs / any other non-space
    * symbol — the shape a byte-pair pre-tokenizer uses). The pattern is
    * lookaround-free so it runs identically under Java regex and RE2. */
  def tokenCount(df: DataFrame): DataFrame = {
    val ws = size(toks(col("text")))
    val bpeish = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    df.select(col("doc_id"), ws.cast("bigint").as("ws_tokens"),
      bpeish.cast("bigint").as("bpeish_tokens"))
  }

  /** Repetition score: the most frequent word bigram's share of all
    * bigram OCCURRENCES — the boilerplate/spam signal (repeated
    * navigation text, keyword stuffing) quality pipelines threshold on.
    *
    * Formulated as explode → (doc, bigram) count → per-doc max/sum: two
    * codegen'd partial-agg shuffles. (A per-row nested-HOF count —
    * `transform(distinct, b => count(bg == b))` — is the measured
    * interpreted-quadratic trap: O(len²) lambda evals per document.)
    * Docs with <2 tokens survive via the left join with 0 bigrams.
    * Integer counts ratioed once, so the double is engine-exact. */
  def repetitionScore(df: DataFrame, threshold: Double = 0.2): DataFrame = {
    // r20 restructure (guide §8: decide with small rows): the pipeline
    // form exploded every bigram OCCURRENCE — corpus×(tokens−1) rows —
    // through TWO aggregate exchanges to compute two per-doc integers.
    // The native BigramRepStats kernel computes the identical pair
    // (occurrences = m−1, max multiplicity; same bigram identity and
    // integer counts — see TextKernels) inside the scan: zero shuffle,
    // and docs with < 2 tokens get (0, 0) exactly like the old left
    // join + coalesce.
    df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.bigramRepStats(col("tk")).as("st"))
      .select(col("doc_id"),
        col("st.n_bigrams").as("n_bigrams"),
        col("st.max_rep").as("max_rep"))
      .withColumn("rep_ratio",
        when(col("n_bigrams") > 0,
          col("max_rep").cast("double") / col("n_bigrams")).otherwise(0.0))
      .withColumn("keep", col("rep_ratio") < threshold)
  }

  /** TF-IDF term statistics: per (doc, term) frequency, per-term document
    * frequency, and the corpus size — the exact-integer core of TF-IDF
    * weighting. The weight itself (`tfIdf`) multiplies in a logarithm,
    * whose last-bit value is libm-dependent and therefore NOT part of the
    * hash-checked surface; the joins and counts — the part that costs
    * anything at 100 TB — are.
    *
    * Plan shape: one explode + (doc,term) partial-agg shuffle; df is a
    * second partial agg over the first's output (already partitioned by
    * a superset key, so AQE keeps it cheap); the corpus size broadcasts
    * as a literal. */
  def termStats(df: DataFrame): DataFrame = {
    val nDocs = df.select(col("doc_id")).count()
    val tf = df.select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "word")
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        lit(nDocs).as("n_docs"))
  }

  /** Smoothed TF-IDF weight over `termStats` output (sklearn-style:
    * tf · (ln((n+1)/(df+1)) + 1)). Double-precision log — use for
    * ranking/filtering, not for cross-engine hash comparison. */
  def tfIdf(stats: DataFrame): DataFrame =
    stats.withColumn("tfidf",
      col("tf") * (log((col("n_docs") + 1).cast("double") /
        (col("df") + 1).cast("double")) + 1))

  /** Document fingerprint: min-of-hashes over word bigram shingles
    * (winnowing-style selection with k=1). Equal fingerprints ⇒ highly
    * similar shingle sets; used as a cheap near-dup pre-cluster key.
    * The hash is md5-hex (engine-neutral, lexicographic min). */
  def fingerprint(df: DataFrame): DataFrame = {
    // Tokens materialized in their own projection first: element_at back
    // into a computed array re-evaluates the whole filter(split(...)) per
    // lambda element (HOFs run interpreted, no CSE).
    val tk = col("tk")
    // Guarded like Dedup.shinglesOf (short docs → empty array); the
    // bigram construction is the shared native WordShingles kernel (r20)
    // instead of the interpreted transform/element_at chain.
    val bigrams = when(size(tk) >= 2,
      graft.functions.GraftFunctions.wordShingles(tk, 2, distinct = false))
      .otherwise(array().cast("array<string>"))
    df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(
        col("doc_id"),
        array_min(transform(bigrams, s => md5(s))).as("fingerprint"))
  }

  /** PII-redaction regexes — deliberately restricted to syntax whose
    * semantics are identical in Java regex (Spark codegen) and RE2
    * (DuckDB oracle): character classes, bounded repetition, \b. The
    * SAME strings are interpolated into the oracle SQL. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction: mask emails, phone numbers and IPv4 addresses with
    * typed placeholder tokens, and count each class BEFORE masking (the
    * audit trail a compliance pipeline wants). Pure map-side regex work
    * inside whole-stage codegen — zero shuffle at any scale. Replacement
    * ORDER matters (an email contains no phone/IP substring under these
    * anchored patterns, but the discipline is: count first, then
    * email → phone → ip) and is mirrored in the oracle. */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.select(
      col("doc_id"),
      redacted(col(textCol)).as("text_redacted"),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      regexp_count(col(textCol), lit(IpRe)).as("n_ips"))

  /** The masking expression alone, for column-preserving callers. */
  def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  /** Token-budget truncation: keep the first `budget` whitespace tokens
    * of each document — the context-window clamp before packing. RAW
    * single-space split (not the empty-filtered tokenizer) so the
    * reconstruction `array_join(slice(...), " ")` is the exact prefix of
    * the original text; map-side only. */
  def truncateTokens(df: DataFrame, budget: Int): DataFrame = {
    require(budget > 0)
    val tk = split(col("text"), " ")
    df.select(col("doc_id"), tk.as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).as("n_tokens"),
        least(size(col("tk")), lit(budget)).as("n_kept"),
        array_join(slice(col("tk"), 1, budget), " ").as("text_trunc"))
  }

  /** Vocabulary build + token-ID encoding — the corpus→tensors prep
    * step: rank tokens by (frequency desc, token asc — a total order, so
    * the vocabulary is deterministic on any cluster), keep the top
    * `vocabSize` as ids 1..vocabSize, and re-encode every document as a
    * space-joined id sequence in original token order; out-of-vocabulary
    * tokens map to 0 (the UNK id).
    *
    * Scale shape: one token-count shuffle; the top-`vocabSize` cut is a
    * distributed `orderBy(...).limit(vocabSize)` — Spark plans it as
    * TakeOrderedAndProject (map-side per-partition top-k, then a bounded
    * merge of ≤ vocabSize rows per partition), so NO task ever sorts the
    * full min-df'd token-type set (at web scale that set is itself
    * hundreds of millions of types). Only the ≤ vocabSize survivors pass
    * through the single-partition ranking window; encoding is one
    * broadcast-or-shuffle join from tokens to ids and one doc_id shuffle
    * to reassemble. */
  def vocabEncode(df: DataFrame, minDf: Long, vocabSize: Int): DataFrame = {
    require(vocabSize > 0 && minDf >= 1)
    val tok = df
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "tok")))
    // (cnt desc, tok asc) is a total order, so limit(vocabSize) keeps
    // exactly the rows the old rank<=vocabSize filter kept and the
    // re-rank over the survivors assigns identical ids.
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minDf)
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize)
      .withColumn("tok_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok").asc)))
      .select("tok", "tok_id")
    tok.join(vocab, Seq("tok"), "left_outer")
      .select(col("doc_id"), col("pos"), coalesce(col("tok_id"), lit(0)).as("tid"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("tid")))).as("cs"))
      .select(
        col("doc_id"),
        expr("size(cs)").cast("bigint").as("n_tokens"),
        expr("array_join(transform(cs, c -> cast(c.tid AS string)), ' ')").as("ids"))
  }

  /** Unigram-LM document scoring: score each document by the mean
    * corpus-relative frequency of its tokens — the cheap, trainable-
    * nowhere analogue of a KenLM perplexity filter (documents made of
    * rare token types score low, boilerplate made of the corpus's most
    * common tokens scores high). The hash-checked surface is the exact
    * integer evidence (token count, summed corpus counts) plus one
    * double ratio whose op order is mirrored in the oracle; the log-prob
    * variant (libm-dependent last bits, like [[tfIdf]]) stays out of the
    * checked surface — see [[lmLogProb]].
    *
    * `mean_rel_freq = (Σ_t cnt(t)) / n_tokens / N` is scale-invariant
    * (≈ 1/|vocab| for in-distribution text), so the band thresholds
    * survive corpus growth — no bigint product that would overflow at
    * 100 TB token counts.
    *
    * Plan shape: one token-count shuffle, one token-level join (AQE
    * broadcasts the count table while the vocabulary is small; falls
    * back to a shuffle join at web-scale vocabularies), one doc_id
    * partial agg, and a broadcast of the single-row corpus total. */
  def lmScore(df: DataFrame, rareMax: Double, midMax: Double): DataFrame = {
    require(rareMax < midMax, s"band thresholds must be ordered: $rareMax < $midMax")
    val tok = df.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val vc = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = vc.agg(sum(col("cnt")).cast("double").as("n_corpus"))
    tok.join(vc, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("mean_rel_freq",
        col("sum_cnt").cast("double") / col("n_tokens").cast("double") / col("n_corpus"))
      .withColumn("band",
        when(col("mean_rel_freq") < rareMax, "rare")
          .when(col("mean_rel_freq") < midMax, "mid")
          .otherwise("common"))
      .select(col("doc_id"), col("n_tokens"), col("sum_cnt"),
        col("mean_rel_freq"), col("band"))
  }

  /** Average per-token log2 probability under the corpus unigram model —
    * the ranking-grade score on top of [[lmScore]]'s exact surface.
    * Double log, so use for ordering/filtering, not cross-engine hashes. */
  def lmLogProb(df: DataFrame): DataFrame = {
    val tok = df.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val vc = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = vc.agg(sum(col("cnt")).cast("double").as("n_corpus"))
    tok.join(vc, "tok")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg((sum(log(2.0, col("cnt").cast("double") / col("n_corpus"))) /
        count(lit(1)).cast("double")).as("avg_log2_prob"))
  }

  /** n-gram novelty: per document, how many of its DISTINCT word-bigram
    * shingles appear in no other document. High novelty ⇒ fresh content;
    * low novelty ⇒ template/boilerplate assembled from corpus-common
    * phrasing. The complement of dedup: instead of dropping repeated
    * shingle mass, it SCORES each doc by its unique shingle mass.
    *
    * Integer-exact surface: (n_shingles, n_novel) plus a band decided by
    * the integer comparison `2·n_novel >= n_shingles`. A shingle counts
    * as novel when its document frequency is exactly 1 — computable from
    * the per-doc distinct shingle explode with ONE shuffle (df count)
    * and one shingle-level join, both bucketable at 100 TB. Documents
    * with < 2 tokens have no shingles and drop out (same on both sides). */
  def noveltyScore(df: DataFrame): DataFrame = {
    val tk = col("tk")
    // DISTINCT bigrams straight from the native kernel (r20): identical
    // to array_distinct(transform(...)) — first-occurrence order — at
    // one codegen'd call per row instead of interpreted lambda frames.
    val bigrams = when(size(tk) >= 2,
      graft.functions.GraftFunctions.wordShingles(tk, 2, distinct = true))
      .otherwise(array().cast("array<string>"))
    val sh = df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), explode(bigrams).as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_band",
        when(col("n_novel") * 2 >= col("n_shingles"), "novel").otherwise("stock"))
  }

  /** Vocabulary coverage curve: for each candidate vocabulary size k,
    * what fraction of all token OCCURRENCES the top-k token types (by
    * count, token tie-break) cover — the measurement that sizes a
    * tokenizer vocabulary before committing to training. Output is one
    * row per k with exact integer (covered, total) mass.
    *
    * Scale shape: one token-count shuffle; the top-max(k) cut is the
    * same distributed `orderBy.limit` TakeOrderedAndProject as
    * [[vocabEncode]] (no unbounded single-partition sort); the ≤ max(k)
    * survivors then rank in a bounded window and theta-join against the
    * tiny k list. The full vocabulary never leaves the aggregation. */
  /** Skip-gram co-occurrence counts: for every token position i, the
    * FORWARD context pairs (tk[i], tk[j]) with i < j ≤ i+window, freq-
    * counted corpus-wide — the co-occurrence statistic word2vec-family
    * embedding training consumes (Mikolov et al. 2013). Pairs generate
    * straight off each document's token ARRAY (posexplode + a column-
    * indexed slice), so there is NO positional self-join anywhere — the
    * naive formulation joins a corpus-sized position table to itself on
    * a band predicate, which at 100 TB is the same quadratic trap as
    * the BETWEEN join. One explode per position (bounded fan-out:
    * `window` rows each) and one count shuffle whose cardinality is the
    * pair VOCABULARY (Zipf-bounded), not the corpus. */
  def skipgramPairs(df: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"context window must be >= 1: $window")
    df.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("tk"), posexplode(col("tk")))
      .select(col("col").as("w1"),
        explode(slice(col("tk"), col("pos") + 2, lit(window))).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
  }

  def vocabCoverage(df: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive: $ks")
    val tok = df.select(explode(toks(col("text"))).as("tok"))
    val vc = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = vc.agg(sum(col("cnt")).as("total"))
    val top = vc
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(ks.max)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok").asc)))
    val kdf = df.sparkSession.range(1)
      .select(explode(array(ks.sorted.map(k => lit(k)): _*)).as("k"))
    kdf.join(broadcast(top), col("rk") <= col("k"))
      .groupBy("k")
      .agg(sum(col("cnt")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("covered"), col("total"))
  }

  /** Shared-prefix boilerplate detection (the C4/Gopher-style cleaning
    * step for scraped corpora, where templated headers repeat across
    * thousands of pages): group documents by their first-`prefixLen`
    * tokens; a prefix shared by >= `minDocs` documents is boilerplate.
    * Emits one row per document: the flag and the token count after
    * stripping a detected prefix (non-boilerplate docs keep all
    * tokens; docs shorter than `prefixLen` can never match — their
    * prefix key is NULL and NULL groups are never boilerplate).
    *
    * Scale shape: the prefix key is a bounded `prefixLen`-token string
    * computed map-side; one count shuffle whose cardinality is the
    * DISTINCT-prefix domain (boilerplate-rich corpora compress hard),
    * and one broadcast-able join back on the prefix — at 100 TB the
    * flagged-prefix table is tiny (only prefixes with >= minDocs
    * copies), so the join never shuffles the corpus. */
  def boilerplate(df: DataFrame, prefixLen: Int, minDocs: Int): DataFrame = {
    require(prefixLen >= 1, s"prefixLen must be >= 1: $prefixLen")
    require(minDocs >= 2, s"boilerplate needs >= 2 sharers: $minDocs")
    val based = df.select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("bigint"))
      .withColumn("prefix",
        when(col("n_tokens") >= prefixLen,
          concat_ws(" ", slice(col("tk"), 1, prefixLen))))
    val hot = based.filter(col("prefix").isNotNull)
      .groupBy(col("prefix")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    based.join(broadcast(hot), Seq("prefix"), "left")
      .select(col("doc_id"), col("n_tokens"),
        col("n_docs").isNotNull.as("had_boilerplate"),
        when(col("n_docs").isNotNull, col("n_tokens") - prefixLen)
          .otherwise(col("n_tokens")).as("clean_tokens"))
  }

  /** Bounded inverted-index postings: per token, the document frequency
    * and the FIRST `k` doc_ids (ascending, comma-joined) — the search /
    * decontamination index build, with the posting list explicitly
    * capped so no token's row is ever corpus-sized.
    *
    * Scale shape: the per-token top-k runs as a `row_number <= k`
    * window filter, which Spark plans as WindowGroupLimit — each map
    * task keeps only k postings per token BEFORE the exchange, so a
    * stopword's shuffle contribution is O(k·tasks), never its true df.
    * The full df comes from a separate count aggregate (map-side
    * combined, carries one long per token) over the same deduplicated
    * (token, doc) frame, joined co-partitioned on token. */
  def postings(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"postings cap must be >= 1: $k")
    val pairs = df
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("token"))
    val dfreq = pairs.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("doc_id"))
    val firstK = pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("token"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(col("doc_id"))),
          d => d.cast("string"))).as("postings"))
    dfreq.join(firstK, Seq("token"))
  }
}
