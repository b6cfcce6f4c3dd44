package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — each shuffle-partitioned with no
  * per-executor global state, so they scale horizontally.
  *
  * Hashing is md5-hex everywhere: engine-neutral (identical in the DuckDB
  * oracle), and a *lexicographic min over k seeded hash strings* is a valid
  * MinHash permutation family. No Murmur dependence, no UDFs.
  *
  * Scale notes (100 TB):
  *  - exact dedup: one hash-partition shuffle on the content hash; the
  *    map side pre-aggregates so only (hash → min_id, count) moves.
  *  - MinHash: explode(shingles) runs map-side; the signature agg is one
  *    shuffle on doc_id (combiner applies — k running mins); the LSH
  *    band self-join shuffles on the band key, whose cardinality grows
  *    with corpus size, keeping partitions balanced. A frequency cap on
  *    shingles (see `ngramJaccardPairs`) bounds worst-case skew.
  */
object Dedup {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Word n-gram shingles of a text column. Guarded for docs shorter
    * than n tokens: Spark's `sequence(1, 0)` is DESCENDING `[1, 0]` (not
    * empty like SQL generate_series) and `element_at(t, 0)` throws under
    * ANSI mode — so short docs short-circuit to an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val t = toks(text)
    if (n == 1) array_distinct(t)
    else when(size(t) >= n,
      array_distinct(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative (deterministic, unlike dropDuplicates). */
  def exact(df: DataFrame): DataFrame =
    df.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature: k seeded min-hashes over word-`n`-gram shingles.
    * Output: doc_id, mh_0..mh_{k-1} (md5-hex strings). */
  def minhashSignatures(df: DataFrame, n: Int, k: Int): DataFrame = {
    val sh = explode(shingles(col("text"), n)).as("shingle")
    val exploded = df.select(col("doc_id"), sh)
    val mins = (0 until k).map(s =>
      min(md5(concat(lit(s.toString), lit(":"), col("shingle")))).as(s"mh_$s"))
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH candidate pairs: signatures banded `rowsPerBand` mins
    * per band; docs sharing any band key become a candidate pair.
    * Returns distinct (doc_a < doc_b) pairs. */
  def minhashLshPairs(df: DataFrame, n: Int, k: Int, rowsPerBand: Int): DataFrame = {
    val sig = minhashSignatures(df, n, k)
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val key = concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
      sig.select(lit(b).as("band"), key.as("band_key"), col("doc_id"))
    }.reduce(_ unionAll _)
    val l = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** SimHash (16-bit): per document, bit i is the majority vote of bit i
    * of md5(token) across all token occurrences (hex nibble i, high bit).
    * Hamming-close simhashes ⇒ similar token distributions. Pure integer
    * votes — engine-exact. */
  def simhash(df: DataFrame): DataFrame = {
    val t = explode(toks(col("text"))).as("tok")
    val exploded = df.select(col("doc_id"), t)
      .withColumn("h", md5(col("tok")))
    val voteCols = count(lit(1)).as("n") +:
      (0 until 16).map(i =>
        sum(when(substring(col("h"), i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
          .otherwise(0L)).as(s"v_$i"))
    val votes = exploded.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val bits: Seq[Column] = (0 until 16).map(i =>
      when(col(s"v_$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
    votes.select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** n-gram Jaccard near-dup pairs: inverted-index self-join on shingles
    * with a document-frequency cap (drops shingles appearing in more than
    * `maxDf` docs — the classic skew guard: a stop-shingle would otherwise
    * produce a quadratic blowup in one reducer), then
    * |A∩B| / (|A|+|B|-|A∩B|) >= `threshold`. */
  def ngramJaccardPairs(df: DataFrame, n: Int, maxDf: Long, threshold: Double): DataFrame = {
    val sh = df.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("shingle"))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("shingle")
    val shRare = sh.join(rare, "shingle")
    // Jaccard over the CAPPED shingle universe (consistent numerator and
    // denominator): set sizes count only shingles that survived the cap.
    val sizes = shRare.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = shRare.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(shRare.select(col("shingle"), col("doc_id").as("doc_b")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
