package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Seeded ALTERNATE corpus at fixture scale (r15 verdict item 3): every
  * hash point at sf10+ derives from [[GenScale]] replicas of the ONE
  * sf0.1 corpus the driver generated, so a constant accidentally tuned
  * to that fixture's content (a bucket cap that never trips, a band
  * count that never collides, a threshold no row sits on) would pass
  * every existing gate. This tool derives a content-DIFFERENT corpus
  * from a caller-chosen seed — same schemas, same key structure, same
  * value domains — so one t2-style oracle batch over it proves the
  * queries compute functions of the data, not of the fixture.
  *
  * What changes, per column class (all driven by `xxhash64(keys, seed,
  * salt)` — deterministic for a given seed, different across seeds):
  *
  *  - categorical / freeform STRINGS (flags, names, segments, types):
  *    seeded within-column PERMUTATION — the multiset of values is
  *    preserved exactly (every value stays domain-valid) but which row
  *    carries which value changes, so join selectivities, group sizes,
  *    and filter matches all move;
  *  - NUMERIC measures: ±5 % multiplicative jitter (integers get an
  *    additive die roll clamped to stay positive) — global sums, avg
  *    bands, and threshold crossings all move;
  *  - TIMESTAMPS: per-row shift uniform in ±15 days — date-filter
  *    selectivity, session gaps, window contents, and as-of pairings
  *    all move;
  *  - document TEXT: per-token seeded edits (delete ~1/17 tokens,
  *    double ~1/19) plus an appended seed-derived token, and ~2 % of
  *    docs swap their body for a near-copy of their century-head doc —
  *    shingle sets, minhash signatures, simhash planes, and the
  *    near-dup cluster structure are all reshaped (`n_chars` is
  *    recomputed so the derived column stays consistent);
  *  - EMBEDDINGS: per-component multiplicative jitter (±10 %) —
  *    distances, top-k neighborhoods, and centroid assignments move
  *    while `vec_id` conventions (query set = low ids, centroid seeds)
  *    stay intact;
  *  - KEYS and dimension tables (region/nation) are untouched, so
  *    referential integrity and closed enum domains are preserved.
  *
  * Scale stance: this is a FIXTURE generator, run once per seed at
  * sf0.1-scale inputs (≤ ~600 k rows/table); the per-column permutation
  * uses an unpartitioned row_number window (single-task sort) and is
  * deliberately simple rather than distributed. It is never part of a
  * production pipeline.
  *
  * Usage: runMain graft.tools.GenAlt <srcDir> <dstDir> <seed>
  */
object GenAlt {

  /** Uniform-ish value in [0,1) from the hash of (keys, seed, salt). */
  private def unit(seed: Long, salt: String, keys: Column*): Column =
    pmod(xxhash64((keys :+ lit(seed) :+ lit(salt)): _*), lit(100000L))
      .cast("double") / 100000.0

  /** ±5 % multiplicative jitter, type-preserved. Money-like columns are
    * rounded back to 2 fractional digits — the fixture's value domain,
    * and a documented engine contract (valueStats' exact fixed-bin
    * histogram refuses >2-decimal inputs); an alternate seed must move
    * values WITHIN the domain, not leave it. */
  private def jitterNum(seed: Long, c: String, keys: Seq[Column], dt: String): Column =
    (round(col(c) * (lit(0.95) + unit(seed, s"jit:$c", keys: _*) * 0.1), 2)
      .cast(dt)).as(c)

  /** Additive die roll in [-2, +2] for small integers, clamped >= 1. */
  private def jitterInt(seed: Long, c: String, keys: Seq[Column], dt: String): Column =
    greatest(lit(1),
      col(c) + (pmod(xxhash64((keys :+ lit(seed) :+ lit(s"int:$c")): _*), lit(5L)) - 2L))
      .cast(dt).as(c)

  /** Seeded within-column permutation of `cols`, one independent
    * permutation per column: row i takes column c's value from the row
    * ranked i under a hash-of-key ordering. Multisets (and therefore
    * domains) are preserved exactly; row pairings change. */
  private def permuteCols(df: DataFrame, seed: Long, keyCols: Seq[String],
                          cols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val baseOrd = Window.orderBy(keys: _*)
    var out = df.withColumn("__rn", row_number().over(baseOrd))
    for (c <- cols) {
      val permOrd = Window.orderBy(
        xxhash64((keys :+ lit(seed) :+ lit(s"perm:$c")): _*) +: keys: _*)
      val donor = df.select((keys :+ col(c).as(s"__v_$c")): _*)
        .withColumn("__rn", row_number().over(permOrd))
        .select(col("__rn"), col(s"__v_$c"))
      out = out.drop(c).join(donor, "__rn").withColumnRenamed(s"__v_$c", c)
    }
    out.drop("__rn").select(df.columns.map(col): _*)
  }

  private def withTsShift(df: DataFrame, seed: Long, c: String,
                          keys: Seq[Column]): DataFrame = {
    val delta = pmod(xxhash64((keys :+ lit(seed) :+ lit(s"ts:$c")): _*),
      lit(2592000L)) - 1296000L
    df.withColumn("__d", delta)
      .withColumn(c, expr(s"timestampadd(SECOND, __d, $c)"))
      .drop("__d")
  }

  def main(args: Array[String]): Unit = {
    val (src, dst, seed) = args match {
      case Array(s, d, sd) => (s, d, sd.toLong)
      case _ =>
        System.err.println("usage: graft.tools.GenAlt <srcDir> <dstDir> <seed>")
        sys.exit(2)
    }
    val spark = GraftSession.build("graft-genalt")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genalt] $t seed=$seed -> $dst/$t.parquet")
    }

    // Closed enum dimensions: copied verbatim.
    for (t <- Seq("region", "nation")) write(read(t), t)

    // --- relational star: permute strings, jitter numerics, shift ts
    locally {
      val k = Seq(col("c_custkey"))
      val df = permuteCols(read("customer"), seed, Seq("c_custkey"),
        Seq("c_name", "c_nationkey", "c_mktsegment"))
        .withColumn("c_acctbal", jitterNum(seed, "c_acctbal", k, "double"))
      write(df.select(read("customer").columns.map(col): _*), "customer")
    }
    locally {
      val k = Seq(col("s_suppkey"))
      val df = permuteCols(read("supplier"), seed, Seq("s_suppkey"),
        Seq("s_name", "s_nationkey"))
        .withColumn("s_acctbal", jitterNum(seed, "s_acctbal", k, "double"))
      write(df.select(read("supplier").columns.map(col): _*), "supplier")
    }
    locally {
      val k = Seq(col("p_partkey"))
      val df = permuteCols(read("part"), seed, Seq("p_partkey"),
        Seq("p_name", "p_brand", "p_type"))
        .withColumn("p_size", jitterInt(seed, "p_size", k, "int"))
        .withColumn("p_retailprice", jitterNum(seed, "p_retailprice", k, "double"))
      write(df.select(read("part").columns.map(col): _*), "part")
    }
    locally {
      val k = Seq(col("o_orderkey"))
      val df0 = permuteCols(read("orders"), seed, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"))
        .withColumn("o_totalprice", jitterNum(seed, "o_totalprice", k, "double"))
      val df = withTsShift(df0, seed, "o_orderdate", k)
      write(df.select(read("orders").columns.map(col): _*), "orders")
    }
    locally {
      val k = Seq(col("l_orderkey"), col("l_linenumber"))
      val df0 = permuteCols(read("lineitem"), seed,
        Seq("l_orderkey", "l_linenumber"), Seq("l_returnflag", "l_linestatus"))
        .withColumn("l_quantity", jitterInt(seed, "l_quantity", k, "double"))
        .withColumn("l_extendedprice", jitterNum(seed, "l_extendedprice", k, "double"))
        .withColumn("l_discount", jitterNum(seed, "l_discount", k, "double"))
        .withColumn("l_tax", jitterNum(seed, "l_tax", k, "double"))
      val df = withTsShift(df0, seed, "l_shipdate", k)
      write(df.select(read("lineitem").columns.map(col): _*), "lineitem")
    }
    locally {
      val k = Seq(col("event_id"))
      val df0 = permuteCols(read("events"), seed, Seq("event_id"),
        Seq("event_type", "props"))
        .withColumn("value", jitterNum(seed, "value", k, "double"))
      val df = withTsShift(df0, seed, "ts", k)
      write(df.select(read("events").columns.map(col): _*), "events")
    }

    // --- documents: token edits + century-head near-dup injection
    locally {
      val base = permuteCols(read("documents"), seed, Seq("doc_id"),
        Seq("lang", "source"))
      val did = col("doc_id")
      val toks = split(col("text"), " ")
      val kept = filter(toks, (t, i) =>
        pmod(xxhash64(did, i, lit(seed), lit("del")), lit(17L)) =!= 0L)
      val doubled = flatten(transform(kept, (t, i) =>
        when(pmod(xxhash64(did, i, lit(seed), lit("dup")), lit(19L)) === 1L,
          array(t, t)).otherwise(array(t))))
      val appended = concat(doubled, array(
        concat(lit("tok"),
          pmod(xxhash64(did, lit(seed), lit("app")), lit(1000L)))))
      val mutated = base.withColumn("text", array_join(appended, " "))
      // ~2 % of docs become near-copies of their century-head doc: new
      // near-dup clusters whose geometry the fixture never had.
      val heads = mutated
        .filter(pmod(did, lit(100L)) === 0L)
        .select(did.as("__head_id"), col("text").as("__head_text"))
      val isNd = pmod(xxhash64(did, lit(seed), lit("nd")), lit(50L)) === 0L
      // Half the injected docs copy the head byte-EXACTLY (the exact
      // dedup family needs non-empty duplicate groups to exercise), the
      // other half append a seeded suffix (near- but not exact dups).
      val isExact = pmod(xxhash64(did, lit(seed), lit("ndx")), lit(2L)) === 0L
      val out = mutated
        .withColumn("__head_id", (did - pmod(did, lit(100L))))
        .join(heads, Seq("__head_id"), "left")
        .withColumn("text",
          when(isNd && col("__head_text").isNotNull,
            when(isExact, col("__head_text"))
              .otherwise(concat(col("__head_text"), lit(" nd"),
                pmod(xxhash64(did, lit(seed), lit("ndsuf")), lit(100L)))))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__head_id", "__head_text")
      write(out.select(read("documents").columns.map(col): _*), "documents")
    }

    // --- embeddings: per-component jitter, permuted labels
    locally {
      val base = permuteCols(read("embeddings"), seed, Seq("vec_id"), Seq("label"))
      val vid = col("vec_id")
      val jittered = transform(col("embedding"), (x, i) =>
        (x * (lit(0.9) +
          pmod(xxhash64(vid, i, lit(seed), lit("emb")), lit(100000L))
            .cast("double") / 100000.0 * 0.2)).cast("float"))
      val out = base.withColumn("embedding", jittered)
      write(out.select(read("embeddings").columns.map(col): _*), "embeddings")
    }

    spark.stop()
  }
}
