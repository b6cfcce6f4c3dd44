package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Deterministic scale-up of a driver testdata directory: replicate each
  * fact table `factor`x with key-domain offsets, preserving referential
  * integrity, so the bench can be captured at 10x the largest provided
  * SF (the r6 verdict's top item: turn the plan-shape scaling arguments
  * into measured time(sf1)/time(sf0.1) ratios).
  *
  * Shape, not synthesis: copy c of a row offsets every key in domain D
  * by c * stride(D), where stride(D) = max(D) + 1 from the DEFINING
  * table — so orders.o_custkey and customer.c_custkey shift together
  * and every FK still resolves. Non-key attributes are byte-identical
  * across copies. Consequences, documented where they matter:
  *
  *  - per-key history (a user's events, an order's lineitems) is
  *    IDENTICAL to copy 0 — per-key working sets stay constant while
  *    key counts scale, exactly the axis a partitioned engine should
  *    scale along;
  *  - dimension tables (region, nation) are NOT replicated (closed
  *    domains — nationkey references stay within 0..24), matching how
  *    real corpora grow: facts grow, enums don't;
  *  - documents/embeddings replicate byte-identical → every cross-copy
  *    pair is an EXACT near-dup (10x denser duplicate structure at
  *    factor 10). Dedup/ANN queries therefore face a HARDER instance
  *    than organic growth, which biases the scaling ratios against us —
  *    acceptable for a scaling audit, noted in SURVEY;
  *  - low-id conventions (vec_id < nQueries as the query set,
  *    vec_id < nlist as centroid seeds) keep copy 0's ids only: query
  *    and centroid counts stay FIXED while the corpus scales — the
  *    correct scaling protocol for ANN (work grows with corpus, not
  *    quadratically).
  *
  * The events `ts` column is a non-key attribute and round-trips in
  * whatever physical type the source directory carries (BIGINT
  * epoch-nanos for gen-1 TIMESTAMP(NANOS) testdata read via
  * nanosAsLong, TIMESTAMP_NTZ for gen-2 timestamp[us] testdata) —
  * Tables.events normalizes either to ts_ns at load, and the scaled
  * dir is a bench input, never a DuckDB-oracle input (the t2 gate
  * stays on the driver's own sf0.01).
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <dstDir> <factor> [tables]
  * `tables` (comma-separated, default all) restricts which FACT tables
  * are replicated — the sf100-equivalent capture needs only the three
  * star-query inputs (lineitem, documents, events) and the full set
  * would not fit the sandbox disk at factor 1000. Dimensions
  * (region/nation) are always copied; strides still derive from the
  * SOURCE defining tables, so a later run with more tables produces
  * key-compatible output. */
object GenScale {

  /** (table, key column → stride domain); a domain's stride comes from
    * its defining table so shared domains shift in lockstep. */
  private val keyDomains: Seq[(String, Map[String, String])] = Seq(
    "customer" -> Map("c_custkey" -> "custkey"),
    "supplier" -> Map("s_suppkey" -> "suppkey"),
    "part" -> Map("p_partkey" -> "partkey"),
    "orders" -> Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "events" -> Map("event_id" -> "event", "user_id" -> "user"),
    "documents" -> Map("doc_id" -> "doc"),
    "embeddings" -> Map("vec_id" -> "vec"))

  /** domain → (defining table, defining column) */
  private val domainDef: Map[String, (String, String)] = Map(
    "custkey" -> ("customer", "c_custkey"),
    "suppkey" -> ("supplier", "s_suppkey"),
    "partkey" -> ("part", "p_partkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "event" -> ("events", "event_id"),
    "user" -> ("events", "user_id"),
    "doc" -> ("documents", "doc_id"),
    "vec" -> ("embeddings", "vec_id"))

  def replicate(df: DataFrame, factor: Int,
                keyStrides: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    val copies = spark.range(factor.toLong).select(col("id").as("__copy"))
    val cols = df.columns.toSeq.map { c =>
      keyStrides.get(c) match {
        case Some(stride) => (col(c) + col("__copy") * stride).as(c)
        case None         => col(c)
      }
    }
    df.crossJoin(broadcast(copies)).select(cols: _*)
  }

  def main(args: Array[String]): Unit = {
    val (src, dst, factor, tableFilter) = args match {
      case Array(s, d, f)     => (s, d, f.toInt, None)
      case Array(s, d, f, ts) => (s, d, f.toInt, Some(ts.split(",").toSet))
      case _ =>
        System.err.println(
          "usage: graft.tools.GenScale <srcDir> <dstDir> <factor> [tables]")
        sys.exit(2)
    }
    require(factor >= 1, s"factor must be >= 1: $factor")
    val spark = GraftSession.build("graft-genscale")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // Stride = max(defining column) + 1, read type-tolerantly: getLong
    // would NPE on an empty defining table and ClassCastException on an
    // int-typed key — both deserve a clear failure, not a stack trace.
    val strides: Map[String, Long] = domainDef.map { case (dom, (t, c)) =>
      val raw = read(t).agg(max(col(c))).head().getAs[Number](0)
      require(raw != null, s"defining table $t is empty — cannot derive stride for domain $dom")
      dom -> (raw.longValue() + 1L)
    }
    // Every replicated key is key + copy*stride with copy < factor; keys
    // are non-negative and < stride, so the largest value is factor*stride
    // - 1 — guard the Long product per domain before writing anything.
    strides.foreach { case (dom, s) =>
      require(s > 0 && factor.toLong <= Long.MaxValue / s,
        s"factor $factor x stride $s overflows Long for domain $dom")
    }
    for (t <- Seq("region", "nation"))
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    // File-count realism: crossJoin(broadcast) preserves the SOURCE
    // partitioning, so a factor-100 replica of a one-file table lands as
    // ONE file — and a one-file parquet table under maxPartitionBytes is
    // ONE scan partition, which serializes every downstream map (the
    // documents corpus is byte-tiny but its decode/fingerprint queries
    // are CPU-dense: measured 101 s single-threaded vs ~4 s wide for
    // q_audio_fingerprint at factor 100). A real corpus grown 100x is
    // many files; write max(defaultParallelism, factor) of them so scan
    // parallelism scales WITH the data instead of with its byte size.
    //
    // The repartition happens on the SOURCE, before the crossJoin —
    // repartitioning the replicated OUTPUT shuffles factor x the source
    // bytes (measured at factor 1000: the 600 M-row lineitem repartition
    // wrote 45+ GB of shuffle scratch and nearly exhausted the sandbox
    // disk before it was killed; the source-side form shuffles ~50 MB
    // and streams each output file straight out of the broadcast join).
    // Same file count, same rows; only the row-to-file assignment
    // changes (all copies of a source row share a file instead of
    // landing hash-randomly), which nothing downstream depends on.
    val outParts = math.max(spark.sparkContext.defaultParallelism, factor)
    for ((t, keys) <- keyDomains if tableFilter.forall(_.contains(t))) {
      val ks = keys.map { case (c, dom) => c -> strides(dom) }
      replicate(read(t).repartition(outParts), factor, ks)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t x$factor -> $dst/$t.parquet ($outParts files)")
    }
    spark.stop()
  }
}
