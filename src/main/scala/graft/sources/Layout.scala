package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

/** Physical data layout for scan-time pruning — the other half of the
  * 100 TB story next to bucketing (`BucketingSpec`): bucketing kills the
  * JOIN shuffle, range layout kills the SCAN.
  *
  * Parquet writes a min/max stat per row group; a reader with a pushed
  * predicate skips any row group whose stats exclude it. That only pays
  * off if the data is CLUSTERED on the filter column: a randomly-laid-out
  * table has every row group spanning the whole value domain, so nothing
  * skips and a 1% time-slice query still reads 100 TB. Range-repartition
  * + in-partition sort makes row-group stats tight and disjoint, so the
  * same query reads ~1% + footers.
  */
object Layout {

  /** Write `df` clustered on `sortCol`: `buckets` range partitions
    * (parallel, skew-balanced by sampling) each sorted internally, so
    * every output file covers a tight disjoint value range. */
  def writeRangeLayout[T](df: Dataset[T], path: String, sortCol: String,
                          buckets: Int): Unit =
    df.repartitionByRange(buckets, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** Read back a layout written by [[writeRangeLayout]]. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Morton z-value of two BUCKETED dimensions (each already mapped to
    * [0, 2^bits)): interleaves their bits so that sorting by the z-value
    * clusters rows that are close in BOTH dimensions. A 1-D range layout
    * prunes scans filtered on its one sort column and nothing else; a
    * z-order layout gives every interleaved dimension ~sqrt pruning —
    * the standard trade for tables queried along two axes (tenant+time,
    * user+time).
    *
    * Pure bit arithmetic on two longs — stays inside whole-stage codegen;
    * the fold builds 2·bits shift/or nodes, a write-time-only cost. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits per dimension must be in [1,31]: $bits")
    (0 until bits).foldLeft(lit(0L).cast("long")) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` z-order-clustered on two bucketed dimension columns:
    * range-partition + sort on the Morton value, so each file covers a
    * compact rectangle of the 2-D space and parquet min/max stats on BOTH
    * original columns stay tight enough to skip. */
  def writeZOrderLayout[T](df: Dataset[T], path: String, bucketA: Column,
                           bucketB: Column, bits: Int, buckets: Int): Unit =
    df.withColumn("z", zValue(bucketA, bucketB, bits))
      .repartitionByRange(buckets, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` with a parquet BLOOM FILTER on `bloomCol` — the pruning
    * tool for POINT LOOKUPS on a high-cardinality column the layout is
    * NOT clustered on. Range/z-order layouts make min/max stats tight on
    * the sort dimensions; every other column's stats span the whole
    * domain in every row group, so an id-probe scan reads the full
    * table. A bloom filter answers "might this row group contain v?"
    * per group, so the probe reads ~1 group + footers instead.
    *
    * Dictionary encoding is disabled on the bloom column: at 100 TB a
    * unique-id column overflows the dictionary page limit and falls
    * back to plain encoding anyway (at which point dictionary-page
    * pruning — the other point-lookup pruner — silently stops working;
    * the bloom filter is the one that survives scale). Mirroring that
    * here keeps the test honest about WHICH mechanism prunes. */
  def writeWithBloom[T](df: Dataset[T], path: String, bloomCol: String,
                        expectedNdv: Long, files: Int): Unit = {
    // expectedNdv sizes the bitset PER ROW GROUP — pass the per-file
    // distinct estimate, not the table's (an over-sized bloom wastes
    // read bytes on every probe; the bitset is ~1.2 bytes per NDV at
    // the default 1% false-positive rate)
    require(expectedNdv > 0 && files > 0)
    df.repartition(files)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
        expectedNdv.toString)
      .option(s"parquet.enable.dictionary#$bloomCol", "false")
      .parquet(path)
  }

  /** Small-file compaction, preserving range clustering — the table
    * maintenance job every long-running ingest needs: streaming/
    * incremental writers emit one file per micro-batch per partition, and
    * a year of that turns a 100 TB table into tens of millions of files
    * whose open/footer overhead dominates scans (and whose row groups are
    * too small for stats pruning to matter).
    *
    * Sizes output by ROWS (one count action — cheap, metadata-only for
    * parquet inputs), then rewrites through [[writeRangeLayout]] so the
    * compacted files stay clustered on `sortCol`: compaction and
    * clustering in one pass instead of two rewrites. Returns the file
    * count written. */
  def compactRanged[T](df: Dataset[T], path: String, sortCol: String,
                       targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile > 0)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(Int.MaxValue).toInt
    writeRangeLayout(df, path, sortCol, files)
    files
  }
}
