package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

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
