package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the routine maintenance job of any streaming-
  * or incremental-ingest lake: micro-batches and per-executor writers
  * leave thousands of KB-sized files per partition, and at 100 TB the
  * resulting scan-task explosion (one task per file) dominates query
  * latency long before data volume does.
  *
  * `compactToSortedFiles` rewrites a relation into exactly `nFiles`
  * RANGE-partitioned, internally sorted files:
  *
  *  - `repartitionByRange(nFiles, sortCols)` gives each output file a
  *    disjoint key range — so every file's parquet min/max column stats
  *    form a tight zone map, and a later predicate on the sort key
  *    prunes whole files (the same layout contract as the Z-order
  *    write, SpatialQueries §zorder);
  *  - `sortWithinPartitions` sorts rows inside each file — row-group
  *    stats stay tight too, and downstream merge-style readers see
  *    sorted runs.
  *
  * Sizing at scale: pick `nFiles = ceil(inputBytes / targetFileBytes)`
  * from table statistics (128-512 MB targets are the common lake
  * contract) — a caller-supplied number, never a per-query count job.
  */
object Compaction {

  /** Rewrite `df` as `nFiles` range-disjoint, sorted parquet files. */
  def compactToSortedFiles(
      df: DataFrame,
      path: String,
      nFiles: Int,
      sortCols: Seq[Column]): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    df.repartitionByRange(nFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Distinct physical file count of a parquet directory as read back —
    * the audit metric a compaction job reports. */
  def fileCount(s: SparkSession, path: String): Long =
    s.read.parquet(path)
      .select(input_file_name().as("f")) // project first: Spark rejects
      .distinct().count()                // DISTINCT over nondeterministic
                                         // exprs inside an aggregate

}
