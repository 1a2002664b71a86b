package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1-D interval OVERLAP join — the temporal sibling of the grid spatial
  * join (SpatialQueries): two relations of [start, end] intervals, find
  * every cross-relation pair that overlaps (`a.start <= b.end AND
  * b.start <= a.end`). The naive form is an inequality θ-join — a
  * cartesian plan at any scale.
  *
  * Rewrite: quantize time into fixed buckets and explode each interval to
  * the buckets it touches; overlapping intervals MUST share at least one
  * bucket, so candidates come from a bucket-keyed equi-join, then the
  * exact predicate keeps true overlaps and `dropDuplicates` collapses
  * multi-bucket double-hits. Expansion factor per row is
  * `len/bucket + 1`, so pick the bucket near the TYPICAL interval length
  * (the same cell≈radius rule as the spatial grid); shuffle is keyed by
  * bucket id — uniform when interval starts are, and saltable via
  * [[SkewJoin]] when a bucket is hot. No cartesian anywhere (asserted in
  * PlanAuditSpec).
  */
object IntervalJoin {

  /** Overlapping (a, b) pairs. Interval bounds are epoch-day (or any
    * consistent integer) columns; `bucketDays` is the quantization width.
    * Inputs must carry disjoint column names apart from the bound
    * columns, which are renamed per side. */
  def overlaps(a: DataFrame, aStart: Column, aEnd: Column,
      b: DataFrame, bStart: Column, bEnd: Column,
      bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    def bucketed(df: DataFrame, s: Column, e: Column, p: String) =
      df.withColumn(s"${p}_start", s).withColumn(s"${p}_end", e)
        .filter(col(s"${p}_start") <= col(s"${p}_end"))
        .withColumn("__bucket", explode(sequence(
          floor(col(s"${p}_start") / bucketDays),
          floor(col(s"${p}_end") / bucketDays))))
    val ab = bucketed(a, aStart, aEnd, "a")
    val bb = bucketed(b, bStart, bEnd, "b")
    ab.join(bb, Seq("__bucket"))
      .filter(col("a_start") <= col("b_end") &&
        col("b_start") <= col("a_end"))
      .drop("__bucket")
      .dropDuplicates()
  }
}
