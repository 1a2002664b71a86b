package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed weighted quantiles — the [[GlobalRank]] treatment applied
  * to cumulative WEIGHT instead of row position.
  *
  * The naive per-key weighted median is a cumulative-sum window
  * partitioned by the key alone: every distinct value of a key funnels
  * through ONE task (3 return-flags ⇒ parallelism 3, whatever the
  * cluster size) — fine at test SF, dead at 100 TB. The scalable shape
  * splits the cumulative in two:
  *
  *   1. range-partition the (key, value) domain over the full shuffle
  *      width — within a key, higher partition id ⇔ larger values;
  *   2. per-(partition, key) weight subtotals (one tiny aggregate) give
  *      each partition its cumulative OFFSET via a bounded triangular
  *      self-join (the GlobalRank trick — no no-partition window, lints
  *      clean under [[PlanLint]]), and the per-key totals fall out of
  *      the same subtotal relation;
  *   3. the within-partition cumulative window runs partitioned by
  *      (partition id, key) — full cluster parallelism — and the global
  *      cumulative weight is offset + local.
  *
  * The quantile value is then `min(v) where q·cum ≥ p·total` (integer/
  * decimal cross-multiplication — no division in the decision, exact
  * under DECIMAL weights). Cumulative weights depend only on the value
  * ORDER, not on where the sampled range boundaries fall, so the result
  * is deterministic even though the partitioner samples.
  */
object WeightedQuantile {

  /** The shared cumulative-weight relation: (k, v, w, _wq_cum, tw) with
    * global-per-key cumulative weight, computed ONCE — every requested
    * fraction reads off the same pass. */
  private def cumulative(df: DataFrame, key: Column, value: Column,
      weight: Column, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // r14 opt (guide §2.4): repartitionByRange SAMPLES its input to
    // pick boundaries — an extra job that re-ran the whole groupBy
    // aggregate from the scan before the real range shuffle ran it
    // again. The lazy cut materializes the per-(key, value) weight
    // relation once; the sampling pass and the range exchange both
    // read the stored blocks.
    val rows = Checkpoints.cut(
      df.select(key.as("k"), value.as("v"), weight.as("w"))
        .groupBy(col("k"), col("v")).agg(sum(col("w")).as("w")),
      eager = false)
    val ranged = rows
      .repartitionByRange(n, col("k"), col("v"))
      .withColumn("_wq_pid", spark_partition_id())
    // reused by the subtotal aggregate AND the join-back — cut so the
    // upstream isn't recomputed per consumer (GlobalRank's lesson)
    val local = Checkpoints.cut(ranged, eager = false)
    val parts = local.groupBy(col("_wq_pid"), col("k"))
      .agg(sum(col("w")).as("pw"))
    val offs = parts.as("a")
      .join(parts.as("b"),
        col("a.k") === col("b.k") && col("b._wq_pid") < col("a._wq_pid"),
        "left")
      .groupBy(col("a._wq_pid").as("_wq_pid"), col("a.k").as("k"))
      .agg(coalesce(sum(col("b.pw")), lit(0)).as("off"))
    val tots = parts.groupBy(col("k")).agg(sum(col("pw")).as("tw"))
    val wIn = Window.partitionBy(col("_wq_pid"), col("k")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local
      .join(broadcast(offs), Seq("_wq_pid", "k"))
      .join(broadcast(tots), Seq("k"))
      .withColumn("_wq_cum", col("off") + sum(col("w")).over(wIn))
  }

  /** Per-key p/q-quantile of `value` under `weight` (median: p=1, q=2):
    * smallest value whose cumulative weight w(≤v) satisfies
    * q·w(≤v) ≥ p·total. Output: (key, quantile) with the value's type.
    */
  def weightedQuantile(df: DataFrame, key: Column, value: Column,
      weight: Column, p: Int = 1, q: Int = 2,
      numPartitions: Int = 0): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"need 0 < p/q <= 1, got $p/$q")
    // deliberately NO outer cut here, unlike weightedQuantiles: with a
    // single consumer the extra materialization barrier is pure
    // overhead (r10 audit, PERF.md #25 — adding it cost +0.9 s warm at
    // sf0.1; the quartiles keep theirs because THREE fraction readouts
    // share the materialization)
    cumulative(df, key, value, weight, numPartitions)
      .filter(col("_wq_cum") * q >= col("tw") * p)
      .groupBy(col("k"))
      .agg(min(col("v")).as("quantile"))
  }

  /** Several fractions off ONE cumulative pass — the quartile-spread /
    * percentile-band readout without re-scanning per fraction. Output:
    * (k, p, q, quantile), one row per key × fraction. The cumulative
    * relation is lineage-cut, so the per-fraction aggregates share its
    * materialization rather than re-running the range shuffle. */
  def weightedQuantiles(df: DataFrame, key: Column, value: Column,
      weight: Column, fracs: Seq[(Int, Int)],
      numPartitions: Int = 0): DataFrame = {
    require(fracs.nonEmpty, "need at least one fraction")
    fracs.foreach { case (p, q) =>
      require(p > 0 && q > 0 && p <= q, s"need 0 < p/q <= 1, got $p/$q")
    }
    val cum = Checkpoints.cut(
      cumulative(df, key, value, weight, numPartitions), eager = false)
    fracs.map { case (p, q) =>
      cum.filter(col("_wq_cum") * q >= col("tw") * p)
        .groupBy(col("k"))
        .agg(min(col("v")).as("quantile"))
        .select(col("k"), lit(p).as("p"), lit(q).as("q"), col("quantile"))
    }.reduce(_ unionByName _)
  }

  /** Smallest value whose cumulative weight reaches half the total. */
  def weightedMedian(df: DataFrame, key: Column, value: Column,
      weight: Column, numPartitions: Int = 0): DataFrame =
    weightedQuantile(df, key, value, weight, p = 1, q = 2, numPartitions)
}
